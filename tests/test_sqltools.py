from data_pipelines_snowflake_procedures_spark.functions.sqltools import (
    escape_sql_literal,
    extract_table_names,
    is_ddl,
    split_statements,
    strip_comments,
)


def test_split_basic():
    assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_semicolon_in_string():
    stmts = split_statements("SELECT 'a;b'; SELECT 2")
    assert stmts == ["SELECT 'a;b'", "SELECT 2"]


def test_split_escaped_single_quote():
    stmts = split_statements("SELECT 'it''s; fine'; SELECT 2")
    assert stmts == ["SELECT 'it''s; fine'", "SELECT 2"]


def test_split_double_quoted_identifier_preserved():
    # The reference's scanner consumed every '"' char and mangled
    # double-quoted identifiers (SURVEY.md §3.1) — fixed here.
    stmts = split_statements('SELECT "a;b" FROM t; SELECT 2')
    assert stmts == ['SELECT "a;b" FROM t', "SELECT 2"]


def test_strip_line_comments_only_outside_strings():
    sql = "SELECT 'a--b' AS x -- trailing\nFROM t"
    out = strip_comments(sql)
    assert "'a--b'" in out and "trailing" not in out


def test_strip_block_comments():
    assert strip_comments("SELECT /* c1 */ 1") == "SELECT  1"


def test_blank_and_comment_lines_removed():
    sql = "\n-- full line comment\nSELECT 1\n\n"
    assert strip_comments(sql) == "SELECT 1"


def test_extract_table_names_dedup_and_cap():
    sql = "SELECT * FROM a JOIN b ON 1=1 JOIN a ON 1=1"
    assert extract_table_names(sql) == ["a", "b"]
    many = " ".join(f"JOIN t{i}" for i in range(10))
    assert len(extract_table_names(many, limit=5)) == 5


def test_is_ddl():
    assert is_ddl("CREATE TABLE t (a INT)")
    assert is_ddl("  drop view v")
    assert not is_ddl("SELECT 1")


def test_escape_sql_literal():
    assert escape_sql_literal("it's") == "it''s"


def test_sentence_udtf_lateral_join(spark):
    """PySpark 4 Python UDTF: one row -> many rows via SQL lateral."""
    from data_pipelines_snowflake_procedures_spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "First one. Second here! Third?"), (2, ""), (3, "No end mark")],
        "doc_id BIGINT, text STRING",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence, s.n_words "
        "FROM udtf_docs d, LATERAL sentence_split(d.text) s "
        "ORDER BY d.doc_id, s.pos"
    ).collect()
    got = [(r["doc_id"], r["pos"], r["sentence"], r["n_words"]) for r in rows]
    assert got == [
        (1, 0, "First one.", 2),
        (1, 1, "Second here!", 2),
        (1, 2, "Third?", 1),
        (3, 0, "No end mark", 3),
    ]


def test_sentence_udtf_direct_call(spark):
    from data_pipelines_snowflake_procedures_spark.functions.udtfs import (
        SentenceSplit,
    )
    from pyspark.sql.functions import lit

    out = SentenceSplit(lit("A b. C d e.")).collect()
    assert [(r["pos"], r["n_words"]) for r in out] == [(0, 2), (1, 3)]
