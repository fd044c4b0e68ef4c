from data_pipelines_snowflake_procedures_spark.plans.engine import execute_sql_batch
from data_pipelines_snowflake_procedures_spark.session import register_views

from .conftest import SF_SMOKE_DIR


def test_empty_batch(spark):
    rep = execute_sql_batch(spark, "   ")
    assert rep["status"] == "FAILED"
    assert "error" in rep


def test_batch_success_and_previews(spark):
    register_views(spark, SF_SMOKE_DIR)
    rep = execute_sql_batch(
        spark,
        """
        -- pricing summary over the smoke fixture
        SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag;
        SELECT count(*) AS n_orders FROM orders;
        """,
    )
    assert rep["status"] == "SUCCESS"
    assert rep["total_statements"] == 2
    assert rep["successful_statements"] == 2
    assert rep["details"][0]["rows"]
    assert "lineitem" in rep["table_previews"]
    assert len(rep["table_previews"]["lineitem"]) == 5
    assert rep["audit_log"]["agent_name"] == "ExecutionEngineAgent"


def test_batch_continues_after_failure(spark):
    register_views(spark, SF_SMOKE_DIR)
    rep = execute_sql_batch(
        spark,
        "SELECT * FROM no_such_table; SELECT count(*) AS n FROM region;",
    )
    assert rep["status"] == "PARTIAL"
    assert rep["failed_statements"] == 1
    assert rep["successful_statements"] == 1
    assert rep["details"][0]["status"] == "FAILED"
    assert rep["details"][1]["rows"][0]["n"] == 5


def test_row_cap(spark):
    register_views(spark, SF_SMOKE_DIR)
    rep = execute_sql_batch(spark, "SELECT * FROM lineitem", row_cap=7)
    d = rep["details"][0]
    assert d["row_count"] == 7
    assert d["rows_truncated"] is True


def test_ddl_insert_select_chain(spark, tmp_path):
    """X1 over a DDL + DML + query chain (the EXECUTION_ENGINE's
    ingestion/transformation use case)."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS engine_chain_t")
    shutil.rmtree("spark-warehouse/engine_chain_t", ignore_errors=True)
    rep = execute_sql_batch(
        spark,
        """
        CREATE TABLE engine_chain_t (k INT, v STRING) USING parquet;
        INSERT INTO engine_chain_t VALUES (1, 'a'), (2, 'b');
        SELECT count(*) AS n FROM engine_chain_t;
        """,
    )
    assert rep["status"] == "SUCCESS", rep
    assert rep["total_statements"] == 3
    assert rep["details"][2]["rows"][0]["n"] == 2
    # DDL/DML statements carry no rows payload
    assert "rows" not in rep["details"][0]
