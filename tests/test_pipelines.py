"""Tests for codegen / interpreter / glossary / ingestion pipelines
(SURVEY.md §2.8, §2.9, §2.12)."""

from __future__ import annotations

import json

import pytest

from data_pipelines_snowflake_procedures_spark.pipelines.codegen import (
    classify_task,
    generate_code,
)
from data_pipelines_snowflake_procedures_spark.pipelines.glossary import (
    generate_business_glossary,
)
from data_pipelines_snowflake_procedures_spark.pipelines.ingestion import (
    ingestion_code_generator,
)
from data_pipelines_snowflake_procedures_spark.pipelines.interpreter import (
    filter_relevant_tables,
    interpret_objective,
)


@pytest.mark.parametrize(
    "objective,expected",
    [
        ("Build an SCD1 pipeline for customers", "scd1_pipeline"),
        ("incremental load of orders", "scd1_pipeline"),
        ("join orders with customers", "join_query"),
        ("monthly revenue summary", "aggregation"),
        ("aggregate sales by region", "aggregation"),
        ("load filename: data.csv from stage: @mystage", "ddl_copy"),
        ("show me something", "generic"),
    ],
)
def test_classify_task(objective, expected):
    assert classify_task(objective) == expected


_META = {
    "tables": [
        {
            "table": "ORDERS",
            "columns": [
                {"column_name": "o_orderkey", "type": "NUMBER"},
                {"column_name": "o_totalprice", "type": "FLOAT"},
                {"column_name": "o_orderstatus", "type": "VARCHAR"},
            ],
        },
        {
            "table": "CUSTOMER",
            "columns": [
                {"column_name": "c_custkey", "type": "NUMBER"},
                {"column_name": "c_name", "type": "VARCHAR"},
            ],
        },
    ]
}


def test_generate_scd1_code():
    out = generate_code("SCD1 incremental pipeline for orders", _META)
    assert out["status"] == "SUCCESS" and out["task_type"] == "scd1_pipeline"
    assert "MERGE INTO ORDERS" in out["sql_code"]
    assert "row_number() OVER" in out["sql_code"]
    assert "scd1_merge" in out["pyspark_code"]
    assert "o_orderkey" in out["pyspark_code"]


def test_generate_join_code():
    out = generate_code("join the tables", _META)
    assert out["task_type"] == "join_query"
    assert "JOIN CUSTOMER" in out["sql_code"]
    assert 'how="inner"' in out["pyspark_code"]


def test_generate_aggregation_code():
    out = generate_code("monthly summary of totals", _META)
    assert out["task_type"] == "aggregation"
    assert "GROUP BY" in out["sql_code"]
    assert "groupBy" in out["pyspark_code"]


def test_generate_code_accepts_json_string_and_llm_hook():
    calls = []

    def fake_llm(prompt: str) -> str:
        calls.append(prompt)
        return "-- generated"

    out = generate_code("join stuff", json.dumps(_META), llm=fake_llm)
    assert out["sql_code"] == "-- generated"
    assert len(calls) == 2


def test_filter_relevant_tables():
    kept = filter_relevant_tables(_META["tables"], "show o_totalprice trends")
    assert [t["table"] for t in kept] == ["ORDERS"]
    # table-name mention is also a hit
    kept = filter_relevant_tables(_META["tables"], "describe the CUSTOMER data")
    assert [t["table"] for t in kept] == ["CUSTOMER"]
    # aggregation keywords pull in every table with numeric columns
    kept = filter_relevant_tables(_META["tables"], "SUM of sales")
    assert len(kept) == 2
    kept = filter_relevant_tables(_META["tables"], "nothing matches here")
    assert kept == []


def test_interpret_objective_with_catalog(spark, sf_dir):
    from data_pipelines_snowflake_procedures_spark.session import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    out = interpret_objective(spark, "join o_orderkey against something")
    assert out["status"] == "SUCCESS"
    # temp views are visible through listTables; orders_v carries o_orderkey
    names = [t["table"] for t in out["relevant_metadata"]["tables"]]
    assert "orders_v" in names
    assert out["audit_log"]["agent_name"] == "ObjectiveInterpreterAgent"


def test_glossary_lifecycle(spark, sf_dir):
    import shutil

    from data_pipelines_snowflake_procedures_spark.session import load_table

    # drop any stale on-disk state from prior sessions: the in-memory
    # catalog forgets tables on restart but warehouse dirs persist
    for t in ("gloss_region", "BUSINESS_GLOSSARY"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # warehouse directories are lowercased table names
        shutil.rmtree(f"spark-warehouse/{t.lower()}", ignore_errors=True)
    load_table(spark, sf_dir, "region").limit(5).write.mode(
        "overwrite"
    ).saveAsTable("gloss_region")
    out = generate_business_glossary(spark, "gloss_region")
    assert out["status"] == "SUCCESS"
    assert out["columns_defined"] == 2
    rows = spark.table("BUSINESS_GLOSSARY").collect()
    assert {r["COLUMN_NAME"] for r in rows} == {"r_regionkey", "r_name"}
    # regenerating must not duplicate (targeted delete then append)
    out2 = generate_business_glossary(spark, "gloss_region")
    assert out2["status"] == "SUCCESS"
    assert spark.table("BUSINESS_GLOSSARY").count() == 2


def test_glossary_rejects_bad_identifier(spark):
    out = generate_business_glossary(spark, "bad; DROP TABLE x")
    assert out["status"] == "FAILED"


def test_ingestion_orchestrator(spark, tmp_path):
    p = tmp_path / "sales.csv"
    p.write_text(
        "sale_id,region,amount\n1,EU,10.5\n2,US,20.0\n3,EU,7.25\n"
    )
    out = ingestion_code_generator(
        spark, "aggregate amount by region", str(p)
    )
    assert out["status"] == "SUCCESS"
    assert out["task_type"] == "aggregation"
    assert out["dq_summary"]["total_rules"] > 0
    assert "GROUP BY" in out["sql_code"]
    assert out["file_definition"]["column_count"] == 3


def test_ingestion_orchestrator_failure(spark):
    out = ingestion_code_generator(spark, "whatever", "/missing.csv")
    assert out["status"] == "FAILED" and out["stage"] == "dq_discovery"


def test_generated_code_round_trip(spark, sf_dir):
    """The generated SQL must actually run: interpret the catalog,
    generate an aggregation query, execute it through the engine
    (X4 -> G3 -> X1 chain)."""
    from data_pipelines_snowflake_procedures_spark.pipelines.interpreter import (
        fetch_catalog_metadata,
    )
    from data_pipelines_snowflake_procedures_spark.plans.engine import (
        execute_sql_batch,
    )
    from data_pipelines_snowflake_procedures_spark.session import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rt")
    meta = [t for t in fetch_catalog_metadata(spark) if t["table"] == "orders_rt"]
    gen = generate_code("monthly aggregate of order totals", {"tables": meta})
    assert gen["status"] == "SUCCESS" and gen["task_type"] == "aggregation"
    report = execute_sql_batch(spark, gen["sql_code"] + ";")
    assert report["status"] == "SUCCESS", report
    stmt = report["details"][0]
    assert stmt["status"] == "SUCCESS" and stmt["row_count"] > 0


def test_pii_sampling_fraction(spark):
    from data_pipelines_snowflake_procedures_spark.operators.security import (
        detect_pii_columns,
    )
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        F.concat(F.lit("user"), F.col("id"), F.lit("@example.com")).alias("email")
    )
    assert detect_pii_columns(df, sample_fraction=0.1) == {"email": ["EMAIL"]}


def test_generated_scd1_pyspark_code_executes(spark, sf_dir):
    """The generated PySpark SCD1 script must be runnable as-is:
    exec() it against real staging/target tables and verify the merge
    happened (G1 -> G5 round trip)."""
    import shutil

    from data_pipelines_snowflake_procedures_spark.session import load_table

    for t in ("scd1_rt", "scd1_rt_STAGING"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t.lower()}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").limit(100)
    orders.write.saveAsTable("scd1_rt")
    from pyspark.sql import functions as F

    staging = (
        orders.limit(10)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("CREATED_AT", F.lit(1))
    )
    staging.write.saveAsTable("scd1_rt_STAGING")

    meta = {
        "tables": [
            {
                "table": "scd1_rt",
                "columns": [
                    {"column_name": "o_orderkey", "type": "NUMBER"},
                    {"column_name": "o_totalprice", "type": "FLOAT"},
                ],
            }
        ]
    }
    gen = generate_code("SCD1 incremental load", meta)
    assert gen["task_type"] == "scd1_pipeline"
    exec(gen["pyspark_code"], {"spark": spark})  # noqa: S102 — generated by us
    merged = spark.table("scd1_rt")
    assert merged.count() == 100  # 10 updates matched existing keys
    updated = merged.join(
        staging.select("o_orderkey", F.col("o_totalprice").alias("p")), "o_orderkey"
    )
    assert all(abs(r["o_totalprice"] - r["p"]) < 1e-6 for r in updated.collect())


def test_prepare_corpus_envelope(spark, sf_dir):
    """clean -> split -> chunk -> budget chained with the reference's
    envelope idiom; split happens on documents (not chunks) so one
    document's chunks never straddle train/test."""
    from data_pipelines_snowflake_procedures_spark.pipelines.corpus_prep import (
        prepare_corpus,
    )
    from data_pipelines_snowflake_procedures_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = prepare_corpus(docs, min_quality=0.5, chunk_tokens=32, chunk_overlap=8)
    assert out["status"] == "SUCCESS"
    st = out["stages"]
    assert 0 < st["cleaned_documents"] <= st["raw_documents"] == 200
    assert st["chunks"] >= st["cleaned_documents"]
    assert set(out["split_counts"]) <= {"train", "val", "test"}
    assert sum(out["split_counts"].values()) == st["cleaned_documents"]
    # no-leakage invariant: every chunk of a doc carries one split
    joined = out["chunks"].join(
        out["cleaned"].select("doc_id", "split"), "doc_id"
    )
    assert joined.select("doc_id", "split").distinct().count() == st["cleaned_documents"]
    assert out["audit_log"]["agent_name"] == "CorpusPrepAgent"


def test_prepare_corpus_failure_envelope(spark):
    from data_pipelines_snowflake_procedures_spark.pipelines.corpus_prep import (
        prepare_corpus,
    )

    bad = spark.range(3)  # no text column
    out = prepare_corpus(bad)
    assert out["status"] == "FAILED"
    assert "error" in out


def test_llm_client_from_env_defaults_to_none(monkeypatch):
    """Without LLM_API_BASE the hook is None and codegen stays on the
    deterministic templates — no test ever requires a model."""
    from data_pipelines_snowflake_procedures_spark.pipelines import llm_client

    monkeypatch.delenv("LLM_API_BASE", raising=False)
    assert llm_client.from_env() is None


def test_llm_client_request_shape(monkeypatch):
    """The client speaks the public OpenAI-compatible chat shape:
    bearer header, model passthrough, first-choice message content —
    verified against a stubbed urlopen, no network."""
    import io
    import json as _json

    from data_pipelines_snowflake_procedures_spark.pipelines import llm_client

    captured = {}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    def fake_urlopen(req, timeout=None):
        captured["url"] = req.full_url
        captured["auth"] = req.get_header("Authorization")
        captured["body"] = _json.loads(req.data.decode())
        return _Resp(
            _json.dumps(
                {"choices": [{"message": {"content": "SELECT 1"}}]}
            ).encode()
        )

    monkeypatch.setattr(
        llm_client.urllib.request, "urlopen", fake_urlopen
    )
    client = llm_client.make_client(
        "http://llm.local/v1", api_key="k123", model="m1"
    )
    out = client("emit sql")
    assert out == "SELECT 1"
    assert captured["url"] == "http://llm.local/v1/chat/completions"
    assert captured["auth"] == "Bearer k123"
    assert captured["body"]["model"] == "m1"
    assert captured["body"]["messages"][0]["content"] == "emit sql"
    assert captured["body"]["temperature"] == 0.0
    # and the callable slots straight into the X5 hook
    env = generate_code("monthly summary", {}, llm=client)
    assert env["status"] == "SUCCESS"
    assert env["sql_code"] == "SELECT 1"


@pytest.mark.skipif(
    "LLM_API_BASE" not in __import__("os").environ,
    reason="integration-gated: set LLM_API_BASE to run against a live endpoint",
)
def test_llm_client_completes_live():
    from data_pipelines_snowflake_procedures_spark.pipelines import llm_client

    client = llm_client.from_env()
    assert client is not None
    assert isinstance(client("Reply with the word OK."), str)
