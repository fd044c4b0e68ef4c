"""Pipeline code generator (reference X4/X5, G1-G5, SURVEY.md §2.12).

Parity target: ``CODE_GENERATOR_SP(OBJECTIVE, METADATA_JSON)``
(CODE_GENERATOR.sql:17-163) — classify the objective by keyword into a
task type, then generate BOTH a SQL script and a DataFrame-API script
implementing it.

The reference calls a hosted LLM (X5) with per-task prompt contracts.
Here generation is **deterministic templates by default** — each task
type emits Spark SQL + PySpark DataFrame code wired to this package's
own operators (scd1 → operators/scd.py, etc.), so the generated code
is runnable and testable without any model. An ``llm`` callable can be
injected to override template output; tests never require one.
"""

from __future__ import annotations

import datetime as _dt
import json
from collections.abc import Callable
from typing import Any

AGENT_NAME = "CodeGeneratorAgent"

#: Optional LLM hook: takes (prompt: str) -> str. None → templates.
LLMComplete = Callable[[str], str]


def classify_task(objective: str) -> str:
    """X4 keyword router (CODE_GENERATOR.sql:25-34 semantics)."""
    obj = objective.lower()
    if "scd1" in obj or "incremental" in obj:
        return "scd1_pipeline"
    if "join" in obj:
        return "join_query"
    if "summary" in obj or "aggregate" in obj or "monthly" in obj:
        return "aggregation"
    if "filename:" in obj and "stage:" in obj:
        return "ddl_copy"
    return "generic"


def _meta_tables(metadata: dict[str, Any]) -> list[dict[str, Any]]:
    """Normalize metadata to a list of {table, columns:[{column_name,type}]}.

    Accepts the file-definition shape (sources/discovery.py) or a
    {"tables": [...]} catalog shape (pipelines/interpreter.py).
    """
    if "tables" in metadata:
        return metadata["tables"]
    if "columns" in metadata:  # single file definition
        name = metadata.get("file_name", "source").rsplit(".", 1)[0].upper()
        return [{"table": name, "columns": metadata["columns"]}]
    return []


def _key_columns(columns: list[dict[str, Any]]) -> list[str]:
    keys = [
        c["column_name"]
        for c in columns
        if c["column_name"].lower().endswith(("key", "_id", "id"))
    ]
    return keys or [columns[0]["column_name"]] if columns else ["id"]


def _numeric_columns(columns: list[dict[str, Any]]) -> list[str]:
    return [c["column_name"] for c in columns if c.get("type") in ("NUMBER", "FLOAT")]


def generate_scd1(tables: list[dict[str, Any]]) -> dict[str, str]:
    """G1: SCD1 merge — Delta MERGE SQL + PySpark anti-join fallback,
    deduplicating the source to latest-per-key by CREATED_AT first
    (the contract at CODE_GENERATOR.sql:39-59)."""
    t = tables[0] if tables else {"table": "TARGET", "columns": []}
    target = t["table"]
    keys = _key_columns(t["columns"])
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    part = ", ".join(keys)
    sql = f"""-- SCD1 incremental merge into {target}
WITH latest_source AS (
  SELECT * FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY {part} ORDER BY CREATED_AT DESC
    ) AS rn
    FROM {target}_STAGING s
  ) WHERE rn = 1
)
MERGE INTO {target} t
USING latest_source s
ON {on}
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *"""
    pyspark = f"""from data_pipelines_snowflake_procedures_spark.operators.scd import scd1_merge

target = spark.table("{target}")
source = spark.table("{target}_STAGING")
merged = scd1_merge(target, source, keys={keys!r}, order_col="CREATED_AT")
# Spark cannot overwrite a table that feeds the plan being written:
# materialize to a staging table, then swap (atomic at catalog level).
merged.write.mode("overwrite").saveAsTable("{target}__MERGED")
spark.sql("DROP TABLE {target}")
spark.sql("ALTER TABLE {target}__MERGED RENAME TO {target}")"""
    return {"sql_code": sql, "pyspark_code": pyspark}


def generate_join(tables: list[dict[str, Any]]) -> dict[str, str]:
    """G2: equi-join across the metadata tables on shared column names
    (all join keys included, per CODE_GENERATOR.sql:61-73)."""
    if len(tables) < 2:
        t = tables[0]["table"] if tables else "T1"
        return {
            "sql_code": f"SELECT * FROM {t}",
            "pyspark_code": f'df = spark.table("{t}")',
        }
    t1, t2 = tables[0], tables[1]
    cols1 = {c["column_name"] for c in t1["columns"]}
    cols2 = {c["column_name"] for c in t2["columns"]}
    shared = sorted(cols1 & cols2) or [_key_columns(t1["columns"])[0]]
    on = " AND ".join(f"a.{c} = b.{c}" for c in shared)
    sql = f"""SELECT a.*, b.*
FROM {t1["table"]} a
JOIN {t2["table"]} b ON {on}"""
    pyspark = f"""a = spark.table("{t1["table"]}")
b = spark.table("{t2["table"]}")
df = a.join(b, on={shared!r}, how="inner")"""
    return {"sql_code": sql, "pyspark_code": pyspark}


def generate_aggregation(tables: list[dict[str, Any]]) -> dict[str, str]:
    """G3: GROUP BY + computed metrics over the first table's
    non-numeric dims and numeric measures (CODE_GENERATOR.sql:75-87)."""
    t = tables[0] if tables else {"table": "T1", "columns": []}
    numeric = _numeric_columns(t["columns"])
    dims = [c["column_name"] for c in t["columns"] if c["column_name"] not in numeric]
    dims = dims[:2] or [c["column_name"] for c in t["columns"][:1]]
    measures = numeric[:3] or ["1"]
    sql_aggs = ", ".join(f"SUM({m}) AS sum_{m}" for m in measures)
    sql = f"""SELECT {", ".join(dims)}, COUNT(*) AS n_rows, {sql_aggs}
FROM {t["table"]}
GROUP BY {", ".join(dims)}"""
    py_aggs = ", ".join(f'F.sum("{m}").alias("sum_{m}")' for m in measures)
    pyspark = f"""from pyspark.sql import functions as F

df = (spark.table("{t["table"]}")
      .groupBy({dims!r})
      .agg(F.count("*").alias("n_rows"), {py_aggs}))"""
    return {"sql_code": sql, "pyspark_code": pyspark}


def generate_ddl_copy(objective: str, tables: list[dict[str, Any]]) -> dict[str, str]:
    """G4: infer CREATE TABLE DDL from metadata + load from the staged
    file (CODE_GENERATOR.sql:89-106). The COPY INTO becomes a
    spark.read → saveAsTable."""
    filename = _extract_tag(objective, "filename:") or "data.csv"
    table = filename.rsplit(".", 1)[0].upper()
    fmt = filename.rsplit(".", 1)[-1].lower()
    cols = tables[0]["columns"] if tables else []
    type_map = {
        "VARCHAR": "STRING",
        "NUMBER": "BIGINT",
        "FLOAT": "DOUBLE",
        "BOOLEAN": "BOOLEAN",
        "TIMESTAMP": "TIMESTAMP",
        "VARIANT": "STRING",
    }
    ddl_cols = ",\n  ".join(
        f"{c['column_name']} {type_map.get(c.get('type', 'VARIANT'), 'STRING')}"
        for c in cols
    ) or "raw STRING"
    sql = f"""CREATE TABLE IF NOT EXISTS {table} (
  {ddl_cols}
);
-- load the staged file
INSERT INTO {table}
SELECT * FROM {fmt}.`{filename}`"""
    pyspark = f"""from data_pipelines_snowflake_procedures_spark.sources.discovery import read_any

df = read_any(spark, "{filename}")
df.write.mode("overwrite").saveAsTable("{table}")"""
    return {"sql_code": sql, "pyspark_code": pyspark}


def generate_generic(tables: list[dict[str, Any]]) -> dict[str, str]:
    t = tables[0]["table"] if tables else "T1"
    return {
        "sql_code": f"SELECT * FROM {t} LIMIT 100",
        "pyspark_code": f'df = spark.table("{t}").limit(100)',
    }


def _extract_tag(objective: str, tag: str) -> str | None:
    low = objective.lower()
    if tag not in low:
        return None
    rest = objective[low.index(tag) + len(tag) :].strip()
    return rest.split()[0].rstrip(",;") if rest else None


def generate_code(
    objective: str,
    metadata: dict[str, Any] | str,
    llm: LLMComplete | None = None,
) -> dict[str, Any]:
    """Full CODE_GENERATOR_SP parity envelope: task routing, dual
    SQL + PySpark emission, audit log (CODE_GENERATOR.sql:144-163)."""
    start = _dt.datetime.now(_dt.timezone.utc)
    if isinstance(metadata, str):
        metadata = json.loads(metadata) if metadata.strip() else {}
    task_type = classify_task(objective)
    tables = _meta_tables(metadata)
    if llm is not None:
        prompt = (
            f"Objective: {objective}\nTask: {task_type}\n"
            f"Metadata: {json.dumps(metadata)}\n"
            "Emit a SQL script and a PySpark script."
        )
        generated = {"sql_code": llm(prompt), "pyspark_code": llm(prompt + " (pyspark)")}
    elif task_type == "scd1_pipeline":
        generated = generate_scd1(tables)
    elif task_type == "join_query":
        generated = generate_join(tables)
    elif task_type == "aggregation":
        generated = generate_aggregation(tables)
    elif task_type == "ddl_copy":
        generated = generate_ddl_copy(objective, tables)
    else:
        generated = generate_generic(tables)
    end = _dt.datetime.now(_dt.timezone.utc)
    return {
        "status": "SUCCESS",
        "task_type": task_type,
        "sql_code": generated["sql_code"],
        "pyspark_code": generated["pyspark_code"],
        "agent_log": {
            "agent_name": AGENT_NAME,
            "objective": objective,
            "start_time": start.isoformat(),
            "end_time": end.isoformat(),
            "duration_seconds": round((end - start).total_seconds(), 4),
        },
    }
