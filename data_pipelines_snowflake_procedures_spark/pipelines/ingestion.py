"""Ingestion orchestrator (reference X3, INGESTION_CODE_GENERATOR.sql,
SURVEY.md §3.2).

Parity target: ``INGESTION_CODE_GENERATORS(OBJECTIVE, FILE_PATH)`` —
run DQ discovery on the file, then feed its file definition into the
code generator, returning both artifacts in one envelope.

The reference chained two stored procedures via ``session.call`` with
mismatched names (the X3 latent bug noted in SURVEY.md §2.9); here the
chain is two plain function calls in-process."""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import SparkSession

from ..sources.discovery import discover_and_run_dq
from .codegen import LLMComplete, generate_code

AGENT_NAME = "IngestionCodeGeneratorAgent"


def ingestion_code_generator(
    spark: SparkSession,
    objective: str,
    file_path: str,
    llm: LLMComplete | None = None,
) -> dict[str, Any]:
    start = _dt.datetime.now(_dt.timezone.utc)
    discovery = discover_and_run_dq(spark, file_path)
    if discovery.get("status") != "SUCCESS":
        return {
            "status": "FAILED",
            "error": discovery.get("error", "discovery failed"),
            "stage": "dq_discovery",
            "agent_name": AGENT_NAME,
        }
    generation = generate_code(objective, discovery["file_definition"], llm=llm)
    end = _dt.datetime.now(_dt.timezone.utc)
    return {
        "status": generation.get("status", "FAILED"),
        "objective": objective,
        "file_path": file_path,
        "dq_summary": discovery["dq_auto_check_result"]["summary"],
        "file_definition": discovery["file_definition"],
        "task_type": generation.get("task_type"),
        "sql_code": generation.get("sql_code"),
        "pyspark_code": generation.get("pyspark_code"),
        "audit_log": {
            "agent_name": AGENT_NAME,
            "start_time": start.isoformat(),
            "end_time": end.isoformat(),
            "duration_seconds": round((end - start).total_seconds(), 4),
        },
    }
