"""Tests for file discovery + end-to-end DQ pipeline (SURVEY.md §3.2)."""

from __future__ import annotations

import json

import pytest

from data_pipelines_snowflake_procedures_spark.sources.discovery import (
    discover_and_run_dq,
    file_metadata,
    format_file_size,
    map_type_to_palette,
    read_any,
)
from pyspark.sql import types as T


def test_format_file_size():
    assert format_file_size(512) == "512 B"
    assert format_file_size(2048) == "2.0 KB"
    assert format_file_size(3 * 1024 * 1024) == "3.0 MB"


def test_type_palette():
    assert map_type_to_palette(T.StringType()) == "VARCHAR"
    assert map_type_to_palette(T.LongType()) == "NUMBER"
    assert map_type_to_palette(T.IntegerType()) == "NUMBER"
    assert map_type_to_palette(T.DoubleType()) == "FLOAT"
    assert map_type_to_palette(T.BooleanType()) == "BOOLEAN"
    assert map_type_to_palette(T.TimestampType()) == "TIMESTAMP"
    assert map_type_to_palette(T.ArrayType(T.FloatType())) == "VARIANT"


@pytest.fixture(scope="module")
def sample_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("discovery")
    rows = [
        {"id": i, "name": f"n{i}", "score": float(i) / 2, "flag": i % 2 == 0}
        for i in range(50)
    ]
    csv_path = tmp / "sample.csv"
    with open(csv_path, "w") as f:
        f.write("id,name,score,flag\n")
        for r in rows:
            f.write(f"{r['id']},{r['name']},{r['score']},{r['flag']}\n")
    json_path = tmp / "sample.json"
    with open(json_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return {"csv": str(csv_path), "json": str(json_path)}


def test_read_csv_and_json(spark, sample_files):
    for fmt in ("csv", "json"):
        df = read_any(spark, sample_files[fmt])
        assert df.count() == 50
        assert set(df.columns) == {"id", "name", "score", "flag"}


def test_read_parquet(spark, sf_dir):
    df = read_any(spark, f"{sf_dir}/region.parquet")
    assert df.count() == 5


def test_read_unsupported(spark):
    with pytest.raises(ValueError, match="Unsupported"):
        read_any(spark, "/tmp/file.avro")


def test_file_metadata(spark, sample_files):
    df = read_any(spark, sample_files["csv"])
    meta = file_metadata(sample_files["csv"], df)
    assert meta["file_name"] == "sample.csv"
    assert meta["file_type"] == "csv"
    assert meta["row_count"] == 50
    assert meta["column_count"] == 4
    types = {c["column_name"]: c["type"] for c in meta["columns"]}
    assert types["id"] == "NUMBER"
    assert types["name"] == "VARCHAR"
    assert types["score"] == "FLOAT"
    assert types["flag"] == "BOOLEAN"


def test_discover_and_run_dq_envelope(spark, sample_files):
    out = discover_and_run_dq(spark, sample_files["csv"])
    assert out["status"] == "SUCCESS"
    assert out["file_definition"]["row_count"] == 50
    summary = out["dq_auto_check_result"]["summary"]
    assert summary["total_rules"] == summary["passed_rules"] + summary["failed_rules"]
    rules = out["dq_auto_check_result"]["rules"]
    pillars = {r["pillar"] for r in rules}
    assert pillars == {"completeness", "uniqueness", "validity", "accuracy", "consistency"}
    # id is fully unique & complete
    by_col = {
        (r["pillar"], r["column"]): r for r in rules if r["pillar"] != "consistency"
    }
    assert by_col[("completeness", "id")]["result"] == 1.0
    assert by_col[("uniqueness", "id")]["result"] == 1.0
    # id -> name is a functional dependency; flag -> id is not
    cons = {r["column"]: r["status"] for r in rules if r["pillar"] == "consistency"}
    assert cons["id->name"] == "passed"
    assert cons["flag->id"] == "failed"
    assert out["audit_log"]["agent_name"] == "DataDiscoveryAgent"


def test_discover_failure_envelope(spark):
    out = discover_and_run_dq(spark, "/nonexistent/nope.csv")
    assert out["status"] == "FAILED"
    assert "error" in out


def test_file_dq_action_count(spark, sample_files, monkeypatch):
    """The sweep must run exactly 4 collect actions regardless of
    column count: fused profile (completeness/uniqueness + z-score
    stats in ONE pass), outlier count, rare-value, FD — the unfused
    version ran 5. (Raw Spark job ids are no proxy here: AQE
    materializes one job per stage, so the count is counted at the
    action boundary.)"""
    from data_pipelines_snowflake_procedures_spark.sources.discovery import (
        run_file_dq_distributed,
    )

    df = read_any(spark, sample_files["csv"])
    # patch the CONCRETE class (pyspark 4 classic subclasses the
    # pyspark.sql.DataFrame ABC and overrides collect)
    cls = type(df)
    real_collect = cls.collect
    calls = []

    def counting_collect(self):
        calls.append(1)
        return real_collect(self)

    monkeypatch.setattr(cls, "collect", counting_collect)
    run_file_dq_distributed(df)
    assert len(calls) == 4, f"file-DQ sweep ran {len(calls)} actions, expected 4"


def test_excel_dispatch_with_stub_engine(spark, monkeypatch, tmp_path):
    """S2 routing (Data_Discovery_File.sql:325-341): .xlsx dispatches to
    pandas read_excel and the frame promotes through the palette type
    mapping — exercised with a stubbed engine since the container lacks
    openpyxl."""
    import pandas as pd

    fake = pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"], "score": [0.5, 1.5, 2.5]})
    seen = {}

    def fake_read_excel(path, *a, **k):
        seen["path"] = path
        return fake

    monkeypatch.setattr(pd, "read_excel", fake_read_excel)
    xlsx = tmp_path / "book.xlsx"
    xlsx.write_bytes(b"PK\x03\x04stub")
    df = read_any(spark, str(xlsx))
    assert seen["path"] == str(xlsx)
    assert df.count() == 3
    meta = file_metadata(str(xlsx), df)
    types = {c["column_name"]: c["type"] for c in meta["columns"]}
    assert types == {"id": "NUMBER", "name": "VARCHAR", "score": "FLOAT"}


def test_xml_dispatch_with_stub_engine(spark, monkeypatch, tmp_path):
    """S4 routing: .xml dispatches to pandas read_xml (stubbed — no
    lxml in the container) and promotes to a typed DataFrame."""
    import pandas as pd

    fake = pd.DataFrame({"tag": ["x", "y"], "val": [10, 20]})
    monkeypatch.setattr(pd, "read_xml", lambda path, *a, **k: fake, raising=False)
    xml = tmp_path / "doc.xml"
    xml.write_text("<root/>")
    df = read_any(spark, str(xml))
    assert df.count() == 2
    assert {f.name: map_type_to_palette(f.dataType) for f in df.schema.fields} == {
        "tag": "VARCHAR",
        "val": "NUMBER",
    }


def test_excel_import_gate_raises(spark, monkeypatch, tmp_path):
    """Without the optional engine, the gate surfaces
    NotImplementedError (not a raw ImportError)."""
    import pandas as pd

    def boom(path, *a, **k):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "read_excel", boom)
    xlsx = tmp_path / "book.xlsx"
    xlsx.write_bytes(b"PK\x03\x04stub")
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_any(spark, str(xlsx))


def test_write_any_round_trip(spark, sf_dir, tmp_path):
    from data_pipelines_snowflake_procedures_spark.sources.discovery import (
        write_any,
    )
    from data_pipelines_snowflake_procedures_spark.session import load_table

    src = load_table(spark, sf_dir, "region")
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"out_{fmt}")
        write_any(src, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt)
        assert back.count() == 5
        assert set(back.columns) == set(src.columns)
    # text: one string column in, "value" column out (raw-corpus path)
    txt = str(tmp_path / "out_txt")
    write_any(src.select("r_name"), txt, fmt="txt")
    back = read_any(spark, txt, fmt="txt")
    assert back.count() == 5
    assert back.columns == ["value"]
    with pytest.raises(ValueError, match="Unsupported write"):
        write_any(src, str(tmp_path / "x.avro"))
