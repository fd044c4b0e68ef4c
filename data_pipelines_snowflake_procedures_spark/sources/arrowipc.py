"""Arrow IPC (Feather V2) source — beyond-reference format extension.

The reference's discovery procedure reads csv/xlsx/json/xml/parquet
(Data_Discovery_File.sql:317-433); training-data pipelines today also
exchange Arrow IPC files (Feather V2 is exactly the IPC file format),
so `read_any` dispatches .arrow/.feather/.ipc here.

Scale contract: an IPC FILE is a footer-indexed sequence of record
batches, so the natural parallel unit is the batch — the reader opens
the footer once on the driver (schema + batch count only, no data),
then fans the batch indices out and each task reads ONLY its batches
through pyarrow's zero-copy memory map. Like every single-file reader
here it assumes the path is reachable from executors (shared FS /
object store); a directory of IPC files distributes by file the same
way. The STREAM variant of the format has no footer and therefore no
random access: it falls back to a driver-side sequential read with a
loud docstring, the honest answer rather than a fake parallel scan.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark_schema_for(spark: SparkSession, arrow_schema) -> "Any":  # noqa: F821
    """Spark schema for an Arrow schema — pyspark's own converter (the
    same mapping Arrow-batch UDF I/O uses, so the mapInPandas schema
    below can never disagree with what the batches deserialize to)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(arrow_schema)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Arrow IPC file read: one footer open on the driver,
    then batch indices fan out through ``mapInPandas`` and each task
    memory-maps the file and yields only its record batches."""
    import pyarrow as pa

    with pa.memory_map(path, "rb") as f:
        reader = pa.ipc.open_file(f)
        n_batches = reader.num_record_batches
        schema = _spark_schema_for(spark, reader.schema)
    if n_batches == 0:
        return spark.createDataFrame([], schema)

    def read_batches(parts: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pyarrow as pa

        for pdf in parts:
            if len(pdf) == 0:
                continue
            # The driver validated the footer at plan time; if the file
            # vanished or was rewritten since, surface a named error
            # instead of an opaque executor-side Arrow failure.
            try:
                mm = pa.memory_map(path, "rb")
            except Exception as exc:
                raise ValueError(
                    f"Arrow IPC file {path!r} unreadable from executor "
                    f"(moved/deleted since planning?): {exc}"
                ) from exc
            with mm as f:
                r = pa.ipc.open_file(f)
                for b in pdf["batch"]:
                    yield r.get_batch(int(b)).to_pandas()

    idx = spark.range(n_batches).select(F.col("id").alias("batch"))
    # one batch per task when batches are few; Spark packs otherwise
    idx = idx.repartition(min(n_batches, 64))
    return idx.mapInPandas(read_batches, schema=schema)


def read_arrow_stream(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC STREAM (no footer, no random access): sequential
    driver-side read, then one distributed frame. Use the FILE format
    for anything large — this exists so streamed hand-offs still load,
    not as a scale path."""
    import pyarrow as pa

    try:
        with pa.OSFile(path, "rb") as f:
            table = pa.ipc.open_stream(f).read_all()
    except pa.lib.ArrowInvalid as exc:
        raise ValueError(
            f"not a valid Arrow IPC stream: {path!r} ({exc})"
        ) from exc
    return spark.createDataFrame(table.to_pandas())


def sniff_ipc_kind(path: str) -> str:
    """'file' (footer-indexed, magic ARROW1) vs 'stream'. Raises a
    ValueError NAMING THE PATH for payloads that are neither — a
    truncated FILE (head magic without the footer magic) or bytes with
    no Arrow framing at all — instead of deferring the failure to an
    opaque executor-side Arrow error (ADVICE r9)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(8)
        if size >= 8:
            f.seek(-6, os.SEEK_END)
            tail = f.read(6)
        else:
            tail = b""
    if head.startswith(b"ARROW1"):
        if tail == b"ARROW1":
            return "file"
        raise ValueError(
            f"truncated Arrow IPC file {path!r}: header magic present "
            "but footer magic missing"
        )
    # stream framing: every encapsulated message since Arrow 0.15 leads
    # with the 0xFFFFFFFF continuation marker, then the metadata length
    if len(head) >= 8 and head[:4] == b"\xff\xff\xff\xff":
        return "stream"
    raise ValueError(f"not an Arrow IPC file or stream: {path!r}")
