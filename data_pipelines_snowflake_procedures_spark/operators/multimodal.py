"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed through Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §7 step 8): at 100 TB, image/audio/
video ride as ``binary`` columns next to typed metadata structs;
decode/resize/feature-extract run as vectorized Pandas UDFs so each
Arrow batch crosses the JVM↔Python boundary once.

The container has no imaging/audio libraries, so the decode step is a
clearly-marked stub (``NotImplementedError``) behind
``set_decoder``; everything around it — schema, partition-preserving
batch iteration, UDF signatures, deterministic byte-level features —
is real and tested. Feature extraction (byte counts, Adler-32-style
checksum) is deterministic so results are verifiable.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so scan
partitions stay memory-safe, and never ``collect`` payload columns;
metadata-only projections prune the binary column at the parquet scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Pluggable decoder registry: media kind → bytes -> Any. Real
#: deployments register PIL/libav decoders; default stubs raise.
_DECODERS: dict[str, Callable[[bytes], Any]] = {}


def set_decoder(kind: str, fn: Callable[[bytes], Any]) -> None:
    _DECODERS[kind] = fn


def decode(kind: str, payload: bytes) -> Any:
    """Decode one payload. STUB for image/audio/video until a decoder
    is registered — the container ships no media libraries."""
    if kind in _DECODERS:
        return _DECODERS[kind](payload)
    raise NotImplementedError(
        f"no decoder registered for {kind!r}; call set_decoder() with a "
        "real implementation (e.g. PIL.Image.open for images)"
    )


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def attach_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media-shaped DataFrame from the documents table: the
    UTF-8 bytes of the text stand in for an opaque payload (the harness
    ships no real media), plus the typed metadata struct. The schema
    and column layout are exactly what a real ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


FEATURE_SCHEMA = (
    "doc_id BIGINT, mime STRING, n_bytes BIGINT, checksum BIGINT, "
    "head_hex STRING"
)


def _adler32ish(data: bytes) -> int:
    # simple deterministic rolling checksum (Adler-32 shape) so tests
    # can verify byte-level correctness without any media library
    a, b = 1, 0
    for byte in data:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Byte-level feature extraction over Arrow batches
    (``mapInPandas``): per payload — size, checksum, leading bytes.
    One Python crossing per batch; output schema declared up front so
    Catalyst plans downstream ops without executing Python."""

    def per_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["media_meta"]],
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [_adler32ish(bytes(p)) for p in payloads],
                    "head_hex": [bytes(p)[:8].hex() for p in payloads],
                }
            )
            yield out

    return df.mapInPandas(per_batches, schema=FEATURE_SCHEMA)


GROUP_ZSCORE_SCHEMA = "event_id BIGINT, event_type STRING, zscore DOUBLE"


def groupwise_zscore(
    df: DataFrame,
    key: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score normalization via ``applyInPandas`` — the
    grouped Pandas-UDF surface (group-in → Arrow batch → group-out).

    This op is deliberately SQL-expressible (windowed mean/stddev), so
    the oracle cross-checks the Pandas plumbing itself; real uses of
    this surface are the NON-expressible ones (per-group model scoring,
    library calls). One shuffle on the group key; each group must fit
    in one worker's memory — for the hot-key case pre-split with
    operators/skew.py salting."""

    def normalize(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        std = pdf[value_col].std()  # ddof=1, matches stddev_samp
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                key: pdf[key],
                "zscore": z.round(4),
            }
        )

    return df.select(id_col, key, value_col).groupBy(key).applyInPandas(
        normalize, schema=GROUP_ZSCORE_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic frame/segment sampling plan: keep every Nth item
    by id (for media, every Nth frame index). Pure Column expression —
    the decode of sampled frames happens later in ``extract_features``-
    style batches, so the expensive Python step runs on 1/N of rows."""
    return df.filter((F.col(id_col) % every_n) == 0)
