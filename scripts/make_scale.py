"""Materialize an sf1-equivalent corpus from the sf0.1 testdata
(VERDICT r3 next-round #1: the scale-stress the 100 TB design claims
had never faced).

Scaling is deterministic replication with structure-preserving key
remaps — copy ``i`` of a table shifts every surrogate key by
``i × (max_key + 1)`` so referential integrity holds within each copy
and cross-copy keys never collide. Where naive replication would
DISTORT the workload, the copy transform is chosen to preserve the
original data's similarity structure instead:

* **documents** (×100): every token of ≥5 chars gets a per-copy suffix
  — a vocabulary bijection, so WITHIN-copy Jaccard/minhash/TF-IDF
  structure is exactly the original's, while cross-copy Jaccard drops
  to the shared-stopword floor (≈⅓, below every dedup threshold).
  Short tokens are left alone so the stopword-based language detector
  keeps working. n_chars is recomputed.
* **embeddings** (×50): copy ``i`` circularly shifts the 64 dims by
  ``i`` — an isometry, so within-copy cosine structure (near-dup
  pairs, cluster geometry) is EXACTLY the original's, while cross-copy
  cosines decay to the autocorrelation floor. Naive perturbation either
  creates quadratic cross-copy near-dup output or destroys within-copy
  structure; a per-copy isometry does neither.
* **events** (×50): user_id shifts per copy (50× users, same per-user
  behavior), ts UNCHANGED — 50× denser traffic in the same time range,
  which is the realistic stress for windows/watermark state.
* **customer names** get a two-letter per-copy suffix (edit distance 2
  between copies) so the fuzzy-match entry's FastSS blocking is not
  flooded with cross-copy distance-1 pairs.

Usage:  python scripts/make_scale.py [dst_dir] [--src SRC]
Writes <table>.parquet directories under dst (default /root/repo/var/sf1).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MULTIPLIERS = {
    "region": 1,
    "nation": 1,
    "customer": 10,
    "supplier": 10,
    "part": 10,
    "orders": 10,
    "lineitem": 10,
    "events": 50,
    "documents": 100,
    "embeddings": 50,
}

# key offsets = max key in sf0.1 + 1 (keys are dense there)
OFF = {
    "custkey": 15_000,
    "orderkey": 150_000,
    "partkey": 20_000,
    "suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def _copies(df: DataFrame, k: int) -> DataFrame:
    """Explode df into k copies tagged with __copy in 0..k-1."""
    if k <= 1:
        return df.withColumn("__copy", F.lit(0))
    return df.withColumn(
        "__copy", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )


def _shift(col: str, off_key: str) -> F.Column:
    return (F.col(col) + F.col("__copy") * F.lit(OFF[off_key])).alias(col)


def scale_table(spark: SparkSession, src: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    k = MULTIPLIERS[name]
    c = _copies(df, k)
    if name in ("region", "nation"):
        return df
    if name == "customer":
        suffix = F.concat(
            F.lit("-"),
            # two identical letters per copy: edit distance 2 between
            # any two copies, so FastSS (distance<=1) never cross-pairs
            F.repeat(F.chr((F.lit(97) + F.col("__copy") % 26).cast("long")), 2),
            F.chr((F.lit(97) + (F.col("__copy") / 26).cast("long")).cast("long")),
        )
        return c.select(
            _shift("c_custkey", "custkey"),
            F.concat(F.col("c_name"), suffix).alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
    if name == "supplier":
        return c.select(
            _shift("s_suppkey", "suppkey"), "s_name", "s_nationkey", "s_acctbal"
        )
    if name == "part":
        return c.select(
            _shift("p_partkey", "partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        )
    if name == "orders":
        return c.select(
            _shift("o_orderkey", "orderkey"),
            _shift("o_custkey", "custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    if name == "lineitem":
        return c.select(
            _shift("l_orderkey", "orderkey"),
            _shift("l_partkey", "partkey"),
            _shift("l_suppkey", "suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )
    if name == "events":
        # The source ts is TIMESTAMP(NANOS); a raw session read surfaces
        # it as NTZ (or nano-long under nanosAsLong), neither of which
        # watermarks/epoch-casts accept. Emit a true TIMESTAMP (LTZ,
        # session tz UTC) — exactly what load_table's nano conversion
        # yields for the original testdata, so sf1 behaves identically.
        ts = F.col("ts")
        if dict(df.dtypes)["ts"] == "bigint":
            ts = F.expr("timestamp_micros(ts div 1000)")
        return c.select(
            _shift("event_id", "event_id"),
            ts.cast("timestamp").alias("ts"),
            _shift("user_id", "user_id"),
            "event_type", "value", "props",
        )
    if name == "documents":
        # vocabulary bijection per copy: suffix tokens of >=5 chars with
        # x<copy hex>; stopwords (short) untouched so lang-id survives
        mutated = F.when(
            F.col("__copy") == 0, F.col("text")
        ).otherwise(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"([A-Za-z0-9]{5,})"),
                F.concat(F.lit(r"$1x"), F.conv(F.col("__copy").cast("string"), 10, 16)),
            )
        )
        return c.select(
            _shift("doc_id", "doc_id"),
            mutated.alias("text"),
            "lang",
            "source",
            F.length(mutated).cast("long").alias("n_chars"),
        )
    if name == "embeddings":
        # per-copy isometry: circular shift of the 64 dims by copy index
        dim = 64
        shifted = F.col("embedding")
        expr = None
        for i in range(MULTIPLIERS[name]):
            s = i % dim
            rotated = (
                F.concat(
                    F.slice(F.col("embedding"), s + 1, dim - s),
                    F.slice(F.col("embedding"), 1, s),
                )
                if s
                else F.col("embedding")
            )
            cond = F.col("__copy") == i
            expr = F.when(cond, rotated) if expr is None else expr.when(cond, rotated)
        shifted = expr.otherwise(F.col("embedding"))
        return c.select(
            _shift("vec_id", "vec_id"),
            shifted.alias("embedding"),
            "label",
        )
    raise ValueError(name)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dst = args[0] if args else "/root/repo/var/sf1"
    src = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--src="):
            src = a.split("=", 1)[1]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_pipelines_snowflake_procedures_spark.session import get_spark

    spark = get_spark(app_name="make-scale")
    os.makedirs(dst, exist_ok=True)
    for name, k in MULTIPLIERS.items():
        out = scale_table(spark, src, name)
        path = os.path.join(dst, f"{name}.parquet")
        # few well-sized files; the big tables get one file per ~copy
        n_files = max(1, k // 5)
        out.drop("__copy").repartition(n_files).write.mode("overwrite").parquet(path)
        print(f"{name}: x{k} -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
