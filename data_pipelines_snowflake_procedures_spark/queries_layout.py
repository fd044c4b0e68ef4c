"""Storage-layout registry entries: Z-order clustering and the
block-skipping effectiveness report (SURVEY §2.15 storage-layout
family).

The reference delegates physical layout entirely to Snowflake
micro-partitions; on Spark the layout IS the design decision, so
these entries make it first-class: build a Morton-ordered block
manifest (what ``OPTIMIZE ZORDER BY`` materializes as file min-max
stats) and measure, with exact integers, how many blocks a
two-dimensional predicate reads under three physical orders. The
quantization, interleave, and block math are pure integer
arithmetic, so the DuckDB oracles restate every step hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.layout import quantize_long, zorder_key, zorder_key_sql
from .queries import register
from .session import load_table

# the quantized-orders frame shared by both entries: price cents and
# epoch-days bucketed to 8-bit ranks, Morton key, and the three
# candidate physical layouts' block ids (key prefixes — NOT
# row_number ranges, so there is no global window; at cluster scale
# each block id is a range-partition of the sort key)
_QID = """
    mm AS (
      SELECT min(pc) AS min_pc, max(pc) AS max_pc,
             min(dd) AS min_dd, max(dd) AS max_dd,
             min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
      FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                   date_diff('day', DATE '1990-01-01',
                             CAST(o_orderdate AS TIMESTAMP)) AS dd,
                   o_orderkey
            FROM orders)
    ),
    q AS (
      SELECT ((pc - min_pc) * 256) // (max_pc - min_pc + 1) AS qx,
             ((dd - min_dd) * 256) // (max_dd - min_dd + 1) AS qy,
             ((o_orderkey - min_k) * 256) // (max_k - min_k + 1) AS qk
      FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
                   date_diff('day', DATE '1990-01-01',
                             CAST(o_orderdate AS TIMESTAMP)) AS dd,
                   o_orderkey
            FROM orders)
      CROSS JOIN mm
    ),
    z AS (
      SELECT qx, qy, qk, {zsql} AS zkey
      FROM q
    )"""


def _quantized_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared frame: (qx, qy, qk, zkey) per order."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1990-01-01"))
        ).cast("long").alias("dd"),
        "o_orderkey",
    )
    mm = o.agg(
        F.min("pc").alias("min_pc"), F.max("pc").alias("max_pc"),
        F.min("dd").alias("min_dd"), F.max("dd").alias("max_dd"),
        F.min("o_orderkey").alias("min_k"),
        F.max("o_orderkey").alias("max_k"),
    )
    q = o.crossJoin(F.broadcast(mm)).select(
        quantize_long(F.col("pc"), F.col("min_pc"), F.col("max_pc")).alias("qx"),
        quantize_long(F.col("dd"), F.col("min_dd"), F.col("max_dd")).alias("qy"),
        quantize_long(
            F.col("o_orderkey"), F.col("min_k"), F.col("max_k")
        ).alias("qk"),
    )
    return q.withColumn("zkey", zorder_key(F.col("qx"), F.col("qy")))


@register(
    "orders_zorder_layout",
    f"""
    WITH {_QID.format(zsql=zorder_key_sql('qx', 'qy'))}
    SELECT zkey >> 8 AS blk,
           count(*)::BIGINT AS n_rows,
           min(qx)::BIGINT AS min_price_bucket,
           max(qx)::BIGINT AS max_price_bucket,
           min(qy)::BIGINT AS min_day_bucket,
           max(qy)::BIGINT AS max_day_bucket,
           ((max(qx) - min(qx) + 1)
            * (max(qy) - min(qy) + 1))::BIGINT AS bbox_area
    FROM z
    GROUP BY 1
    """,
    doc="Z-order (Morton) clustering manifest over orders — the "
    "file-statistics table an ``OPTIMIZE ZORDER BY (price, date)`` "
    "would leave behind: price cents and epoch-days quantized to "
    "8-bit equi-width ranks (operators/layout.py::quantize_long, all "
    "integer — no float division anywhere), bit-interleaved into a "
    "16-bit Morton key (::zorder_key), and grouped into 256 blocks "
    "by KEY PREFIX (zkey >> 8) — a range partition of the z-key, "
    "not a row_number window, so the plan is scan → tiny broadcast "
    "of one min/max row → one O(blocks) groupBy. Each block's row "
    "count, per-dimension min-max box, and bbox_area (the pruning "
    "surface) are exact integers; small boxes in BOTH dimensions at "
    "once are exactly what single-column sorting cannot deliver. "
    "Oracle restates quantization, interleave, and prefix blocks "
    "bit-for-bit.",
)
def orders_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quantized_orders(spark, sf_dir)
    return (
        q.groupBy(F.shiftright("zkey", 8).cast("long").alias("blk"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("qx").alias("min_price_bucket"),
            F.max("qx").alias("max_price_bucket"),
            F.min("qy").alias("min_day_bucket"),
            F.max("qy").alias("max_day_bucket"),
        )
        .withColumn(
            "bbox_area",
            (
                (F.col("max_price_bucket") - F.col("min_price_bucket") + 1)
                * (F.col("max_day_bucket") - F.col("min_day_bucket") + 1)
            ).cast("long"),
        )
    )


# the probe predicate: a quarter of the price range × a quarter of the
# date range, in quantized coordinates (constants so both engines and
# every scale factor probe the same box)
_BOX = (96, 159, 64, 127)


@register(
    "orders_zorder_skipping",
    f"""
    WITH {_QID.format(zsql=zorder_key_sql('qx', 'qy'))},
    laid AS (
      SELECT 'natural' AS layout, qk AS blk, qx, qy FROM z
      UNION ALL
      SELECT 'date_sorted' AS layout, qy AS blk, qx, qy FROM z
      UNION ALL
      SELECT 'zorder' AS layout, zkey >> 8 AS blk, qx, qy FROM z
    ),
    blocks AS (
      SELECT layout, blk,
             count(*)::BIGINT AS n,
             min(qx) AS lo_x, max(qx) AS hi_x,
             min(qy) AS lo_y, max(qy) AS hi_y,
             sum(CASE WHEN qx BETWEEN {_BOX[0]} AND {_BOX[1]}
                       AND qy BETWEEN {_BOX[2]} AND {_BOX[3]}
                      THEN 1 ELSE 0 END)::BIGINT AS matching
      FROM laid GROUP BY 1, 2
    )
    SELECT layout,
           count(*)::BIGINT AS n_blocks,
           sum(CASE WHEN lo_x <= {_BOX[1]} AND hi_x >= {_BOX[0]}
                     AND lo_y <= {_BOX[3]} AND hi_y >= {_BOX[2]}
                    THEN 1 ELSE 0 END)::BIGINT AS blocks_read,
           sum(CASE WHEN lo_x <= {_BOX[1]} AND hi_x >= {_BOX[0]}
                     AND lo_y <= {_BOX[3]} AND hi_y >= {_BOX[2]}
                    THEN n ELSE 0 END)::BIGINT AS rows_read,
           sum(matching)::BIGINT AS rows_matching
    FROM blocks
    GROUP BY layout
    """,
    doc="Block-skipping effectiveness report — the experiment that "
    "justifies Z-ordering 100 TB: the same orders rows are laid into "
    "256 blocks under three physical orders (natural/orderkey, "
    "single-column date sort, Morton interleave of price×date), each "
    "block keeps parquet-style min-max stats, and a two-dimensional "
    "predicate box (a quarter of each dimension's range) is priced "
    "by how many blocks its min-max pruning must read. Output is one "
    "exact-integer row per layout: blocks_read / rows_read collapse "
    "from ~all-blocks (natural), through one-dimension-pruned "
    "(date_sorted reads every date-matching block regardless of "
    "price), to both-dimensions-pruned (zorder). Plan: ONE scan "
    "exploding 3 (layout, block) rows per order, one O(3·blocks) "
    "groupBy — no window, no second pass; the layouts differ only in which integer becomes the "
    "block id, exactly how a real table rewrite differs only in sort "
    "key. Oracle restates all three layouts from the same CTE.",
)
def orders_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo_x, hi_x, lo_y, hi_y = _BOX
    q = _quantized_orders(spark, sf_dir)
    # one scan, three (layout, blk) rows per order via explode — a
    # 3-way union of selects over q would execute the scan + quantize
    # three times (the scan-twice audit rule); the exploded struct
    # array is the single-pass form of the same relation
    laid = q.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"), F.col("qk").alias("blk")
                ),
                F.struct(
                    F.lit("date_sorted").alias("layout"),
                    F.col("qy").alias("blk"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright("zkey", 8).cast("long").alias("blk"),
                ),
            )
        ).alias("lb"),
        "qx",
        "qy",
    ).select(F.col("lb.layout").alias("layout"), F.col("lb.blk").alias("blk"), "qx", "qy")
    in_box = (
        F.col("qx").between(lo_x, hi_x) & F.col("qy").between(lo_y, hi_y)
    ).cast("long")
    blocks = laid.groupBy("layout", "blk").agg(
        F.count("*").alias("n"),
        F.min("qx").alias("lo_x"),
        F.max("qx").alias("hi_x"),
        F.min("qy").alias("lo_y"),
        F.max("qy").alias("hi_y"),
        F.sum(in_box).alias("matching"),
    )
    hit = (
        (F.col("lo_x") <= hi_x)
        & (F.col("hi_x") >= lo_x)
        & (F.col("lo_y") <= hi_y)
        & (F.col("hi_y") >= lo_y)
    )
    return blocks.groupBy("layout").agg(
        F.count("*").alias("n_blocks"),
        F.sum(hit.cast("long")).alias("blocks_read"),
        F.sum(F.when(hit, F.col("n")).otherwise(F.lit(0))).alias("rows_read"),
        F.sum("matching").alias("rows_matching"),
    )
