"""Additional TPC-H-shape relational queries (SURVEY.md §2.15 widening).

Round-3 coverage additions: the classic analytic shapes the registry
did not yet exercise — unshipped-revenue top-k (Q3), forecast-revenue
scalar filter-agg (Q6), per-year market share with a window denominator
(Q8), substring-filtered profit rollup (Q9), top-supplier-by-window-max
(Q15), distinct-supplier counts behind multi-table exclusion filters
(Q16), and a disjunctive OR-of-ANDs pushdown aggregate (Q19).

Adapted to the harness schema (TESTDATA.md): there is no ``partsupp``
(lineitem is the part↔supplier link), no ``l_shipmode``/``l_commitdate``
/``o_shippriority``; predicates use the columns that exist. Each entry
follows the registry contract — identical aliases both sides, doubles
rounded, counts cast to BIGINT.

Scale notes are per-query docstrings; the common theme: filters land
before every shuffle, small dims broadcast, top-k is TakeOrdered (no
global sort), and the one window denominator (Q8) partitions by year —
never a single-partition global window over fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import register
from .session import load_table


@register(
    "unshipped_orders_revenue",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority, minus the missing "
    "o_shippriority column): top-10 highest-value orders placed before "
    "a date whose items ship after it. Segment + date filters reach "
    "the scans (pushdown) BEFORE the join shuffles; top-k is "
    "TakeOrdered with a deterministic orderkey tiebreak, never a "
    "global sort.",
)
def unshipped_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "forecast_revenue_delta",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: the what-if discount-elimination scalar "
    "aggregate. Pure filter→agg — every predicate pushes to the "
    "parquet scan (range on shipdate prunes row groups via min/max "
    "stats), zero joins, one partial-agg shuffle of a single row per "
    "task. The canonical 'is pushdown working' probe.",
)
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "nation_market_share_by_year",
    """
    SELECT o_year, nation,
           round(nation_revenue, 2) AS nation_revenue,
           round(nation_revenue / sum(nation_revenue) OVER (PARTITION BY o_year), 6)
               AS market_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             n.n_name AS nation,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS nation_revenue
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1, 2
    )
    """,
    doc="TPC-H Q8 shape (national market share): each ASIA supplier "
    "nation's share of the region's yearly supply revenue. Region "
    "filter prunes via the broadcast nation→region dims BEFORE the "
    "fact shuffle; the share denominator is a window sum PARTITIONED "
    "BY YEAR over the already-aggregated (year × nation) rows — "
    "25ish rows per year, never a global window over fact rows.",
)
def nation_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = F.broadcast(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    per_nation_year = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(asian_nations, supp.s_nationkey == F.col("n_nationkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_raw"
            )
        )
    )
    year_total = Window.partitionBy("o_year")
    return per_nation_year.select(
        "o_year",
        "nation",
        F.round("rev_raw", 2).alias("nation_revenue"),
        F.round(F.col("rev_raw") / F.sum("rev_raw").over(year_total), 6).alias(
            "market_share"
        ),
    )


@register(
    "profit_by_nation_year",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-line profit; no partsupp/supplycost "
    "in the harness, so profit = discounted revenue): substring filter "
    "on part name prunes the part dim BEFORE it broadcasts into the "
    "fact join; one grouped shuffle on (nation, year).",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
    )


@register(
    "top_revenue_suppliers",
    """
    WITH supplier_rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier_rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM supplier_rev)
    """,
    doc="TPC-H Q15 shape (top supplier): quarter-window revenue per "
    "supplier, keep the max (ties included — equality on the ROUNDED "
    "revenue so both engines agree on ties). The max is a window "
    "aggregate over the per-supplier rollup (|suppliers| rows), not a "
    "second scan of lineitem.",
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    best = (
        rev.withColumn(
            "__max_rev", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .drop("__max_rev")
    )
    return best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "part_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_type  <> 'PROMO'
      AND p.p_size IN (1, 10, 20, 30, 40, 49)
      AND s.s_acctbal >= 0
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship; lineitem is the "
    "harness's part↔supplier link, negative account balance stands in "
    "for the complaints exclusion): distinct-supplier counts per part "
    "attribute behind brand/type/size exclusion filters. Both dims "
    "filter before broadcasting; count(DISTINCT) expands in the "
    "grouped shuffle only for qualifying rows.",
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 10, 20, 30, 40, 49)
    )
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "idle_customer_cohorts",
    """
    WITH pos AS (
      SELECT avg(c_acctbal) AS cutoff FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c, pos
    WHERE c.c_acctbal > pos.cutoff
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape (global sales opportunity; market segment "
    "stands in for the missing phone country code): well-funded "
    "customers — balance above the positive-balance average (1-row "
    "scalar subquery, broadcast back) — with no recent orders "
    "(LEFT ANTI join against the date-filtered orders scan), rolled "
    "up per segment. Both the scalar subquery and the anti join "
    "filter BEFORE the group shuffle.",
)
def idle_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cutoff")
    )
    return (
        cust.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "orders_rolling_7d_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate AS order_day,
             sum(o_totalprice) AS day_revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT order_day,
           round(day_revenue, 2) AS day_revenue,
           round(sum(day_revenue) OVER (
             ORDER BY order_day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ), 2) AS revenue_7d
    FROM daily
    """,
    doc="Interval-RANGE rolling window: trailing-7-day revenue over the "
    "DAILY rollup (O(days) rows) — the aggregate-then-window pattern "
    "that keeps the time-range frame off the fact table. The range "
    "frame is time-based (RANGE INTERVAL), not row-count-based, so "
    "gaps in the calendar are handled by frame semantics rather than "
    "a gap-fill join. Single-partition window is safe: one row per "
    "day, bounded by the date filter (365 rows).",
)
def orders_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").alias("order_day"))
        .agg(F.sum("o_totalprice").alias("day_rev_raw"))
    )
    # RANGE frame over a timestamp needs a numeric ordering expression
    # in Spark: order by epoch seconds, frame = trailing 6 days.
    w = (
        Window.orderBy(F.unix_timestamp("order_day"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "order_day",
        F.round("day_rev_raw", 2).alias("day_revenue"),
        F.round(F.sum("day_rev_raw").over(w), 2).alias("revenue_7d"),
    )


@register(
    "nation_balance_quartiles",
    """
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(quantile_cont(s.s_acctbal, 0.25), 4) AS q1_acctbal,
           round(quantile_cont(s.s_acctbal, 0.50), 4) AS median_acctbal,
           round(quantile_cont(s.s_acctbal, 0.75), 4) AS q3_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Grouped EXACT percentiles (interpolated quartiles of supplier "
    "balance per nation): Spark's percentile() aggregate vs DuckDB's "
    "quantile_cont — both exact linear-interpolation, so values "
    "hash-match. Exact grouped percentiles sort within each group; "
    "for 100 TB profiling use the approx_percentile path "
    "(operators/profile.py) — this entry is the exact baseline.",
)
def nation_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.percentile("s_acctbal", F.lit(0.25)), 4).alias("q1_acctbal"),
            F.round(F.percentile("s_acctbal", F.lit(0.50)), 4).alias("median_acctbal"),
            F.round(F.percentile("s_acctbal", F.lit(0.75)), 4).alias("q3_acctbal"),
        )
    )


@register(
    "sole_supplier_multiline_orders",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             count(*) AS n_lines,
             count(DISTINCT l_suppkey) AS n_suppliers,
             min(l_suppkey) AS the_suppkey
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS n_sole_orders
    FROM per_order p JOIN supplier s ON p.the_suppkey = s.s_suppkey
    WHERE p.n_lines >= 2 AND p.n_suppliers = 1
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (no commit/receipt dates in the harness, so "
    "'sole supplier on a multi-line order' replaces the late-delivery "
    "exists/not-exists pair): ONE grouped pass over lineitem computes "
    "per-order line and distinct-supplier counts — the exists + "
    "not-exists correlated pair de-correlates into a single "
    "aggregation, no fact self-join — then a HAVING-style filter and "
    "a broadcast supplier join.",
)
def sole_supplier_multiline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.min("l_suppkey").alias("the_suppkey"),
    )
    sole = per_order.filter(
        (F.col("n_lines") >= 2) & (F.col("n_suppliers") == 1)
    )
    return (
        sole.join(F.broadcast(supp), sole.the_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_sole_orders"))
    )


@register(
    "orders_price_drift_psi",
    """
    WITH binned AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             CASE WHEN o_totalprice < 0 THEN 0
                  WHEN o_totalprice >= 600000.0 THEN 13
                  ELSE CAST(floor(o_totalprice / 50000.0) AS INTEGER) + 1
             END AS bin
      FROM orders
      WHERE year(o_orderdate) IN (1997, 1998)
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (WHERE yr = 1997) AS c_base,
             count(*) FILTER (WHERE yr = 1998) AS c_curr
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT sum(c_base) AS t_base, sum(c_curr) AS t_curr,
             count(*) AS n_bins
      FROM counts
    )
    SELECT CAST(t.n_bins AS BIGINT) AS n_bins,
           CAST(t.t_base AS BIGINT) AS n_base,
           CAST(t.t_curr AS BIGINT) AS n_curr,
           round(sum(
             ((c.c_base + 0.5) / (t.t_base + 0.5 * t.n_bins)
              - (c.c_curr + 0.5) / (t.t_curr + 0.5 * t.n_bins))
             * ln(((c.c_base + 0.5) / (t.t_base + 0.5 * t.n_bins))
                  / ((c.c_curr + 0.5) / (t.t_curr + 0.5 * t.n_bins)))
           ), 6) AS psi
    FROM counts c CROSS JOIN tot t
    GROUP BY t.n_bins, t.t_base, t.t_curr
    """,
    doc="Distribution-drift detection via the Population Stability "
    "Index: order prices binned into fixed 50k-wide edges (manual "
    "floor arithmetic — identical on both engines; DuckDB has no "
    "width_bucket), "
    "1997 (base) vs 1998 (current) shares Laplace-smoothed (+0.5 per "
    "bin) so empty bins can't produce ln(0), PSI = sum((p-q)ln(p/q)). "
    "Plan: one grouped pass over the date-filtered fact (conditional "
    "counts fold into the partial agg), then the PSI fold runs over "
    "<=14 bin rows with the 1-row totals broadcast — the recurring-DQ "
    "shape for monitoring ingest drift at 100 TB (rule of thumb: "
    "PSI < 0.1 stable, > 0.25 shifted).",
)
def orders_price_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    price = F.col("o_totalprice")
    bucket = (
        F.when(price < 0, F.lit(0))
        .when(price >= 600000.0, F.lit(13))
        .otherwise(F.floor(price / 50000.0).cast("int") + 1)
    )
    binned = orders.filter(yr.isin(1997, 1998)).select(
        yr.cast("int").alias("yr"), bucket.alias("bin")
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("yr") == 1997).alias("c_base"),
        F.count_if(F.col("yr") == 1998).alias("c_curr"),
    )
    tot = counts.agg(
        F.sum("c_base").alias("t_base"),
        F.sum("c_curr").alias("t_curr"),
        F.count("*").alias("n_bins"),
    )
    joined = counts.join(F.broadcast(tot))
    p = (F.col("c_base") + 0.5) / (F.col("t_base") + 0.5 * F.col("n_bins"))
    q = (F.col("c_curr") + 0.5) / (F.col("t_curr") + 0.5 * F.col("n_bins"))
    return joined.groupBy("n_bins", "t_base", "t_curr").agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi")
    ).select(
        F.col("n_bins").cast("long").alias("n_bins"),
        F.col("t_base").cast("long").alias("n_base"),
        F.col("t_curr").cast("long").alias("n_curr"),
        "psi",
    )


@register(
    "valuable_parts_share",
    """
    WITH per_part AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(part_rev) AS total FROM per_part)
    SELECT p.p_partkey, p.p_name,
           round(pp.part_rev, 2) AS part_revenue,
           round(pp.part_rev / t.total, 8) AS revenue_share
    FROM per_part pp
    CROSS JOIN tot t
    JOIN part p ON pp.l_partkey = p.p_partkey
    WHERE pp.part_rev / t.total > 0.0005
    """,
    doc="TPC-H Q11 shape (important stock; no partsupp in the harness, "
    "so revenue share replaces supplycost value): parts whose revenue "
    "exceeds a fraction of the corpus total. The total is a 1-row "
    "aggregate over the per-part rollup (broadcast back) — the "
    "HAVING-against-global-scalar pattern with no second fact scan; "
    "the part dim joins AFTER the filter prunes to the heavy tail.",
)
def valuable_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_rev")
    )
    total = per_part.agg(F.sum("part_rev").alias("total"))
    heavy = (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_rev") / F.col("total") > 0.0005)
    )
    return heavy.join(F.broadcast(part), heavy.l_partkey == part.p_partkey).select(
        "p_partkey",
        "p_name",
        F.round("part_rev", 2).alias("part_revenue"),
        F.round(F.col("part_rev") / F.col("total"), 8).alias("revenue_share"),
    )


@register(
    "lineitem_winsorized_stats",
    """
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
               AS winsorized_avg,
           round(stddev_samp(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
               AS winsorized_std
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc="Winsorized robust statistics (feature-engineering staple): "
    "clip each group's price at its own exact p05/p95 (one grouped "
    "percentile pass → O(groups) bounds broadcast back), then "
    "mean/std of the clipped values. Two passes total; at 100 TB "
    "swap the exact percentile for approx_percentile (same plan "
    "shape, no within-group sort) — this entry is the exact "
    "baseline that oracle-verifies the clip-and-aggregate plumbing.",
)
def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    clipped = li.join(F.broadcast(bounds), "l_returnflag").withColumn(
        "v", F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("v"), 4).alias("winsorized_avg"),
        F.round(F.stddev_samp("v"), 4).alias("winsorized_std"),
    )


@register(
    "disjunctive_promo_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1  AND 10
           AND l.l_quantity BETWEEN 1  AND 15)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
    doc="TPC-H Q19 shape (discounted revenue, OR-of-ANDs): the "
    "disjunctive predicate the optimizer must split — per-side "
    "conjuncts (p_brand/p_size disjunction on part, l_quantity range "
    "union on lineitem) are inferred and pushed below the join, so "
    "neither table scans unfiltered at 100 TB.",
)
def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        joined.filter(
            arm("Brand#1", 1, 10, 1, 15)
            | arm("Brand#13", 10, 25, 10, 25)
            | arm("Brand#20", 20, 40, 20, 35)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "part_fifo_return_lag",
    """
    WITH li AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(l_shipdate AS DATE) AS d
      FROM lineitem
    ),
    s AS (
      SELECT l_partkey, d, q,
             sum(q) OVER (PARTITION BY l_partkey
               ORDER BY d, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS s_end
      FROM li
    ),
    s2 AS (SELECT l_partkey, d AS sd, s_end - q AS s_start, s_end FROM s),
    r AS (
      SELECT l_partkey, d, q,
             sum(q) OVER (PARTITION BY l_partkey
               ORDER BY d, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS r_end
      FROM li WHERE l_returnflag = 'R'
    ),
    r2 AS (SELECT l_partkey, d AS rd, r_end - q AS r_start, r_end FROM r),
    m AS (
      SELECT s2.l_partkey,
             least(s2.s_end, r2.r_end)
               - greatest(s2.s_start, r2.r_start) AS oq,
             date_diff('day', s2.sd, r2.rd) AS lag
      FROM s2 JOIN r2
        ON s2.l_partkey = r2.l_partkey
       AND s2.s_end > r2.r_start AND s2.s_start < r2.r_end
    ),
    byp AS (
      SELECT l_partkey, sum(oq) AS units, sum(oq * lag) AS wlag,
             count(*) AS n_pairs
      FROM m GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(sum(b.units) AS BIGINT) AS matched_units,
           CAST(sum(b.wlag) // sum(b.units) AS BIGINT)
             AS mean_lag_days_floor,
           CAST(sum(b.n_pairs) AS BIGINT) AS n_pairs
    FROM byp b JOIN part p ON p.p_partkey = b.l_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
    doc="FIFO lot allocation via running-sum interval matching — the "
    "classic unit-level 'first-shipped, first-returned' attribution "
    "computed WITHOUT per-unit rows: per part, cumulative-quantity "
    "windows turn each shipment and each return into an interval on "
    "the unit number line, and a band join on interval overlap "
    "allocates every returned unit to its FIFO shipment lot in one "
    "pass (overlap width = allocated units). Quantity-weighted "
    "return lag then aggregates to brand with all-integer math "
    "(day-diffs x unit counts; floored integer mean). Ordering ties "
    "pinned by (date, orderkey, linenumber). Scale shape: two "
    "part-keyed windows + one part-keyed band join — per-part state "
    "only, no cross-part shuffle amplification; the unit-interval "
    "trick keeps state per LINEITEM, never per unit (a 50-unit row "
    "is one interval, not 50 rows).",
)
def part_fifo_return_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("l_quantity").cast("long").alias("q"),
        F.col("l_shipdate").cast("date").alias("d"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "d", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = li.withColumn("s_end", F.sum("q").over(w)).select(
        "l_partkey",
        F.col("d").alias("sd"),
        (F.col("s_end") - F.col("q")).alias("s_start"),
        "s_end",
    )
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .withColumn("r_end", F.sum("q").over(w))
        .select(
            "l_partkey",
            F.col("d").alias("rd"),
            (F.col("r_end") - F.col("q")).alias("r_start"),
            "r_end",
        )
    )
    m = s.join(
        r,
        (s["l_partkey"] == r["l_partkey"])
        & (s["s_end"] > r["r_start"])
        & (s["s_start"] < r["r_end"]),
    ).select(
        s["l_partkey"],
        (
            F.least(F.col("s_end"), F.col("r_end"))
            - F.greatest(F.col("s_start"), F.col("r_start"))
        ).alias("oq"),
        F.datediff(F.col("rd"), F.col("sd")).cast("long").alias("lag"),
    )
    byp = m.groupBy("l_partkey").agg(
        F.sum("oq").alias("units"),
        F.sum(F.col("oq") * F.col("lag")).alias("wlag"),
        F.count("*").alias("n_pairs"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        byp.join(part, byp["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum("units").cast("long").alias("matched_units"),
            F.expr("sum(wlag) div sum(units)")
            .cast("long")
            .alias("mean_lag_days_floor"),
            F.sum("n_pairs").cast("long").alias("n_pairs"),
        )
        .orderBy("p_brand")
    )


@register(
    "lineitem_skew_report",
    """
    WITH rep AS (
      SELECT 'l_partkey' AS key_col, l_partkey AS key FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    kc AS (
      SELECT key_col, key, count(*) AS n FROM rep GROUP BY 1, 2
    ),
    rk AS (
      SELECT key_col, n,
             row_number() OVER (
               PARTITION BY key_col ORDER BY n, key) AS i
      FROM kc
    )
    SELECT key_col,
           count(*)::BIGINT AS n_keys,
           sum(n)::BIGINT AS n_rows,
           max(n)::BIGINT AS max_n,
           round(quantile_cont(n, 0.5), 4) AS p50_n,
           round(quantile_cont(n, 0.99), 4) AS p99_n,
           ((max(n) * 10000) // sum(n))::BIGINT AS top1_share_bp,
           round((2.0 * sum(i::HUGEINT * n) - (count(*) + 1.0) * sum(n))
                 / (1.0 * count(*) * sum(n)), 6) AS gini
    FROM rk GROUP BY key_col ORDER BY key_col
    """,
    doc="Join-key skew audit (E189) — the pre-flight a 100 TB join "
    "needs BEFORE choosing salting/AQE-skew-join: per candidate key "
    "(part, supplier) the per-key frequency distribution collapses "
    "to key count, row count, max, exact p50/p99 "
    "(percentile == quantile_cont cross-engine), the hottest key's "
    "share in integer basis points, and the Gini coefficient of key "
    "frequencies via the rank formula G = (2*sum(i*n_i) - (k+1)*T) / "
    "(k*T) over the (n, key)-ordered ranks — rank products summed in "
    "DECIMAL(38,0)/HUGEINT (at petabyte scale sum(i*n) overflows a "
    "long). Plan: one partial-aggregable groupBy per key column to a "
    "KEYS-dimension frame, then a keys-sized rank window — data-sized "
    "rows are never windowed or sorted; this repo's own skew guards "
    "(dedup bucket caps, AA hub caps) are decided by exactly this "
    "readout.",
)
def lineitem_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    outs = []
    for keycol in ("l_partkey", "l_suppkey"):
        kdf = li.groupBy(F.col(keycol).alias("key")).agg(
            F.count("*").alias("n")
        )
        w = Window.orderBy("n", "key")
        rk = kdf.withColumn("i", F.row_number().over(w))
        agg = rk.agg(
            F.lit(keycol).alias("key_col"),
            F.count("*").cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_n"),
            F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50_n"),
            F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99_n"),
            F.expr("CAST((max(n) * 10000) div sum(n) AS BIGINT)").alias(
                "top1_share_bp"
            ),
            F.round(
                F.expr(
                    "(2.0 * CAST(sum(CAST(i AS DECIMAL(38,0)) * n) AS DOUBLE)"
                    " - (count(*) + 1.0) * sum(n))"
                    " / (1.0 * count(*) * sum(n))"
                ),
                6,
            ).alias("gini"),
        )
        outs.append(agg)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_col")


@register(
    "orders_lineitem_reconcile",
    """
    WITH lc AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100) AS BIGINT)) AS l_cents
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents, l_cents
      FROM orders o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey
    ),
    b AS (
      SELECT o_cents,
             CASE WHEN l_cents IS NULL THEN o_cents
                  ELSE abs(o_cents - l_cents) END AS delta,
             CASE
               WHEN l_cents IS NULL THEN 'a_no_lineitems'
               WHEN o_cents = l_cents THEN 'b_exact'
               WHEN abs(o_cents - l_cents) * 10000 <= o_cents * 100
                 THEN 'c_within_1pct'
               WHEN abs(o_cents - l_cents) * 10000 <= o_cents * 1000
                 THEN 'd_within_10pct'
               ELSE 'e_major'
             END AS bucket
      FROM j
    )
    SELECT bucket,
           count(*)::BIGINT AS n_orders,
           ((count(*) * 10000) // (SELECT count(*) FROM orders))::BIGINT
             AS share_bp,
           sum(delta)::BIGINT AS total_abs_delta_cents
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Cross-table financial reconciliation audit (E190) — the "
    "header-vs-detail consistency check every warehouse runs nightly: "
    "does o_totalprice equal the order's lineitem charge total? Each "
    "side is fixed to integer cents FIRST (per-line "
    "round(charge*100), identical expression text both engines), so "
    "the comparison and the absolute-delta sums are exact longs — no "
    "float drift can masquerade as a mismatch. Orders bucket into "
    "no-lineitems / exact / within-1% / within-10% / major via "
    "integer cross-multiplication (delta*10000 <= total*bp — no "
    "division), with counts, share basis points, and unaccounted "
    "cents per bucket. Plan: one lineitem groupBy (partial-agg), one "
    "orders-side left join on the order key, one bucket groupBy — "
    "the 100 TB shape of a reconciliation. On this synthetic corpus "
    "the report correctly finds ZERO exact matches and 257 "
    "line-less orders per 15k at sf0.01 — the tables are generated "
    "independently, and surfacing that is the audit working.",
)
def orders_lineitem_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lc = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("long")
        ).alias("l_cents")
    )
    n_orders = o.count()
    j = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
        "o_orderkey",
    ).join(lc, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    delta = F.when(
        F.col("l_cents").isNull(), F.col("o_cents")
    ).otherwise(F.abs(F.col("o_cents") - F.col("l_cents")))
    bucket = (
        F.when(F.col("l_cents").isNull(), "a_no_lineitems")
        .when(F.col("o_cents") == F.col("l_cents"), "b_exact")
        .when(
            F.abs(F.col("o_cents") - F.col("l_cents")) * 10000
            <= F.col("o_cents") * 100,
            "c_within_1pct",
        )
        .when(
            F.abs(F.col("o_cents") - F.col("l_cents")) * 10000
            <= F.col("o_cents") * 1000,
            "d_within_10pct",
        )
        .otherwise("e_major")
    )
    return (
        j.select(bucket.alias("bucket"), delta.alias("delta"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.expr(f"CAST((count(*) * 10000) div {n_orders} AS BIGINT)").alias(
                "share_bp"
            ),
            F.sum("delta").cast("long").alias("total_abs_delta_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "part_return_rate_shrinkage",
    """
    WITH pp AS (
      SELECT l_partkey AS pk, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
      FROM lineitem GROUP BY 1
    ),
    g1 AS (SELECT sum(r) * 1.0 / sum(n) AS m FROM pp),
    g2 AS (
      SELECT round(greatest(least(
               m * (1 - m)
               / avg((r * 1.0 / n - m) * (r * 1.0 / n - m)) - 1,
               10000.0), 1.0), 6) AS k
      FROM pp, g1 GROUP BY m
    )
    SELECT pk AS p_partkey,
           n::BIGINT AS n_lines,
           r::BIGINT AS n_returns,
           ((r * 10000) // n)::BIGINT AS raw_rate_bp,
           round((r + m * k) / (n + k), 6) AS shrunk_rate
    FROM pp, g1, g2
    ORDER BY p_partkey
    """,
    doc="Empirical-Bayes shrinkage of per-part return rates (E194, "
    "beta-binomial pseudo-count prior): a part with 2 returns in 3 "
    "lines must not outrank one with 200 in 400 — raw rates are "
    "noise-ranked at small n, THE small-sample trap of any per-entity "
    "rate leaderboard. The prior strength K comes from the method-of-"
    "moments identity K = m(1-m)/Var(rates) - 1 (clamped to [1, 1e4]) "
    "and the posterior mean is (r + mK)/(n + K). Determinism: m is a "
    "ratio of exact integer totals, K is ROUNDED to 6 decimals before "
    "use so the only cross-engine float exposure (summation order "
    "inside the variance avg) is absorbed at the same boundary on "
    "both engines, and the FDR entry's sibling contract holds — "
    "brand_return_fdr ranks deviations, this one STABILIZES them. "
    "Plan: one partial-aggregable groupBy to the parts dimension + "
    "two broadcast 1-row priors; the fact table is scanned once.",
)
def part_return_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    pp = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
    ).persist()
    g1 = pp.agg((F.sum("r") * 1.0 / F.sum("n")).alias("m"))
    g2 = (
        pp.crossJoin(F.broadcast(g1))
        .agg(
            F.round(
                F.greatest(
                    F.least(
                        F.expr(
                            "first(m) * (1 - first(m))"
                            " / avg((r * 1.0 / n - m) * (r * 1.0 / n - m)) - 1"
                        ),
                        F.lit(10000.0),
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("k")
        )
    )
    out = (
        pp.crossJoin(F.broadcast(g1))
        .crossJoin(F.broadcast(g2))
        .select(
            F.col("pk").alias("p_partkey"),
            F.col("n").cast("long").alias("n_lines"),
            F.col("r").cast("long").alias("n_returns"),
            F.expr("CAST((r * 10000) div n AS BIGINT)").alias("raw_rate_bp"),
            F.round(
                (F.col("r") + F.col("m") * F.col("k"))
                / (F.col("n") + F.col("k")),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy("p_partkey")
    )
    out = out.localCheckpoint(eager=True)
    pp.unpersist()
    return out


@register(
    "parts_price_index_yearly",
    """
    WITH py AS (
      SELECT l_partkey AS pk,
             CAST(year(l_shipdate) AS INTEGER) AS y,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS ext_cents,
             sum(CAST(round(l_quantity) AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    y0 AS (SELECT min(y) AS base_y FROM py),
    base AS (
      SELECT pk, ext_cents AS ext0, qty AS qty0 FROM py, y0
      WHERE y = base_y AND qty > 0
    ),
    m AS (
      SELECT p.y, p.pk,
             p.ext_cents * 1.0 / p.qty AS pt,
             b.ext0 * 1.0 / b.qty0 AS p0,
             p.qty AS qt, b.qty0 AS q0
      FROM py p JOIN base b ON b.pk = p.pk
      WHERE p.qty > 0
    )
    SELECT y, count(*)::BIGINT AS n_parts_matched,
           round(sum(pt * q0) / sum(p0 * q0), 6) AS laspeyres,
           round(sum(pt * qt) / sum(p0 * qt), 6) AS paasche,
           round(sqrt((sum(pt * q0) / sum(p0 * q0))
                      * (sum(pt * qt) / sum(p0 * qt))), 6) AS fisher
    FROM m GROUP BY y ORDER BY y
    """,
    doc="Yearly Laspeyres / Paasche / Fisher price indices over the "
    "part basket (E199) — the economics-grade 'did prices move or did "
    "the MIX move' decomposition a raw avg-price trend can't give "
    "(Laspeyres holds the base-year basket fixed, Paasche the current "
    "one, Fisher is their geometric mean). Per-(part, year) unit "
    "prices come from exact integer cent/quantity totals; the four "
    "basket sums are double products of those rationals and the "
    "index is their ratio rounded at emission (~1.0 scale, so "
    "summation-order noise is 8 orders below the 6dp boundary). "
    "Plan: one partial-aggregable (part, year) groupBy, a broadcast "
    "base-year basket join, and a years-dimension aggregate — the "
    "fact table is scanned once at any scale.",
)
def parts_price_index_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"
    )
    py = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").cast("int").alias("y"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "ext_cents"
        ),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
    )
    py = py.persist()
    y0 = py.agg(F.min("y").alias("base_y"))
    base = (
        py.crossJoin(F.broadcast(y0))
        .filter((F.col("y") == F.col("base_y")) & (F.col("qty") > 0))
        .select(
            "pk",
            F.col("ext_cents").alias("ext0"),
            F.col("qty").alias("qty0"),
        )
    )
    m = (
        py.filter(F.col("qty") > 0)
        .join(F.broadcast(base), "pk")
        .select(
            "y",
            (F.col("ext_cents") * 1.0 / F.col("qty")).alias("pt"),
            (F.col("ext0") * 1.0 / F.col("qty0")).alias("p0"),
            F.col("qty").alias("qt"),
            F.col("qty0").alias("q0"),
        )
    )
    lasp = F.sum(F.col("pt") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("pt") * F.col("qt")) / F.sum(F.col("p0") * F.col("qt"))
    out = (
        m.groupBy("y")
        .agg(
            F.count("*").cast("long").alias("n_parts_matched"),
            F.round(lasp, 6).alias("laspeyres"),
            F.round(paas, 6).alias("paasche"),
            F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        )
        .orderBy("y")
    )
    out = out.localCheckpoint(eager=True)
    py.unpersist()
    return out


@register(
    "orders_runs_test",
    """
    WITH daily AS (
      SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(rev, 0.5) AS med FROM daily),
    s AS (
      SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS sgn
      FROM daily, med WHERE rev <> med
    ),
    r AS (
      SELECT sgn,
             CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                    OR lag(sgn) OVER (ORDER BY day) <> sgn
                  THEN 1 ELSE 0 END AS run_start
      FROM s
    ),
    agg AS (
      SELECT sum(run_start)::BIGINT AS runs,
             sum(sgn)::BIGINT AS n1,
             sum(1 - sgn)::BIGINT AS n2
      FROM r
    )
    SELECT runs, n1, n2,
           round(1.0 + 2.0 * n1 * n2 / (n1 + n2), 4) AS expected_runs,
           round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4)
             AS z
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test on daily revenue (E200): is the "
    "above/below-median sequence RANDOM, or does revenue cluster in "
    "streaks (momentum / regime) or alternate (overcorrection)? The "
    "nonparametric randomness check that needs no distributional "
    "assumptions — the DQ-flavored sibling of the MAD and "
    "changepoint entries (those find WHERE structure is, this tests "
    "WHETHER serial structure exists at all). Runs counted as "
    "sign-change starts via one lag over the DAYS dimension (median "
    "from exact integer cents, equal-to-median days excluded per the "
    "classic test); expected runs and the normal-approximation z "
    "use the standard closed forms on exact integer n1/n2. Plan: one "
    "partial-aggregable groupBy + a days-sized window — nothing "
    "data-sized is ever ordered.",
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", F.col("o_orderdate")), "yyyy-MM-dd")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    daily = daily.persist()
    med = daily.agg(F.expr("percentile(rev, 0.5)").alias("med"))
    s = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("med"))
        .select(
            "day",
            F.when(F.col("rev") > F.col("med"), 1).otherwise(0).alias("sgn"),
        )
    )
    w = Window.orderBy("day")
    r = s.select(
        "sgn",
        F.when(
            F.lag("sgn").over(w).isNull() | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        ).otherwise(0).alias("run_start"),
    )
    agg = r.agg(
        F.sum("run_start").cast("long").alias("runs"),
        F.sum("sgn").cast("long").alias("n1"),
        F.sum(1 - F.col("sgn")).cast("long").alias("n2"),
    )
    out = agg.select(
        "runs",
        "n1",
        "n2",
        F.round(F.expr("1.0D + 2.0D * n1 * n2 / (n1 + n2)"), 4).alias(
            "expected_runs"
        ),
        F.round(
            F.expr(
                "(runs - (1.0D + 2.0D * n1 * n2 / (n1 + n2)))"
                " / sqrt(2.0D * n1 * n2 * (2.0D * n1 * n2 - n1 - n2)"
                " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0D)))"
            ),
            4,
        ).alias("z"),
    )
    out = out.localCheckpoint(eager=True)
    daily.unpersist()
    return out


@register(
    "nation_supplier_hhi",
    """
    WITH rev AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT nk, sum(cents) AS t, count(*) AS n_suppliers FROM rev GROUP BY 1)
    SELECT n.n_name AS nation,
           t.n_suppliers::BIGINT AS n_suppliers,
           CAST(sum((r.cents * 10000) // t.t
                    * ((r.cents * 10000) // t.t)) AS BIGINT) AS hhi,
           CAST((max(r.cents) * 10000) // t.t AS BIGINT) AS top_share_bp
    FROM rev r
    JOIN tot t ON t.nk = r.nk
    JOIN nation n ON n.n_nationkey = r.nk
    GROUP BY n.n_name, t.n_suppliers, t.t
    ORDER BY nation
    """,
    doc="Herfindahl-Hirschman supplier-concentration index per nation "
    "(E201): the antitrust-standard concentration measure — sum of "
    "squared market shares, here in basis points so HHI ranges 0 to "
    "10000^2/10000=10^8... reported as the sum of squared bp shares "
    "(10^8 = monopoly; the DOJ 'highly concentrated' line 0.25 maps "
    "to 2.5e7). Complements the Gini entries: Gini measures "
    "inequality of the whole distribution, HHI weights the TOP "
    "(squaring makes the largest shares dominate — the 'could one "
    "supplier's failure take the nation down' readout). Shares are "
    "floored integer basis points of exact cent totals, so the "
    "squared sum is exact integer arithmetic — hash-exact with zero "
    "float exposure. Plan: one (nation, supplier) groupBy, one "
    "nation-level re-aggregate, broadcast nation dim.",
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents")
        )
    )
    rev = rev.persist()
    tot = rev.groupBy("nk").agg(
        F.sum("cents").alias("t"), F.count("*").alias("n_suppliers")
    )
    out = (
        rev.join(F.broadcast(tot), "nk")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("nk"))
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg(
            F.expr(
                "CAST(sum((cents * 10000) div t * ((cents * 10000) div t))"
                " AS BIGINT)"
            ).alias("hhi"),
            F.expr("CAST((max(cents) * 10000) div first(t) AS BIGINT)").alias(
                "top_share_bp"
            ),
        )
        .select(
            "nation",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            "hhi",
            "top_share_bp",
        )
        .orderBy("nation")
    )
    out = out.localCheckpoint(eager=True)
    rev.unpersist()
    return out


@register(
    "part_abc_migration",
    """
    WITH rev AS (
      SELECT l_partkey AS pk, CAST(year(l_shipdate) AS INTEGER) AS y,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    cls AS (
      SELECT y, pk,
             CASE WHEN sum(cents) OVER (
                    PARTITION BY y ORDER BY cents DESC, pk ASC
                    ROWS UNBOUNDED PRECEDING) * 10
                  <= sum(cents) OVER (PARTITION BY y) * 7 THEN 'A'
                  WHEN sum(cents) OVER (
                    PARTITION BY y ORDER BY cents DESC, pk ASC
                    ROWS UNBOUNDED PRECEDING) * 10
                  <= sum(cents) OVER (PARTITION BY y) * 9 THEN 'B'
                  ELSE 'C' END AS c
      FROM rev
    )
    SELECT a.y AS year_from, a.c AS from_class, b.c AS to_class,
           count(*)::BIGINT AS n_parts
    FROM cls a JOIN cls b ON b.pk = a.pk AND b.y = a.y + 1
    GROUP BY 1, 2, 3
    ORDER BY year_from, from_class, to_class
    """,
    doc="ABC class migration matrix year over year (E203): which "
    "A-parts DROPPED to B/C and which C-parts climbed — the churn "
    "readout the static part_abc_classification snapshot can't give "
    "(a stable A list and a churning one demand opposite stocking "
    "policies). Same exact-integer Pareto thresholds (cum*10 <= "
    "tot*7/9 on cent longs, deterministic (revenue, partkey) rank "
    "order), classified per YEAR, then one parts-keyed self-join on "
    "adjacent years aggregates to the classes x classes x years "
    "matrix. Windows partition by year over the PARTS dimension; "
    "migrations count only parts present in both years (entries/"
    "exits are a different readout, documented out of scope).",
)
def part_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    )
    rev = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").cast("int").alias("y"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
    )
    w_cum = (
        Window.partitionBy("y")
        .orderBy(F.col("cents").desc(), F.col("pk").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("y")
    cls = rev.select(
        "y",
        "pk",
        F.when(
            F.sum("cents").over(w_cum) * 10 <= F.sum("cents").over(w_tot) * 7,
            "A",
        )
        .when(
            F.sum("cents").over(w_cum) * 10 <= F.sum("cents").over(w_tot) * 9,
            "B",
        )
        .otherwise("C")
        .alias("c"),
    )
    cls = cls.persist()
    a = cls.select(F.col("y").alias("year_from"), "pk", F.col("c").alias("from_class"))
    b = cls.select(
        F.col("y").alias("yb"),
        F.col("pk").alias("pk_b"),
        F.col("c").alias("to_class"),
    )
    out = (
        a.join(
            b,
            (F.col("pk") == F.col("pk_b"))
            & (F.col("yb") == F.col("year_from") + 1),
        )
        .groupBy("year_from", "from_class", "to_class")
        .agg(F.count("*").cast("long").alias("n_parts"))
        .orderBy("year_from", "from_class", "to_class")
    )
    out = out.localCheckpoint(eager=True)
    cls.unpersist()
    return out


@register(
    "lineitem_discount_did",
    """
    WITH cells AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
             CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                  THEN 1 ELSE 0 END AS post,
             count(*) AS n,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT treated, post, n, round(cents * 1.0 / n / 100, 4) AS mean_rev
      FROM cells
    )
    SELECT
      (SELECT n FROM m WHERE treated = 1 AND post = 0)::BIGINT AS n_t_pre,
      (SELECT n FROM m WHERE treated = 1 AND post = 1)::BIGINT AS n_t_post,
      (SELECT mean_rev FROM m WHERE treated = 1 AND post = 0) AS t_pre,
      (SELECT mean_rev FROM m WHERE treated = 1 AND post = 1) AS t_post,
      (SELECT mean_rev FROM m WHERE treated = 0 AND post = 0) AS c_pre,
      (SELECT mean_rev FROM m WHERE treated = 0 AND post = 1) AS c_post,
      round(((SELECT mean_rev FROM m WHERE treated = 1 AND post = 1)
           - (SELECT mean_rev FROM m WHERE treated = 1 AND post = 0))
          - ((SELECT mean_rev FROM m WHERE treated = 0 AND post = 1)
           - (SELECT mean_rev FROM m WHERE treated = 0 AND post = 0)), 4)
        AS did_estimate
    """,
    doc="Difference-in-differences uplift estimate (E204, the "
    "workhorse quasi-experimental design): PROMO-type parts as the "
    "treated group, 1998-01-01 as the policy date, per-line "
    "discounted revenue as the outcome — DiD = (T_post - T_pre) - "
    "(C_post - C_pre) nets out both the group-level baseline gap "
    "AND the common time trend that a naive before/after or "
    "treated/control comparison confounds (the CUPED entry reduces "
    "variance WITHIN a randomized test; DiD identifies an effect "
    "when there was no randomization at all). The four cell means "
    "come from one pass of exact integer cents (2x2 partial-agg "
    "groupBy); the estimate is arithmetic on the four ROUNDED means, "
    "so it is reproducible from the published cells.",
)
def lineitem_discount_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cells = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias(
                "treated"
            ),
            F.when(
                F.col("l_shipdate")
                >= F.lit("1998-01-01 00:00:00").cast("timestamp"),
                1,
            ).otherwise(0).alias("post"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents"),
        )
        .select(
            "treated",
            "post",
            "n",
            F.round(F.col("cents") * 1.0 / F.col("n") / 100, 4).alias("mean_rev"),
        )
    )
    # 4-cell pivot on the driver-free path: conditional firsts over the
    # broadcast-sized cell frame
    agg = cells.agg(
        *[
            F.first(F.when((F.col("treated") == t) & (F.col("post") == q), F.col(c)), ignorenulls=True).alias(f"{c}_{t}{q}")
            for t in (0, 1)
            for q in (0, 1)
            for c in ("n", "mean_rev")
        ]
    )
    return agg.select(
        F.col("n_10").cast("long").alias("n_t_pre"),
        F.col("n_11").cast("long").alias("n_t_post"),
        F.col("mean_rev_10").alias("t_pre"),
        F.col("mean_rev_11").alias("t_post"),
        F.col("mean_rev_00").alias("c_pre"),
        F.col("mean_rev_01").alias("c_post"),
        F.round(
            (F.col("mean_rev_11") - F.col("mean_rev_10"))
            - (F.col("mean_rev_01") - F.col("mean_rev_00")),
            4,
        ).alias("did_estimate"),
    )


@register(
    "lineitem_price_ks_test",
    """
    WITH src AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS grp,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) // 10000 AS bin
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    cells AS (
      SELECT bin,
             sum(grp) AS n1b,
             sum(1 - grp) AS n2b
      FROM src GROUP BY bin
    ),
    cum AS (
      SELECT bin,
             sum(n1b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c1,
             sum(n2b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c2,
             sum(n1b) OVER () AS n1,
             sum(n2b) OVER () AS n2
      FROM cells
    ),
    d AS (
      SELECT max(abs(c1 * n2 - c2 * n1)) AS dnum,
             max(n1) AS n1, max(n2) AS n2
      FROM cum
    )
    SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
           round(dnum * 1.0 / (n1 * n2), 6) AS d_stat,
           round(dnum * 1.0 / (n1 * n2)
                 * sqrt(n1 * 1.0 * n2 / (n1 + n2)), 4) AS ks_stat,
           CASE WHEN dnum * 1.0 / (n1 * n2)
                     * sqrt(n1 * 1.0 * n2 / (n1 + n2)) > 1.358
                THEN 1 ELSE 0 END::BIGINT AS reject_at_05
    FROM d
    """,
    doc="Two-sample Kolmogorov-Smirnov test on binned price "
    "distributions, PROMO vs non-PROMO lines (E206): D = max ECDF "
    "gap computed as the exact INTEGER max of |c1*n2 - c2*n1| over "
    "$100 price bins, divided once at emission — so the "
    "distribution-shape test joins Mann-Whitney (rank location) and "
    "the chi-square entries (categorical mix) with zero float "
    "accumulation; the 1.358 threshold is the alpha=0.05 asymptotic "
    "critical value. Binning is the scale contract: raw cents are "
    "near-unique (an exact KS would order data-sized rows), while "
    "the binned ECDF needs one partial-aggregable groupBy to the "
    "BINS dimension and bins-sized windows — the documented "
    "exact-on-binned tradeoff every streaming KS implementation "
    "makes (binned D lower-bounds raw D).",
)
def lineitem_price_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    src = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("grp"),
        F.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT) div 10000"
        ).alias("bin"),
    )
    cells = src.groupBy("bin").agg(
        F.sum("grp").alias("n1b"), F.sum(1 - F.col("grp")).alias("n2b")
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cells.select(
        F.sum("n1b").over(w_cum).alias("c1"),
        F.sum("n2b").over(w_cum).alias("c2"),
        F.sum("n1b").over(w_all).alias("n1"),
        F.sum("n2b").over(w_all).alias("n2"),
    )
    d = cum.agg(
        F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias(
            "dnum"
        ),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return d.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.expr("dnum * 1.0D / (n1 * n2)"), 6).alias("d_stat"),
        F.round(
            F.expr("dnum * 1.0D / (n1 * n2) * sqrt(n1 * 1.0D * n2 / (n1 + n2))"),
            4,
        ).alias("ks_stat"),
        F.expr(
            "CAST(CASE WHEN dnum * 1.0D / (n1 * n2)"
            " * sqrt(n1 * 1.0D * n2 / (n1 + n2)) > 1.358D"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_at_05"),
    )


@register(
    "lineitem_spearman_qty_price",
    """
    WITH src AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS qb,
             CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS pb
      FROM lineitem
    ),
    cells AS (
      SELECT qb, pb, count(*)::BIGINT AS w FROM src GROUP BY 1, 2
    ),
    qm AS (
      SELECT qb,
             2 * (sum(t) OVER (ORDER BY qb ROWS UNBOUNDED PRECEDING) - t)
               + t + 1 AS r2q
      FROM (SELECT qb, sum(w) AS t FROM cells GROUP BY qb) m
    ),
    pm AS (
      SELECT pb,
             2 * (sum(t) OVER (ORDER BY pb ROWS UNBOUNDED PRECEDING) - t)
               + t + 1 AS r2p
      FROM (SELECT pb, sum(w) AS t FROM cells GROUP BY pb) m
    ),
    mom AS (
      SELECT sum(c.w)                        AS n,
             sum(c.w * q.r2q)                AS sx,
             sum(c.w * p.r2p)                AS sy,
             sum(c.w * q.r2q * q.r2q)        AS sxx,
             sum(c.w * p.r2p * p.r2p)        AS syy,
             sum(c.w * q.r2q * p.r2p)        AS sxy
      FROM cells c JOIN qm q ON q.qb = c.qb JOIN pm p ON p.pb = c.pb
    )
    SELECT n::BIGINT AS n,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt(
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS spearman_rho
    FROM mom
    """,
    doc="Spearman rank correlation between quantity and price (E207), "
    "binned-exact: quantity is already a ~50-value integer domain and "
    "price bins to $100 buckets (the KS entry's grid), so average "
    "ranks are derived FROM MARGINAL COUNTS — 2x-scaled to keep "
    "midranks integral (r2 = 2*cum_before + t + 1) — and rho is "
    "weighted Pearson over the qb x pb cell grid. Scale shape: one "
    "map-side-combinable groupBy to a dimension-sized grid, two "
    "bins-sized windows for the cumulative marginals, and every "
    "moment accumulates as an EXACT integer (Spark decimal(38,0) / "
    "DuckDB hugeint — n*4n^2 exceeds int64 at sf1) cast to double "
    "only inside the final one-row rho expression. No data-sized "
    "global rank/sort, which is what a textbook Spearman would need.",
)
def lineitem_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("qb"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 10000").alias("pb"),
    )
    cells = li.groupBy("qb", "pb").agg(F.count("*").alias("w"))
    cells = cells.persist()

    def _midranks(col: str) -> DataFrame:
        m = cells.groupBy(col).agg(F.sum("w").alias("t"))
        w_cum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return m.select(
            col,
            (2 * (F.sum("t").over(w_cum) - F.col("t")) + F.col("t") + 1).alias(
                "r2" + col[0]
            ),
        )

    mom = (
        cells.join(F.broadcast(_midranks("qb")), "qb")
        .join(F.broadcast(_midranks("pb")), "pb")
        .agg(
            F.sum("w").alias("n"),
            F.sum(F.expr("CAST(w * r2q AS DECIMAL(38,0))")).alias("sx"),
            F.sum(F.expr("CAST(w * r2p AS DECIMAL(38,0))")).alias("sy"),
            F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * r2q * r2q")).alias("sxx"),
            F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * r2p * r2p")).alias("syy"),
            F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * r2q * r2p")).alias("sxy"),
        )
    )
    out = mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.expr(
                "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                "        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
            ),
            6,
        ).alias("spearman_rho"),
    )
    out = out.localCheckpoint(eager=True)
    cells.unpersist()
    return out


@register(
    "part_xyz_classification",
    """
    WITH months AS (
      SELECT count(DISTINCT date_trunc('month', l_shipdate)) AS nm
      FROM lineitem
    ),
    monthly AS (
      SELECT l_partkey AS partkey,
             date_trunc('month', l_shipdate) AS m,
             sum(CAST(round(l_quantity) AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    stats AS (
      SELECT partkey, sum(q) AS tot, sum(q * q) AS tot2
      FROM monthly GROUP BY partkey
    ),
    cv AS (
      SELECT s.partkey,
             round(
               sqrt(greatest(
                 CAST(s.tot2 AS DOUBLE) / m.nm
                 - (CAST(s.tot AS DOUBLE) / m.nm)
                   * (CAST(s.tot AS DOUBLE) / m.nm), 0))
               / (CAST(s.tot AS DOUBLE) / m.nm), 4) AS cv
      FROM stats s, months m
    ),
    xyz AS (
      SELECT partkey,
             cv,
             CASE WHEN cv <= 0.5 THEN 'X'
                  WHEN cv <= 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM cv
    ),
    rev AS (
      SELECT l.l_partkey AS partkey, p.p_brand,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    abc AS (
      SELECT partkey,
             CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                  WHEN cum * 10 <= tot * 9 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM (
        SELECT partkey, cents,
               sum(cents) OVER (
                 PARTITION BY p_brand
                 ORDER BY cents DESC, partkey ASC
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cents) OVER (PARTITION BY p_brand) AS tot
        FROM rev) r
    )
    SELECT a.abc_class, x.xyz_class,
           count(*)::BIGINT AS parts,
           round(avg(x.cv), 4) AS avg_cv
    FROM abc a JOIN xyz x ON x.partkey = a.partkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="ABC x XYZ inventory classification matrix (E209): ABC ranks "
    "parts by revenue contribution within brand (the existing E-entry's "
    "exact integer 70/90 boundaries), XYZ grades demand VARIABILITY by "
    "the coefficient of variation of monthly shipped quantity — "
    "missing months count as zero demand via the global month count, "
    "so no part x month cross join is materialized: variance comes "
    "from per-part (sum q, sum q^2) integer aggregates plus one global "
    "scalar. The 3x3 matrix is the planner's stock-policy staple "
    "(steady A-movers vs erratic C-tail). Shuffles: two part-grain "
    "groupBys + the brand-partitioned ABC window; everything integer "
    "until the final cv division, population variance clamped at 0 "
    "before sqrt.",
)
def part_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = li.persist()
    nm = (
        li.select(F.date_trunc("month", "l_shipdate").alias("m"))
        .distinct()
        .agg(F.count("*").alias("nm"))
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    stats = monthly.groupBy("partkey").agg(
        F.sum("q").alias("tot"), F.sum(F.col("q") * F.col("q")).alias("tot2")
    )
    cv = stats.crossJoin(F.broadcast(nm)).select(
        "partkey",
        F.round(
            F.sqrt(
                F.greatest(
                    F.expr(
                        "CAST(tot2 AS DOUBLE) / nm"
                        " - (CAST(tot AS DOUBLE) / nm) * (CAST(tot AS DOUBLE) / nm)"
                    ),
                    F.lit(0.0),
                )
            )
            / F.expr("CAST(tot AS DOUBLE) / nm"),
            4,
        ).alias("cv"),
    )
    xyz = cv.select(
        "partkey",
        "cv",
        F.when(F.col("cv") <= 0.5, "X")
        .when(F.col("cv") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    rev = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), "p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w_cum = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("cents").desc(), F.col("partkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    abc = rev.select(
        "partkey",
        F.when(
            F.sum("cents").over(w_cum) * 10
            <= F.sum("cents").over(Window.partitionBy("p_brand")) * 7,
            "A",
        )
        .when(
            F.sum("cents").over(w_cum) * 10
            <= F.sum("cents").over(Window.partitionBy("p_brand")) * 9,
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    out = (
        abc.join(xyz, "partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("long").alias("parts"),
            F.round(F.avg("cv"), 4).alias("avg_cv"),
        )
        .orderBy("abc_class", "xyz_class")
    )
    out = out.localCheckpoint(eager=True)
    li.unpersist()
    return out


@register(
    "nation_revenue_bridge",
    """
    WITH base AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS yr,
             l.l_partkey AS partkey,
             sum(CAST(round(l.l_quantity) AS BIGINT)) AS q,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS cents
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2, 3
    ),
    pair AS (
      SELECT coalesce(a.nation, b.nation) AS nation,
             coalesce(a.yr + 1, b.yr) AS yr,
             coalesce(b.q, 0) AS q1, coalesce(b.cents, 0) AS r1,
             coalesce(a.q, 0) AS q0, coalesce(a.cents, 0) AS r0
      FROM base a
      FULL OUTER JOIN base b
        ON b.nation = a.nation AND b.partkey = a.partkey AND b.yr = a.yr + 1
      WHERE coalesce(a.yr + 1, b.yr) <= (SELECT max(yr) FROM base)
    ),
    eff AS (
      SELECT nation, yr,
             r1, r0, q1, q0,
             CASE WHEN q0 > 0 AND q1 > 0 THEN
               CAST(floor((q1 - q0) * (CAST(r0 AS DOUBLE) / q0) * 100) AS BIGINT)
             ELSE 0 END AS vol_u,
             CASE WHEN q0 > 0 AND q1 > 0 THEN
               CAST(floor(q1 * (CAST(r1 AS DOUBLE) / q1
                                - CAST(r0 AS DOUBLE) / q0) * 100) AS BIGINT)
             ELSE 0 END AS price_u,
             CASE WHEN q0 = 0 THEN r1 ELSE 0 END AS new_c,
             CASE WHEN q1 = 0 THEN -r0 ELSE 0 END AS churn_c
      FROM pair
    )
    SELECT nation, yr,
           round(sum(r0) / 100.0, 2) AS rev_prev,
           round(sum(r1) / 100.0, 2) AS rev_curr,
           round(sum(vol_u) / 10000.0, 2) AS volume_effect,
           round(sum(price_u) / 10000.0, 2) AS price_effect,
           round(sum(new_c) / 100.0, 2) AS new_parts_effect,
           round(sum(churn_c) / 100.0, 2) AS churned_parts_effect
    FROM eff
    GROUP BY nation, yr
    ORDER BY nation, yr
    """,
    doc="Year-over-year revenue bridge per nation (E211), the FP&A "
    "waterfall: for each consecutive year pair, discounted revenue "
    "change decomposes into VOLUME (quantity delta at prior-year unit "
    "price), PRICE (current quantity times unit-price delta), NEW "
    "parts (no prior-year sales), and CHURNED parts (no current-year "
    "sales), at (nation, part, year) grain. Determinism contract: "
    "revenue and quantity aggregate as exact integer cents/units; the "
    "per-part volume/price terms — the only rational quantities — are "
    "floor-scaled to integer 1e-4-cent units per part before the "
    "nation-level sum (the adamic-adar integer-micro-unit move), so "
    "no order-dependent float accumulation crosses a shuffle. Scale: "
    "one fact-grain groupBy, a self full-outer join keyed (nation, "
    "part, year) -> (year+1), dims broadcast.",
)
def nation_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("q"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("cents"),
        )
        .persist()
    )
    max_yr = base.agg(F.max("yr").alias("max_yr"))
    # r11 (guide §2.4): the year-over-year pairing was a full_outer
    # SELF-join of base on (nation, partkey, yr+1 = yr). base is
    # unique per (nation, partkey, yr), so each row can instead emit
    # its two roles in ONE scan — previous-year side at slot yr+1,
    # current-year side at slot yr — and a single groupBy reassembles
    # exactly the join's row set (a-only slots ⇒ q1=r1=0 churn rows,
    # b-only slots ⇒ q0=r0=0 new rows, both ⇒ the matched row); sums
    # of one non-null value per side make the coalesce-to-0 identical.
    pair = (
        base.select(
            "nation",
            "partkey",
            F.explode(
                F.array(
                    F.struct(
                        (F.col("yr") + 1).alias("yr"),
                        F.lit(0).cast("long").alias("q1"),
                        F.lit(0).cast("long").alias("r1"),
                        F.col("q").alias("q0"),
                        F.col("cents").alias("r0"),
                    ),
                    F.struct(
                        F.col("yr").alias("yr"),
                        F.col("q").alias("q1"),
                        F.col("cents").alias("r1"),
                        F.lit(0).cast("long").alias("q0"),
                        F.lit(0).cast("long").alias("r0"),
                    ),
                )
            ).alias("s"),
        )
        .groupBy("nation", "partkey", F.col("s.yr").alias("yr"))
        .agg(
            F.sum("s.q1").alias("q1"),
            F.sum("s.r1").alias("r1"),
            F.sum("s.q0").alias("q0"),
            F.sum("s.r0").alias("r0"),
        )
        .select("nation", "yr", "q1", "r1", "q0", "r0")
    )
    pair = pair.join(F.broadcast(max_yr), F.col("yr") <= F.col("max_yr")).drop(
        "max_yr"
    )
    eff = pair.select(
        "nation",
        "yr",
        "r1",
        "r0",
        F.expr(
            "CASE WHEN q0 > 0 AND q1 > 0 THEN"
            " CAST(floor((q1 - q0) * (CAST(r0 AS DOUBLE) / q0) * 100) AS BIGINT)"
            " ELSE 0 END"
        ).alias("vol_u"),
        F.expr(
            "CASE WHEN q0 > 0 AND q1 > 0 THEN"
            " CAST(floor(q1 * (CAST(r1 AS DOUBLE) / q1"
            "                  - CAST(r0 AS DOUBLE) / q0) * 100) AS BIGINT)"
            " ELSE 0 END"
        ).alias("price_u"),
        F.expr("CASE WHEN q0 = 0 THEN r1 ELSE 0 END").alias("new_c"),
        F.expr("CASE WHEN q1 = 0 THEN -r0 ELSE 0 END").alias("churn_c"),
    )
    out = (
        eff.groupBy("nation", "yr")
        .agg(
            F.round(F.sum("r0") / 100.0, 2).alias("rev_prev"),
            F.round(F.sum("r1") / 100.0, 2).alias("rev_curr"),
            F.round(F.sum("vol_u") / 10000.0, 2).alias("volume_effect"),
            F.round(F.sum("price_u") / 10000.0, 2).alias("price_effect"),
            F.round(F.sum("new_c") / 100.0, 2).alias("new_parts_effect"),
            F.round(F.sum("churn_c") / 100.0, 2).alias("churned_parts_effect"),
        )
        .orderBy("nation", "yr")
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


@register(
    "part_item_item_cf",
    """
    WITH bi0 AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_partkey AS pk
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    bi AS (
      SELECT ck, pk FROM (
        SELECT ck, pk,
               row_number() OVER (PARTITION BY ck ORDER BY pk) AS rn
        FROM bi0) t
      WHERE rn <= 50
    ),
    np AS (SELECT pk, count(*)::BIGINT AS n FROM bi GROUP BY pk),
    co AS (
      SELECT a.pk AS i, b.pk AS j, count(*)::BIGINT AS c
      FROM bi a JOIN bi b ON b.ck = a.ck AND b.pk > a.pk
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT i, j, c FROM co
      UNION ALL
      SELECT j AS i, i AS j, c FROM co
    ),
    scored AS (
      SELECT s.i, s.j, s.c,
             ni.n AS n_i, nj.n AS n_j,
             row_number() OVER (
               PARTITION BY s.i
               ORDER BY CAST(s.c AS DOUBLE) * s.c / nj.n DESC, s.j ASC
             ) AS rk
      FROM sym s JOIN np ni ON ni.pk = s.i JOIN np nj ON nj.pk = s.j
    )
    SELECT i AS part_i, j AS part_j, c AS customers_both,
           round(c / sqrt(CAST(n_i AS DOUBLE) * n_j), 6) AS cosine,
           rk::BIGINT AS rank
    FROM scored WHERE rk <= 5
    ORDER BY part_i, rank
    """,
    doc="Item-item collaborative filtering (E212): top-5 most similar "
    "parts per part by binary cosine over the customer x part "
    "purchase matrix — sim(i,j) = |buyers of both| / sqrt(|buyers "
    "i|*|buyers j|), the Amazon-style neighborhood recommender. "
    "Scale guards: baskets cap at 50 parts per customer BEFORE the "
    "pair self-join (documented policy — whale carts would square), "
    "co-support floor of 2 prunes noise pairs, and the per-part "
    "top-5 window orders by the TIE-SAFE key c^2/n_j (equivalent to "
    "cosine within a partition where n_i is constant, computed from "
    "exact integers so both engines see identical doubles) with a "
    "part_j tiebreak. Shuffles: basket cap window, one co-occurrence "
    "self-join keyed on customer, one count groupBy, one part-keyed "
    "rank window.",
)
def part_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import _PAIRGEN

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # capped basket arrays in ONE shuffle (guide §2.4): collect_set
    # dedups (== the old bi0.distinct()) and slice(sort_array(...), 1,
    # 50) == the old row_number().over(orderBy pk) <= 50 cap — the
    # distinct shuffle, the window shuffle and the pair self-join all
    # collapse into this groupBy + an in-task array pair expansion.
    bi = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .groupBy("ck")
        .agg(F.slice(F.sort_array(F.collect_set("pk")), 1, 50).alias("__ss"))
        .persist()
    )
    np_ = (
        bi.select(F.explode("__ss").alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").alias("n"))
    )
    # a pair with c >= 2 needs both items in >= 2 baskets: semi-filter
    # single-buyer items from the pair stream BEFORE the pair shuffle
    keep = np_.filter(F.col("n") >= 2).select("pk")
    # Size the pair aggregation from the data instead of a constant
    # (VERDICT r8 #5): upper-bound the pair stream as rows x (cap-1)/2
    # pre-agg pairs at ~24 B each, target ~64 MB per partition, floor
    # at the sf1-A/B'd 64 (76s cold -> 23s with the widened hash-agg;
    # a literal 64 would under-partition again at 100x). The sum also
    # materializes the persisted basket frame the plan reuses 3x.
    n_baskets = bi.agg(F.sum(F.size("__ss"))).collect()[0][0] or 0
    pair_parts = max(64, min(4096, (n_baskets * 49 // 2) * 24 // (64 << 20) + 1))
    co = (
        bi.select(F.explode(F.expr(_PAIRGEN)).alias("__p"))
        .select(F.col("__p.a").alias("i"), F.col("__p.b").alias("j"))
        .join(F.broadcast(keep.select(F.col("pk").alias("i"))), "i", "left_semi")
        .join(F.broadcast(keep.select(F.col("pk").alias("j"))), "j", "left_semi")
        .repartition(pair_parts, "i", "j")
        .groupBy("i", "j")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
    )
    sym = co.unionByName(
        co.select(F.col("j").alias("i"), F.col("i").alias("j"), "c")
    )
    scored = (
        sym.join(
            F.broadcast(np_.select(F.col("pk").alias("i"), F.col("n").alias("n_i"))),
            "i",
        )
        .join(
            F.broadcast(np_.select(F.col("pk").alias("j"), F.col("n").alias("n_j"))),
            "j",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("i").orderBy(
                    (F.col("c").cast("double") * F.col("c") / F.col("n_j")).desc(),
                    F.col("j").asc(),
                )
            ),
        )
        .filter(F.col("rk") <= 5)
    )
    out = scored.select(
        F.col("i").alias("part_i"),
        F.col("j").alias("part_j"),
        F.col("c").alias("customers_both"),
        F.round(
            F.col("c") / F.sqrt(F.col("n_i").cast("double") * F.col("n_j")), 6
        ).alias("cosine"),
        F.col("rk").cast("long").alias("rank"),
    )
    # no final global sort: the ~5-per-part output is data-sized and the
    # driver compare is order-insensitive (oracle keeps ORDER BY for
    # readability only)
    out = out.localCheckpoint(eager=True)
    bi.unpersist()
    return out


@register(
    "part_brand_target_encoding",
    """
    WITH agg AS (
      SELECT p.p_brand,
             count(*)::BIGINT AS n,
             sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
               AS returns
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    )
    SELECT p_brand, n, returns,
           round(returns * 1.0 / n, 6) AS return_rate,
           CASE WHEN n > 1
                THEN round((returns - 1) * 1.0 / (n - 1), 6) END
             AS enc_if_returned,
           CASE WHEN n > 1
                THEN round(returns * 1.0 / (n - 1), 6) END
             AS enc_if_not,
           round(abs(returns * 1.0 / n
                     - (SELECT sum(returns) * 1.0 / sum(n) FROM agg)), 6)
             AS abs_lift_vs_global
    FROM agg
    ORDER BY p_brand
    """,
    doc="Leave-one-out target encoding of part brand against the "
    "return flag (E213), the leakage-safe categorical feature every "
    "tabular-ML pipeline derives: because the target is binary, the "
    "full per-ROW LOO encoding collapses to a brand x {returned, "
    "not} DICTIONARY — (R-1)/(n-1) and R/(n-1) — so the operator "
    "emits the complete encoder as a dimension-sized table instead "
    "of a data-sized projection (apply = one broadcast join + a "
    "2-way CASE). Single exact-integer fact pass; n=1 brands emit "
    "NULL (undefined LOO) identically in both engines; the global-"
    "lift column ranks brands by signal strength.",
)
def part_brand_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("returns"),
        )
        .persist()
    )
    glob = agg.agg(
        (F.sum("returns") * 1.0 / F.sum("n")).alias("g")
    )
    out = (
        agg.crossJoin(F.broadcast(glob))
        .select(
            "p_brand",
            "n",
            "returns",
            F.round(F.col("returns") * 1.0 / F.col("n"), 6).alias("return_rate"),
            F.when(
                F.col("n") > 1,
                F.round((F.col("returns") - 1) * 1.0 / (F.col("n") - 1), 6),
            ).alias("enc_if_returned"),
            F.when(
                F.col("n") > 1,
                F.round(F.col("returns") * 1.0 / (F.col("n") - 1), 6),
            ).alias("enc_if_not"),
            F.round(
                F.abs(F.col("returns") * 1.0 / F.col("n") - F.col("g")), 6
            ).alias("abs_lift_vs_global"),
        )
        .orderBy("p_brand")
    )
    out = out.localCheckpoint(eager=True)
    agg.unpersist()
    return out


@register(
    "customer_interpurchase_gaps",
    """
    WITH gaps AS (
      SELECT c.c_mktsegment AS seg,
             date_diff('day',
               CAST(lag(o.o_orderdate) OVER (
                 PARTITION BY o.o_custkey
                 ORDER BY o.o_orderdate, o.o_orderkey) AS DATE),
               CAST(o.o_orderdate AS DATE)) AS gap
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    hist AS (
      SELECT seg, gap, count(*)::BIGINT AS cnt
      FROM gaps WHERE gap IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT seg, gap, cnt,
             sum(cnt) OVER (PARTITION BY seg ORDER BY gap
                            ROWS UNBOUNDED PRECEDING) AS c,
             sum(cnt) OVER (PARTITION BY seg) AS n,
             sum(gap * cnt) OVER (PARTITION BY seg) AS s
      FROM hist
    )
    SELECT seg,
           max(n)::BIGINT AS n_gaps,
           round(max(s) * 1.0 / max(n), 4) AS mean_days,
           min(CASE WHEN c * 2 >= n THEN gap END) AS median_days,
           min(CASE WHEN c * 10 >= n * 9 THEN gap END) AS p90_days
    FROM cum GROUP BY seg
    ORDER BY seg
    """,
    doc="Inter-purchase gap distribution per market segment (E214): "
    "days between a customer's consecutive orders via one "
    "customer-partitioned lag window (total order: date then "
    "orderkey), then mean/median/p90 per segment using the "
    "cumulative-histogram DISCRETE rank rule over integer day gaps "
    "— the replenishment-cycle input to CRM timing and churn-"
    "horizon models (complements idle_customer_cohorts' recency "
    "snapshot with the full cadence distribution). All-integer "
    "until the final mean division; the quantile windows run over "
    "segment x distinct-gap histograms, never raw rows.",
)
def customer_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag("o_orderdate").over(w).cast("date"),
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    hist = gaps.groupBy("seg", "gap").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("seg")
    cum = hist.select(
        "seg",
        "gap",
        F.sum("cnt").over(w_cum).alias("c"),
        F.sum("cnt").over(w_all).alias("n"),
        F.sum(F.col("gap") * F.col("cnt")).over(w_all).alias("s"),
    )
    return (
        cum.groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.round(F.max("s") * 1.0 / F.max("n"), 4).alias("mean_days"),
            F.min(F.when(F.col("c") * 2 >= F.col("n"), F.col("gap"))).alias(
                "median_days"
            ),
            F.min(
                F.when(F.col("c") * 10 >= F.col("n") * 9, F.col("gap"))
            ).alias("p90_days"),
        )
        .orderBy("seg")
    )


@register(
    "lineitem_price_qty_elasticity",
    """
    WITH cells AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS qb,
             CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS pb,
             count(*)::BIGINT AS w
      FROM lineitem GROUP BY 1, 2
    ),
    lncells AS (
      SELECT w,
             CAST(floor(ln(pb * 10000 + 5000) * 1e9) AS BIGINT) AS x,
             CAST(floor(ln(qb) * 1e9) AS BIGINT) AS y
      FROM cells WHERE qb >= 1
    ),
    mom AS (
      SELECT sum(w)::BIGINT AS n,
             sum(CAST(w AS HUGEINT) * x) AS sx,
             sum(CAST(w AS HUGEINT) * y) AS sy,
             sum(CAST(w AS HUGEINT) * x * x) AS sxx,
             sum(CAST(w AS HUGEINT) * x * y) AS sxy,
             sum(CAST(w AS HUGEINT) * y * y) AS syy
      FROM lncells
    )
    SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
             AS elasticity,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / n / 1e9, 4) AS ln_intercept,
           round(pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
             AS r_squared
    FROM mom
    """,
    doc="Log-log price elasticity of quantity (E229): weighted OLS of "
    "ln(quantity) on ln(price-bin midpoint) over the same $100 x "
    "unit-quantity cell grid the Spearman entry uses — slope = "
    "elasticity, the demand-curve headline number. Every ln takes an "
    "INTEGER argument (bin midpoint cents, unit quantities) and "
    "floor-scales to nano-units; the five weighted moments accumulate "
    "hugeint/decimal so nothing order-dependent crosses a shuffle; "
    "slope/intercept/R^2 emerge from one final row of identical "
    "doubles. One map-side-combinable groupBy; no data-sized state.",
)
def lineitem_price_qty_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("qb"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 10000").alias(
            "pb"
        ),
    )
    cells = li.groupBy("qb", "pb").agg(F.count("*").alias("w"))
    lncells = cells.filter(F.col("qb") >= 1).select(
        "w",
        F.expr("CAST(floor(ln(pb * 10000 + 5000) * 1e9) AS BIGINT)").alias("x"),
        F.expr("CAST(floor(ln(qb) * 1e9) AS BIGINT)").alias("y"),
    )
    mom = lncells.agg(
        F.sum("w").alias("n"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x")).alias("sx"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * y")).alias("sy"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x * x")).alias("sxx"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x * y")).alias("sxy"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * y * y")).alias("syy"),
    )
    slope = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return mom.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.expr(slope), 4).alias("elasticity"),
        F.round(
            F.expr(
                f"(CAST(sy AS DOUBLE) - {slope} * CAST(sx AS DOUBLE))"
                " / n / 1e9"
            ),
            4,
        ).alias("ln_intercept"),
        F.round(
            F.expr(
                "pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2)"
                " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                "    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
                "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
            ),
            4,
        ).alias("r_squared"),
    )


@register(
    "part_price_ladder_gaps",
    """
    WITH pts AS (
      SELECT DISTINCT p_brand,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    gaps AS (
      SELECT p_brand, cents,
             cents - lag(cents) OVER (
               PARTITION BY p_brand ORDER BY cents) AS gap
      FROM pts
    )
    SELECT p_brand,
           count(*)::BIGINT AS price_points,
           round(min(cents) / 100.0, 2) AS min_price,
           round(max(cents) / 100.0, 2) AS max_price,
           max(gap)::BIGINT AS max_gap_cents,
           CAST(sum(gap) // (count(*) - 1) AS BIGINT) AS avg_gap_cents,
           (max(gap) * 10000 // (max(cents) - min(cents)))::BIGINT
             AS max_gap_share_bp
    FROM gaps
    GROUP BY p_brand
    HAVING count(*) >= 2
    ORDER BY p_brand
    """,
    doc="Price-ladder gap analysis per brand (E235), the assortment "
    "planner's coverage check: distinct retail price points sorted "
    "within brand, the largest rung gap in cents and as a share of "
    "the brand's price span — a big max_gap_share_bp names the "
    "price band where the brand offers nothing (the classic "
    "good-better-best audit). Integer cents end to end (avg gap is "
    "an integer floor-div, span share in bp); the lag window "
    "partitions by brand over DISTINCT price points, so it is "
    "dimension-sized at any SF.",
)
def part_price_ladder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        )
        .distinct()
    )
    w = Window.partitionBy("p_brand").orderBy("cents")
    gaps = pts.withColumn("gap", F.col("cents") - F.lag("cents").over(w))
    return (
        gaps.groupBy("p_brand")
        .agg(
            F.count("*").alias("price_points"),
            F.round(F.min("cents") / 100.0, 2).alias("min_price"),
            F.round(F.max("cents") / 100.0, 2).alias("max_price"),
            F.max("gap").cast("long").alias("max_gap_cents"),
            F.expr("CAST(sum(gap) div (count(*) - 1) AS BIGINT)").alias(
                "avg_gap_cents"
            ),
            F.expr(
                "CAST(max(gap) * 10000 div (max(cents) - min(cents)) AS BIGINT)"
            ).alias("max_gap_share_bp"),
        )
        .filter(F.col("price_points") >= 2)
        .orderBy("p_brand")
    )


@register(
    "part_size_price_anova",
    """
    WITH g AS (
      SELECT p_size,
             count(*)::BIGINT AS ng,
             sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sw,
             sum(CAST(round(p_retailprice * 100) AS BIGINT)
                 * CAST(round(p_retailprice * 100) AS BIGINT)) AS sw2
      FROM part GROUP BY p_size
    ),
    t AS (
      SELECT count(*)::BIGINT AS k,
             sum(ng)::BIGINT AS n,
             sum(sw) AS s,
             sum(sw2) AS s2,
             sum(CAST(floor(CAST(sw AS DOUBLE) * sw / ng) AS HUGEINT))
               AS ssb_u
      FROM g
    )
    SELECT k, n, (k - 1)::BIGINT AS df_between, (n - k)::BIGINT AS df_within,
           round(((CAST(ssb_u AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (k - 1))
                 / ((CAST(s2 AS DOUBLE) - CAST(ssb_u AS DOUBLE)) / (n - k)), 4)
             AS f_stat,
           round((CAST(ssb_u AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
             AS eta_squared
    FROM t
    """,
    doc="One-way ANOVA of retail price across part sizes (E238), the "
    "parametric twin of the Kruskal-Wallis rank entry: F = "
    "(SSB/(k−1))/(SSW/(N−k)) and the eta-squared effect size, all "
    "from ONE dimension-sized pass of exact integer (n, Σw, Σw²) "
    "cent moments per size — SSB via the Σ(S_g²/n_g) identity with "
    "each group term FLOORED TO AN INTEGER before the 50-row sum "
    "(hugeint/decimal), so not even the dimension rollup depends on "
    "float accumulation order. Emits F "
    "and the dfs; the decision belongs to the caller since F "
    "critical values need both dfs.",
)
def part_size_price_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_size",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("w"),
        )
        .groupBy("p_size")
        .agg(
            F.count("*").alias("ng"),
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("w")).alias("sw2"),
        )
    )
    t = g.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sw").alias("s"),
        F.sum("sw2").alias("s2"),
        F.sum(
            F.expr(
                "CAST(floor(CAST(sw AS DOUBLE) * sw / ng) AS DECIMAL(38,0))"
            )
        ).alias("ssb_u"),
    )
    return t.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        (F.col("k") - 1).cast("long").alias("df_between"),
        (F.col("n") - F.col("k")).cast("long").alias("df_within"),
        F.round(
            F.expr(
                "((CAST(ssb_u AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
                " / (k - 1))"
                " / ((CAST(s2 AS DOUBLE) - CAST(ssb_u AS DOUBLE)) / (n - k))"
            ),
            4,
        ).alias("f_stat"),
        F.round(
            F.expr(
                "(CAST(ssb_u AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
                " / (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
            ),
            6,
        ).alias("eta_squared"),
    )


@register(
    "orders_wilson_ci_by_priority",
    """
    WITH flags AS (
      SELECT o.o_orderpriority AS pri,
             max(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) > 90
                      THEN 1 ELSE 0 END) AS late
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority
    ),
    agg AS (
      SELECT pri, count(*)::BIGINT AS n, sum(late)::BIGINT AS x
      FROM flags GROUP BY pri
    )
    SELECT pri AS o_orderpriority, n, x AS late_orders,
           round(x * 1.0 / n, 6) AS p_hat,
           round((x * 1.0 / n + 1.9208 / n
                  - 1.96 * sqrt((x * 1.0 / n) * (1 - x * 1.0 / n) / n
                                + 0.9604 / (n * 1.0 * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lo,
           round((x * 1.0 / n + 1.9208 / n
                  + 1.96 * sqrt((x * 1.0 / n) * (1 - x * 1.0 / n) / n
                                + 0.9604 / (n * 1.0 * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_hi
    FROM agg ORDER BY pri
    """,
    doc="Wilson score 95% intervals for the per-priority late-order "
    "rate (E239, >90 days order-to-first-ship): the closed-form "
    "binomial CI that stays inside [0,1] and behaves at small n and "
    "extreme rates where the Wald interval collapses — the "
    "ANALYTICAL companion to the bootstrap CI entries (resampling "
    "vs formula, two independent routes to uncertainty). Order-"
    "level lateness folds with one max-groupBy (any late line flags "
    "the order), counts stay integer, and the interval arithmetic "
    "is per-row doubles from exact (n, x) — z constants inlined "
    "(1.96, z²=3.8416, z²/2=1.9208, z²/4=0.9604) so both engines "
    "evaluate the identical expression tree.",
)
def orders_wilson_ci_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    flags = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderpriority").alias("pri"))
        .agg(
            F.max(
                F.when(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                    > 90,
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    agg = flags.groupBy("pri").agg(
        F.count("*").alias("n"), F.sum("late").alias("x")
    )
    ph = "x * 1.0D / n"
    rad = f"1.96D * sqrt(({ph}) * (1 - {ph}) / n + 0.9604D / (n * 1.0D * n))"
    return agg.select(
        F.col("pri").alias("o_orderpriority"),
        "n",
        F.col("x").alias("late_orders"),
        F.round(F.expr(ph), 6).alias("p_hat"),
        F.round(
            F.expr(f"({ph} + 1.9208D / n - {rad}) / (1 + 3.8416D / n)"), 6
        ).alias("wilson_lo"),
        F.round(
            F.expr(f"({ph} + 1.9208D / n + {rad}) / (1 + 3.8416D / n)"), 6
        ).alias("wilson_hi"),
    ).orderBy("o_orderpriority")


@register(
    "orders_status_aging",
    """
    WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    aged AS (
      SELECT o_orderstatus,
             least(date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(a.maxd AS DATE)) // 180, 4) AS halfyears,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders, anchor a
    ),
    cell AS (
      SELECT o_orderstatus, halfyears,
             count(*)::BIGINT AS orders,
             sum(cents) AS cents
      FROM aged GROUP BY 1, 2
    ),
    tot AS (SELECT halfyears, sum(orders)::BIGINT AS t FROM cell GROUP BY 1)
    SELECT c.o_orderstatus, c.halfyears::BIGINT AS age_halfyears,
           c.orders,
           round(c.cents / 100.0, 2) AS order_value,
           (c.orders * 10000 // t.t)::BIGINT AS age_share_bp
    FROM cell c JOIN tot t ON t.halfyears = c.halfyears
    ORDER BY c.o_orderstatus, c.halfyears
    """,
    doc="Order-status aging matrix (E240), the WIP health readout: "
    "orders bucketed by status x half-years-since-placement (capped "
    "4+), with each status's share of its age cohort in bp — open "
    "('O') orders concentrated in OLD buckets are the stuck-WIP "
    "signal an operations dashboard pages on, and the status mix "
    "drifting across ages approximates the fulfillment lifecycle "
    "without event-level history. Anchor = corpus max order date "
    "(replayable); one fact groupBy to a 15-cell grid, integer "
    "day/cent arithmetic throughout.",
)
def orders_status_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    o = o.persist()
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    aged = o.crossJoin(F.broadcast(anchor)).select(
        "o_orderstatus",
        F.least(
            F.expr(
                "datediff(CAST(maxd AS DATE), CAST(o_orderdate AS DATE)) div 180"
            ),
            F.lit(4),
        ).alias("halfyears"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cell = aged.groupBy("o_orderstatus", "halfyears").agg(
        F.count("*").alias("orders"), F.sum("cents").alias("cents")
    )
    tot = cell.groupBy("halfyears").agg(F.sum("orders").alias("t"))
    out = (
        cell.join(F.broadcast(tot), "halfyears")
        .select(
            "o_orderstatus",
            F.col("halfyears").cast("long").alias("age_halfyears"),
            "orders",
            F.round(F.col("cents") / 100.0, 2).alias("order_value"),
            F.expr("orders * 10000 div t").cast("long").alias("age_share_bp"),
        )
        .orderBy("o_orderstatus", "age_halfyears")
    )
    out = out.localCheckpoint(eager=True)
    o.unpersist()
    return out


@register(
    "orders_interarrival_weibull",
    """
    WITH gaps AS (
      SELECT date_diff('day',
               CAST(lag(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ),
    hist AS (
      SELECT gap, count(*)::BIGINT AS cnt
      FROM gaps WHERE gap >= 1 GROUP BY gap
    ),
    cum AS (
      SELECT gap, cnt,
             CAST(sum(cnt) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM hist
    ),
    pts AS (
      SELECT CAST(floor(ln(CAST(gap AS DOUBLE)) * 1e9) AS BIGINT) AS x,
             CAST(floor(ln(-ln(1.0 - (i - 0.3) / (n + 0.4))) * 1e9)
                  AS BIGINT) AS y
      FROM cum, unnest(range(c - cnt + 1, c + 1)) AS t(i)
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      FROM pts
    )
    SELECT n AS n_gaps,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS shape_k,
           round(exp(-((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                       / n / 1e9)
                     / ((n * sxy - sx * sy) / (n * sxx - sx * sx))),
                 2) AS scale_days
    FROM mom
    """,
    doc="Weibull reliability fit (E255) of customer order interarrival "
    "times by median-rank regression: sorted gaps get plotting "
    "positions F_i=(i-0.3)/(n+0.4) (Bernard's approximation) and OLS "
    "on ln(-ln(1-F)) vs ln(t) yields shape k (slope; k<1 = "
    "bursty/decreasing hazard, k=1 = memoryless, k>1 = rhythmic "
    "reordering) and scale lambda = exp(-intercept/slope) in days — "
    "the lifetime-model upgrade of the plain gap histogram entry. "
    "Scale-safe rank assignment: ranks derive from the integer-day "
    "gap HISTOGRAM's cumulative spans (each gap row unnests its own "
    "rank range), so no observation-grain global sort exists — the "
    "only global window runs over the histogram (days-dimension). "
    "Per-point (x, y) floor to 1e-9 before exact 128-bit moment "
    "sums: hash-exact cross-engine.",
)
def orders_interarrival_weibull(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap")
    ).filter(F.col("gap") >= 1)
    hist = gaps.groupBy("gap").agg(F.count("*").cast("long").alias("cnt"))
    w_cum = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "gap",
        "cnt",
        F.sum("cnt").over(w_cum).alias("c"),
        F.sum("cnt").over(
            Window.orderBy("gap").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    pts = cum.select(
        "gap",
        F.explode(F.sequence(F.col("c") - F.col("cnt") + 1, F.col("c"))).alias("i"),
        "n",
    ).select(
        F.floor(F.log(F.col("gap").cast("double")) * 1e9).cast("long").alias("x"),
        F.floor(
            F.log(-F.log(F.lit(1.0) - (F.col("i") - 0.3) / (F.col("n") + 0.4)))
            * 1e9
        )
        .cast("long")
        .alias("y"),
    )
    mom = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("double").alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        F.col("n").alias("n_gaps"),
        F.round(slope, 4).alias("shape_k"),
        F.round(
            F.exp(
                -((F.col("sy") - slope * F.col("sx")) / F.col("n") / 1e9) / slope
            ),
            2,
        ).alias("scale_days"),
    )


@register(
    "orders_cohort_retention_matrix",
    """
    WITH firstq AS (
      SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_dt
      FROM orders GROUP BY o_custkey
    ),
    base AS (
      SELECT o.o_custkey,
             year(f.first_dt) * 4 + quarter(f.first_dt) - 1 AS cq,
             year(f.first_dt) AS cy, quarter(f.first_dt) AS cqt,
             year(CAST(o.o_orderdate AS DATE)) * 4
               + quarter(CAST(o.o_orderdate AS DATE)) - 1 AS oq
      FROM orders o JOIN firstq f ON f.o_custkey = o.o_custkey
    ),
    size_ AS (
      SELECT cq, CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_size
      FROM base GROUP BY cq
    ),
    ret AS (
      SELECT cq, min(cy) AS cy, min(cqt) AS cqt,
             oq - cq AS quarters_since,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers
      FROM base GROUP BY cq, oq - cq
    )
    SELECT CAST(r.cy AS VARCHAR) || '-Q' || CAST(r.cqt AS VARCHAR)
             AS cohort,
           CAST(r.quarters_since AS BIGINT) AS quarters_since,
           r.active_customers,
           s.cohort_size,
           round(CAST(r.active_customers AS DOUBLE) / s.cohort_size, 6)
             AS retention
    FROM ret r JOIN size_ s ON s.cq = r.cq
    """,
    doc="Customer repurchase retention triangle by acquisition QUARTER "
    "(E259): cohort = the quarter of a customer's first order, each "
    "cell = distinct cohort customers who ordered again k quarters "
    "later over the cohort size — the revenue-side complement to the "
    "user/day events_retention_cohorts entry (same triangle shape, "
    "order-grain truth, quarterly horizon). Integer distinct counts "
    "+ one rounded division: hash-exact. Plan: one first-order "
    "aggregate, one customer-keyed join back, one (cohort, offset) "
    "distinct-count — all partial-aggregable; the triangle is "
    "quarters^2-sized output regardless of corpus scale.",
)
def orders_cohort_retention_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firstq = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_dt")
    )
    base = o.join(firstq, "o_custkey").select(
        "o_custkey",
        (F.year("first_dt") * 4 + F.quarter("first_dt") - 1).alias("cq"),
        F.year("first_dt").alias("cy"),
        F.quarter("first_dt").alias("cqt"),
        (
            F.year(F.col("o_orderdate").cast("date")) * 4
            + F.quarter(F.col("o_orderdate").cast("date"))
            - 1
        ).alias("oq"),
    ).persist()
    size_ = base.groupBy("cq").agg(
        F.countDistinct("o_custkey").cast("long").alias("cohort_size")
    )
    ret = base.groupBy("cq", (F.col("oq") - F.col("cq")).alias("quarters_since")).agg(
        F.min("cy").alias("cy"),
        F.min("cqt").alias("cqt"),
        F.countDistinct("o_custkey").cast("long").alias("active_customers"),
    )
    out = ret.join(size_, "cq").select(
        F.concat(
            F.col("cy").cast("string"), F.lit("-Q"), F.col("cqt").cast("string")
        ).alias("cohort"),
        F.col("quarters_since").cast("long").alias("quarters_since"),
        "active_customers",
        "cohort_size",
        F.round(
            F.col("active_customers").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


@register(
    "orders_interarrival_hazard_curve",
    """
    WITH gaps AS (
      SELECT date_diff('day',
               CAST(lag(o_orderdate) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ),
    hist AS (
      SELECT gap, CAST(count(*) AS BIGINT) AS deaths
      FROM gaps WHERE gap >= 1 GROUP BY gap
    ),
    cum AS (
      SELECT gap, deaths,
             CAST(sum(deaths) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_d,
             CAST(sum(deaths) OVER () AS BIGINT) AS n
      FROM hist
    )
    SELECT gap AS t_days,
           CAST(n - cum_d + deaths AS BIGINT) AS at_risk,
           deaths,
           round(CAST(deaths AS DOUBLE) / (n - cum_d + deaths), 6) AS hazard,
           round(CAST(n - cum_d AS DOUBLE) / n, 6) AS survival
    FROM cum
    """,
    doc="Nonparametric discrete-time hazard/survival curve of customer "
    "re-order gaps (E260, the life-table estimator): at each observed "
    "gap length t, at-risk = gaps >= t, hazard h(t) = deaths(t)/"
    "at_risk(t), survival S(t) = gaps > t over all gaps — with fully "
    "observed integer gaps the Kaplan-Meier product collapses to this "
    "exact counting form, so every value is one division of integers: "
    "hash-exact, no cumulative float product anywhere. The "
    "nonparametric complement to the parametric Weibull fit (E255): "
    "the Weibull says WHICH law, this says what the data does at "
    "every t. Plan: one lag window + gap-histogram aggregation; the "
    "curve windows run over the days-dimension histogram, never raw "
    "rows.",
)
def orders_interarrival_hazard_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap")
    ).filter(F.col("gap") >= 1)
    hist = gaps.groupBy("gap").agg(F.count("*").cast("long").alias("deaths"))
    w_cum = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "gap",
        "deaths",
        F.sum("deaths").over(w_cum).cast("long").alias("cum_d"),
        F.sum("deaths").over(w_all).cast("long").alias("n"),
    )
    at_risk = F.col("n") - F.col("cum_d") + F.col("deaths")
    return cum.select(
        F.col("gap").alias("t_days"),
        at_risk.cast("long").alias("at_risk"),
        "deaths",
        F.round(F.col("deaths").cast("double") / at_risk, 6).alias("hazard"),
        F.round(
            (F.col("n") - F.col("cum_d")).cast("double") / F.col("n"), 6
        ).alias("survival"),
    )


@register(
    "part_brand_return_odds_ratio",
    """
    WITH j AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    b AS (
      SELECT brand,
             CAST(sum(ret) AS BIGINT) AS a,
             CAST(count(*) - sum(ret) AS BIGINT) AS bb
      FROM j GROUP BY brand
    ),
    t AS (
      SELECT brand, a, bb,
             CAST(sum(a) OVER () - a AS BIGINT) AS c,
             CAST(sum(bb) OVER () - bb AS BIGINT) AS d
      FROM b
    )
    SELECT brand,
           a AS n_return, CAST(a + bb AS BIGINT) AS n_lines,
           round((a + 0.5) * (d + 0.5) / ((bb + 0.5) * (c + 0.5)), 6)
             AS odds_ratio,
           round(ln((a + 0.5) * (d + 0.5) / ((bb + 0.5) * (c + 0.5))), 6)
             AS log_or,
           round(sqrt(1.0 / (a + 0.5) + 1.0 / (bb + 0.5)
                      + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 6) AS se_log,
           round(ln((a + 0.5) * (d + 0.5) / ((bb + 0.5) * (c + 0.5)))
                 - 1.96 * sqrt(1.0 / (a + 0.5) + 1.0 / (bb + 0.5)
                               + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 6)
             AS lo95_log,
           round(ln((a + 0.5) * (d + 0.5) / ((bb + 0.5) * (c + 0.5)))
                 + 1.96 * sqrt(1.0 / (a + 0.5) + 1.0 / (bb + 0.5)
                               + 1.0 / (c + 0.5) + 1.0 / (d + 0.5)), 6)
             AS hi95_log
    FROM t
    """,
    doc="Per-brand return-rate effect size (E261): the 2x2 odds ratio "
    "of (brand vs rest) x (returned vs kept) with the Haldane-Anscombe "
    "+0.5 continuity correction applied to every cell (so zero cells "
    "never divide by zero and the estimate is always defined), plus "
    "the Woolf log-scale standard error and 95% CI. The effect-size "
    "complement to the G-test/FDR entries: those say WHETHER a brand's "
    "return rate differs, this says BY HOW MUCH with uncertainty. "
    "Plan: one fact-side join to the part dim, one brand-grain "
    "aggregate; the margin totals come from a window over the "
    "25-row brand aggregate, never the fact rows.",
)
def part_brand_return_odds_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_returnflag") == "R").cast("int").alias("ret")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("ret").cast("long").alias("a"),
            (F.count("*") - F.sum("ret")).cast("long").alias("bb"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = b.select(
        "brand",
        "a",
        "bb",
        (F.sum("a").over(w_all) - F.col("a")).cast("long").alias("c"),
        (F.sum("bb").over(w_all) - F.col("bb")).cast("long").alias("d"),
    )
    a5 = F.col("a") + 0.5
    b5 = F.col("bb") + 0.5
    c5 = F.col("c") + 0.5
    d5 = F.col("d") + 0.5
    orr = a5 * d5 / (b5 * c5)
    se = F.sqrt(1.0 / a5 + 1.0 / b5 + 1.0 / c5 + 1.0 / d5)
    return t.select(
        "brand",
        F.col("a").alias("n_return"),
        (F.col("a") + F.col("bb")).cast("long").alias("n_lines"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.log(orr), 6).alias("log_or"),
        F.round(se, 6).alias("se_log"),
        F.round(F.log(orr) - 1.96 * se, 6).alias("lo95_log"),
        F.round(F.log(orr) + 1.96 * se, 6).alias("hi95_log"),
    )


@register(
    "orders_price_emd_yearly",
    """
    WITH pr AS (
      SELECT year(o_orderdate) AS yr, o_totalprice AS p FROM orders
    ),
    mm AS (SELECT min(p) AS lo, max(p) AS hi FROM pr),
    binned AS (
      SELECT yr,
             CASE WHEN (SELECT hi FROM mm) = (SELECT lo FROM mm) THEN 0
                  ELSE least(CAST(floor((p - (SELECT lo FROM mm))
                             / (((SELECT hi FROM mm) - (SELECT lo FROM mm))
                                / 50.0)) AS INT), 49)
             END AS bin
      FROM pr
    ),
    grid AS (
      SELECT y.yr, g.bin
      FROM (SELECT DISTINCT yr FROM pr) y,
           (SELECT unnest(range(50)) AS bin) g
    ),
    cnt AS (
      SELECT g.yr, g.bin,
             CAST(count(b.bin) AS BIGINT) AS c
      FROM grid g LEFT JOIN binned b ON b.yr = g.yr AND b.bin = g.bin
      GROUP BY g.yr, g.bin
    ),
    cum AS (
      SELECT yr, bin,
             CAST(sum(c) OVER (PARTITION BY yr ORDER BY bin
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
             CAST(sum(c) OVER (PARTITION BY yr) AS BIGINT) AS n
      FROM cnt
    )
    SELECT a.yr AS year_a, b.yr AS year_b,
           round((((SELECT hi FROM mm) - (SELECT lo FROM mm)) / 50.0)
                 * CAST(sum(abs(a.cc * b.n - b.cc * a.n)) AS DOUBLE)
                 / (a.n * b.n), 6) AS emd
    FROM cum a JOIN cum b ON b.yr = a.yr + 1 AND b.bin = a.bin
    GROUP BY a.yr, b.yr, a.n, b.n
    """,
    doc="Year-over-year distribution drift of order prices as a true "
    "metric (E266): the 1-D earth mover's (Wasserstein-1) distance "
    "between consecutive years' o_totalprice distributions on a shared "
    "50-bin equi-width grid - EMD = bin_width * sum |CDF_a - CDF_b|. "
    "Complements the PSI entry (orders_price_drift_psi): PSI is a "
    "divergence that explodes on empty bins and ignores bin ADJACENCY; "
    "EMD is a metric that weights drift by how FAR the mass moved. "
    "Exactness: the CDF difference is computed cross-multiplied in "
    "BIGINT (|cum_a*n_b - cum_b*n_a|), so the only floats are the "
    "final division and the bin-width scale. Plan: one fact-grain "
    "binning pass (min/max broadcast), then everything is on the "
    "years-x-50-bins dimension grid.",
)
def orders_price_emd_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), F.col("o_totalprice").alias("p")
    )
    mm = o.agg(
        F.min("p").alias("lo"), F.max("p").alias("hi")
    )
    binned = o.crossJoin(F.broadcast(mm)).select(
        "yr",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("p") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 50.0)
                ).cast("int"),
                F.lit(49),
            )
        )
        .alias("bin"),
    )
    years = o.select("yr").distinct()
    bins = spark.range(50).select(F.col("id").cast("int").alias("bin"))
    grid = years.crossJoin(F.broadcast(bins))
    cnt = (
        grid.join(
            binned.groupBy("yr", "bin").agg(F.count("*").alias("c0")),
            ["yr", "bin"],
            "left",
        )
        .select("yr", "bin", F.coalesce("c0", F.lit(0)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("yr")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_n = Window.partitionBy("yr")
    cum = cnt.select(
        "yr",
        "bin",
        F.sum("c").over(w_cum).cast("long").alias("cc"),
        F.sum("c").over(w_n).cast("long").alias("n"),
    )
    a = cum.alias("a")
    b = cum.alias("b")
    pair = a.join(
        b,
        (F.col("b.yr") == F.col("a.yr") + 1) & (F.col("b.bin") == F.col("a.bin")),
    )
    width = mm.select(
        ((F.col("hi") - F.col("lo")) / 50.0).alias("w")
    )
    return (
        pair.groupBy(
            F.col("a.yr").alias("year_a"),
            F.col("b.yr").alias("year_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(
            F.sum(
                F.abs(F.col("a.cc") * F.col("b.n") - F.col("b.cc") * F.col("a.n"))
            ).alias("s")
        )
        .crossJoin(F.broadcast(width))
        .select(
            "year_a",
            "year_b",
            F.round(
                F.col("w") * F.col("s").cast("double") / (F.col("na") * F.col("nb")),
                6,
            ).alias("emd"),
        )
    )


@register(
    "orders_monthly_mann_kendall",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT row_number() OVER (ORDER BY mo) AS i, rev FROM m
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
    ties AS (
      SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_adj
      FROM (SELECT count(*) AS t FROM idx GROUP BY rev HAVING count(*) > 1)
    )
    SELECT n.n AS n_months,
           s.s_stat,
           round((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_adj) / 18.0, 6)
             AS var_s,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                        / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                                - ties.tie_adj) / 18.0)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                        / sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                                - ties.tie_adj) / 18.0)
                      ELSE 0.0 END, 6) AS z_score,
           CASE WHEN s.s_stat > 0 AND abs((s.s_stat - 1)
                  / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_adj)
                         / 18.0)) > 1.96 THEN 'increasing'
                WHEN s.s_stat < 0 AND abs((s.s_stat + 1)
                  / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_adj)
                         / 18.0)) > 1.96 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM s, n, ties
    """,
    doc="Mann-Kendall nonparametric trend TEST on monthly revenue "
    "(E267): S = sum of sign(rev_j - rev_i) over all i<j month pairs, "
    "variance with the exact tie correction, continuity-corrected "
    "z-score and the 5% two-sided verdict. The significance complement "
    "to the Theil-Sen slope estimator (events_theilsen_trend): that "
    "entry says how steep, this says whether a monotone trend exists "
    "at all, with no distributional assumption. Monthly revenue sums "
    "in integer cents so the sign comparisons are exact. Plan: the "
    "pair join runs over the ~84-row month aggregate (dimension-sized "
    "triangle), never order rows.",
)
def orders_monthly_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = o.groupBy("mo").agg(F.sum("cents").cast("long").alias("rev"))
    idx = m.select(
        F.row_number().over(Window.orderBy("mo")).alias("i"), "rev"
    )
    a = idx.alias("a")
    b = idx.alias("b")
    s = a.join(b, F.col("b.i") > F.col("a.i")).agg(
        F.sum(
            F.when(F.col("b.rev") > F.col("a.rev"), 1)
            .when(F.col("b.rev") < F.col("a.rev"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    n = idx.agg(F.count("*").cast("long").alias("n"))
    ties = (
        idx.groupBy("rev")
        .agg(F.count("*").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_adj")
        )
    )
    row = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_adj")
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return row.select(
        F.col("n").alias("n_months"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
        F.when((F.col("s_stat") > 0) & (F.abs(z) > 1.96), "increasing")
        .when((F.col("s_stat") < 0) & (F.abs(z) > 1.96), "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


@register(
    "part_croston_demand_forecast",
    """
    WITH d AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
             sum(l_quantity) AS z
      FROM lineitem GROUP BY 1, 2
    ),
    seq AS (
      SELECT l_partkey, day, z,
             row_number() OVER (PARTITION BY l_partkey ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS n,
             date_diff('day',
                       lag(day) OVER (PARTITION BY l_partkey ORDER BY day),
                       day) AS gap
      FROM d
    ),
    terms AS (
      SELECT l_partkey, rn, n,
             CASE WHEN rn = 1 THEN pow(0.8, n - 1) * z
                  ELSE 0.2 * pow(0.8, n - rn) * z END AS zterm,
             CASE WHEN rn = 1 THEN NULL
                  WHEN rn = 2 THEN pow(0.8, n - 2) * gap
                  ELSE 0.2 * pow(0.8, n - rn) * gap END AS pterm
      FROM seq
    ),
    cum AS (
      SELECT l_partkey, rn, n,
             sum(zterm) OVER (PARTITION BY l_partkey ORDER BY rn
                              ROWS UNBOUNDED PRECEDING) AS z_hat,
             sum(pterm) OVER (PARTITION BY l_partkey ORDER BY rn
                              ROWS UNBOUNDED PRECEDING) AS p_hat
      FROM terms
    )
    SELECT l_partkey AS p_partkey, CAST(n AS BIGINT) AS n_demands,
           round(z_hat, 6) AS z_hat, round(p_hat, 6) AS p_hat,
           round(z_hat / p_hat, 6) AS croston_forecast
    FROM cum WHERE rn = n AND n >= 3
    """,
    doc="Croston's intermittent-demand forecast per part (E263): "
    "demand sizes (quantity per ship day) and inter-demand intervals "
    "are smoothed SEPARATELY with simple exponential smoothing "
    "(alpha=0.2, s_1 = first observation), and the demand-rate "
    "forecast is z_hat/p_hat -- the standard method for sparse/lumpy "
    "demand where plain SES chases zeros (Croston 1972). Complements "
    "the Holt-Winters/EWMA entries (dense series) and the "
    "slow-mover/XYZ classification entries (which FLAG lumpy parts; "
    "this forecasts them). The SES recursions are evaluated in closed "
    "form as ordered cumulative weighted sums (one window each), so "
    "both engines add the same terms in the same order: "
    "deterministic. Plan: one (part, day) aggregate, two windows over "
    "it, no joins; partitions by part key at any scale.",
)
def part_croston_demand_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.to_date("l_shipdate").alias("day"), "l_quantity"
    )
    d = li.groupBy("l_partkey", "day").agg(F.sum("l_quantity").alias("z"))
    w = Window.partitionBy("l_partkey").orderBy("day")
    w_all = Window.partitionBy("l_partkey")
    seq = d.select(
        "l_partkey",
        "z",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_all).alias("n"),
        F.datediff("day", F.lag("day").over(w)).alias("gap"),
    )
    zterm = F.when(
        F.col("rn") == 1, F.pow(0.8, F.col("n") - 1) * F.col("z")
    ).otherwise(0.2 * F.pow(0.8, F.col("n") - F.col("rn")) * F.col("z"))
    pterm = (
        F.when(F.col("rn") == 1, F.lit(None).cast("double"))
        .when(F.col("rn") == 2, F.pow(0.8, F.col("n") - 2) * F.col("gap"))
        .otherwise(0.2 * F.pow(0.8, F.col("n") - F.col("rn")) * F.col("gap"))
    )
    terms = seq.select(
        "l_partkey",
        "rn",
        "n",
        zterm.alias("zterm"),
        pterm.alias("pterm"),
    )
    w_cum = Window.partitionBy("l_partkey").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = terms.select(
        "l_partkey",
        "rn",
        "n",
        F.sum("zterm").over(w_cum).alias("z_hat"),
        F.sum("pterm").over(w_cum).alias("p_hat"),
    )
    return cum.filter((F.col("rn") == F.col("n")) & (F.col("n") >= 3)).select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("n").cast("long").alias("n_demands"),
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("croston_forecast"),
    )


@register(
    "nation_forecast_reconciliation",
    """
    WITH fact AS (
      SELECT n.n_name, date_trunc('month', o.o_orderdate) AS mo,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    m AS (
      SELECT mo, CAST(sum(cents) AS BIGINT) AS rev FROM fact GROUP BY mo
    ),
    idx AS (
      SELECT mo, rev, row_number() OVER (ORDER BY mo) AS i FROM m
    ),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(i) AS BIGINT) AS sx,
             CAST(sum(i * i) AS BIGINT) AS sxx,
             CAST(sum(rev) AS BIGINT) AS sy,
             CAST(sum(i * rev) AS BIGINT) AS sxy
      FROM idx
    ),
    coefs AS (
      SELECT n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               AS slope,
             (CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * sx)
               / n AS intercept
      FROM ols
    ),
    trail AS (
      SELECT f.n_name, CAST(sum(f.cents) AS BIGINT) AS rev12
      FROM fact f JOIN idx ON idx.mo = f.mo, ols
      WHERE idx.i > ols.n - 12
      GROUP BY f.n_name
    ),
    shares AS (
      SELECT n_name, rev12,
             CAST(sum(rev12) OVER () AS BIGINT) AS tot12
      FROM trail
    ),
    h AS (SELECT unnest(range(1, 4)) AS horizon)
    SELECT s.n_name, CAST(h.horizon AS BIGINT) AS horizon,
           CAST(c.n + h.horizon AS BIGINT) AS month_idx,
           round(CAST(s.rev12 AS DOUBLE) / s.tot12, 6) AS share,
           round((c.intercept + c.slope * (c.n + h.horizon)) / 100.0, 6)
             AS total_forecast,
           round((CAST(s.rev12 AS DOUBLE) / s.tot12)
                 * (c.intercept + c.slope * (c.n + h.horizon)) / 100.0, 6)
             AS nation_forecast
    FROM shares s, coefs c, h
    """,
    doc="Top-down hierarchical forecast reconciliation (E271): fit an "
    "OLS trend to TOTAL monthly revenue (exact integer-cent sums, so "
    "slope/intercept are ratios of exact BIGINTs), forecast 3 months "
    "ahead, then disaggregate to nations by their trailing-12-month "
    "revenue shares -- the classic 'forecast the stable top, allocate "
    "to the noisy bottom' pattern, and by construction the nation "
    "forecasts sum exactly to the total (coherence, which "
    "independently-fitted per-nation models never give). Complements "
    "forecast_revenue_delta / events_hourly_forecast (single-series) "
    "with the hierarchy dimension. Plan: one fact-grain join+month "
    "aggregate; OLS, shares, and horizons all live on month/nation "
    "dimension rows.",
)
def nation_forecast_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    fact = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    m = fact.groupBy("mo").agg(F.sum("cents").cast("long").alias("rev"))
    idx = m.select(
        "mo", "rev", F.row_number().over(Window.orderBy("mo")).alias("i")
    )
    ols = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("i").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum("rev").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("rev")).cast("long").alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    coefs = ols.select(
        "n",
        slope.alias("slope"),
        ((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
    )
    trail = (
        fact.join(F.broadcast(idx.select("mo", "i")), "mo")
        .crossJoin(F.broadcast(coefs.select(F.col("n").alias("nm"))))
        .filter(F.col("i") > F.col("nm") - 12)
        .groupBy("n_name")
        .agg(F.sum("cents").cast("long").alias("rev12"))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shares = trail.select(
        "n_name",
        "rev12",
        F.sum("rev12").over(w_all).cast("long").alias("tot12"),
    )
    h = spark.range(1, 4).select(F.col("id").cast("long").alias("horizon"))
    share = F.col("rev12").cast("double") / F.col("tot12")
    total_fc = (
        F.col("intercept") + F.col("slope") * (F.col("n") + F.col("horizon"))
    ) / 100.0
    return (
        shares.crossJoin(F.broadcast(coefs))
        .crossJoin(F.broadcast(h))
        .select(
            "n_name",
            "horizon",
            (F.col("n") + F.col("horizon")).cast("long").alias("month_idx"),
            F.round(share, 6).alias("share"),
            F.round(total_fc, 6).alias("total_forecast"),
            F.round(share * total_fc, 6).alias("nation_forecast"),
        )
    )


@register(
    "orders_little_law_wip",
    """
    WITH spans AS (
      SELECT * FROM (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS start_day,
               CAST(max(l.l_shipdate) AS DATE) AS end_day
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
      ) WHERE end_day >= start_day
    ),
    arr AS (
      SELECT date_trunc('month', start_day) AS mo,
             CAST(count(*) AS BIGINT) AS arrivals,
             CAST(sum(date_diff('day', start_day, end_day)) AS BIGINT)
               AS sum_days
      FROM spans GROUP BY 1
    ),
    wip AS (
      SELECT CAST(mm AS DATE) AS mo_d, CAST(count(*) AS BIGINT) AS wip_direct
      FROM spans,
           unnest(range(date_trunc('month', start_day),
                        date_trunc('month', end_day),
                        INTERVAL 1 MONTH)) AS t(mm)
      GROUP BY mm
    )
    SELECT strftime(CAST(a.mo AS DATE), '%Y-%m') AS month,
           a.arrivals,
           round(CAST(a.sum_days AS DOUBLE) / a.arrivals, 6) AS mean_days,
           COALESCE(w.wip_direct, 0) AS wip_direct,
           round((CAST(a.arrivals AS DOUBLE)
                  / date_diff('day', CAST(a.mo AS DATE),
                              CAST(a.mo + INTERVAL 1 MONTH AS DATE)))
                 * (CAST(a.sum_days AS DOUBLE) / a.arrivals), 6)
             AS wip_littles,
           CASE WHEN COALESCE(w.wip_direct, 0) = 0 THEN NULL
                ELSE round(((CAST(a.arrivals AS DOUBLE)
                             / date_diff('day', CAST(a.mo AS DATE),
                                         CAST(a.mo + INTERVAL 1 MONTH
                                              AS DATE)))
                            * (CAST(a.sum_days AS DOUBLE) / a.arrivals))
                           / w.wip_direct, 6)
           END AS littles_ratio
    FROM arr a LEFT JOIN wip w ON w.mo_d = CAST(a.mo AS DATE)
    """,
    doc="Little's-law consistency audit of order fulfillment (E272): "
    "per month, the queueing-theory WIP estimate L = lambda * W "
    "(arrival rate per day x mean days from order to last shipment) "
    "against the DIRECTLY counted work-in-progress (orders placed on "
    "or before each month's end whose last line ships after it, via "
    "a bounded month-span explode per order -- never a fact x months "
    "cross join). Their ratio is the sanity gauge: ~1 where the "
    "system is stationary, drifting where backlog builds or drains "
    "-- the standard ops-analytics cross-check that a latency metric "
    "and a backlog metric tell one story. Complements "
    "order_fulfillment_latency (W alone) and orders_backlog_curve "
    "(L alone) by joining them through lambda. Restricted to orders "
    "whose last shipment is on/after the order date (the synthetic "
    "generator draws the two dates independently; ~21% are reversed "
    "and have no queueing interpretation). Plan: one order-grain "
    "max-shipdate aggregate, a <=duration-months explode, month-grain "
    "rollups.",
)
def orders_little_law_wip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_day")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_day")
    )
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "start_day")
        .agg(F.max("ship_day").alias("end_day"))
        .filter(F.col("end_day") >= F.col("start_day"))
    )
    arr = spans.groupBy(
        F.date_trunc("month", "start_day").cast("date").alias("month")
    ).agg(
        F.count("*").cast("long").alias("arrivals"),
        F.sum(F.datediff("end_day", "start_day")).cast("long").alias(
            "sum_days"
        ),
    )
    wip = (
        spans.select(
            F.explode(
                F.when(
                    F.date_trunc("month", "end_day")
                    > F.date_trunc("month", "start_day"),
                    F.sequence(
                        F.date_trunc("month", "start_day").cast("date"),
                        F.add_months(
                            F.date_trunc("month", "end_day").cast("date"), -1
                        ),
                        F.expr("INTERVAL 1 MONTH"),
                    ),
                ).otherwise(F.array().cast("array<date>"))
            ).alias("month")
        )
        .groupBy("month")
        .agg(F.count("*").cast("long").alias("wip_direct"))
    )
    joined = arr.join(wip, "month", "left").select(
        "month",
        "arrivals",
        "sum_days",
        F.coalesce("wip_direct", F.lit(0)).cast("long").alias("wip_direct"),
    )
    days_in_month = F.datediff(
        F.add_months(F.col("month"), 1), F.col("month")
    )
    mean_days = F.col("sum_days").cast("double") / F.col("arrivals")
    littles = (
        F.col("arrivals").cast("double") / days_in_month
    ) * mean_days
    return joined.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        "arrivals",
        F.round(mean_days, 6).alias("mean_days"),
        "wip_direct",
        F.round(littles, 6).alias("wip_littles"),
        F.when(F.col("wip_direct") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(littles / F.col("wip_direct"), 6))
        .alias("littles_ratio"),
    )


@register(
    "orders_theil_u_forecast",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT rev, row_number() OVER (ORDER BY mo) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM m
    ),
    train AS (SELECT * FROM idx WHERE i <= n - 12),
    ols AS (
      SELECT CAST(count(*) AS BIGINT) AS tn,
             CAST(sum(i) AS BIGINT) AS sx,
             CAST(sum(i * i) AS BIGINT) AS sxx,
             CAST(sum(rev) AS BIGINT) AS sy,
             CAST(sum(i * rev) AS BIGINT) AS sxy
      FROM train
    ),
    coefs AS (
      SELECT tn,
             (tn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (tn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               AS slope,
             (CAST(sy AS DOUBLE)
              - (tn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (tn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                * sx) / tn AS icpt
      FROM ols
    ),
    holdout AS (
      SELECT h.i, h.rev,
             lagv.rev AS naive,
             c.icpt + c.slope * h.i AS ols_fc
      FROM idx h
      JOIN idx lagv ON lagv.i = h.i - 1
      CROSS JOIN coefs c
      WHERE h.i > h.n - 12
    )
    SELECT CAST(count(*) AS BIGINT) AS n_holdout,
           round(sqrt(avg((ols_fc - rev) * (ols_fc - rev))) / 100.0, 6)
             AS rmse_ols,
           round(sqrt(avg((CAST(naive AS DOUBLE) - rev)
                          * (CAST(naive AS DOUBLE) - rev))) / 100.0, 6)
             AS rmse_naive,
           round(sqrt(avg((ols_fc - rev) * (ols_fc - rev)))
                 / sqrt(avg((CAST(naive AS DOUBLE) - rev)
                            * (CAST(naive AS DOUBLE) - rev))), 6)
             AS theil_u2
    FROM holdout
    """,
    doc="Theil's U2 forecast-skill score on monthly revenue (E275): "
    "fit the OLS trend on all but the last 12 months (the same "
    "exact-integer-cent closed form as the reconciliation entry), "
    "walk the 12-month holdout, and compare its RMSE to the "
    "last-value naive forecast -- U2 < 1 means the model beats "
    "persistence, the one-number gate for whether trend forecasting "
    "is defensible on this series at all. The monthly-revenue sibling "
    "of events_forecast_backtest (hourly, seasonal-naive) closing the "
    "skill-score gap for the orders-side forecast entries. All "
    "moments are exact BIGINT sums; the 12-row holdout averages run "
    "in one dimension-sized aggregate. Plan: one month aggregate + "
    "month-dimension self-join, no fact-grain work after the rollup.",
)
def orders_theil_u_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = o.groupBy("mo").agg(F.sum("cents").cast("long").alias("rev"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = m.select(
        "rev",
        F.row_number().over(Window.orderBy("mo")).alias("i"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    train = idx.filter(F.col("i") <= F.col("n") - 12)
    ols = train.agg(
        F.count("*").cast("long").alias("tn"),
        F.sum("i").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.sum("rev").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("rev")).cast("long").alias("sxy"),
    )
    slope = (
        F.col("tn") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("tn") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    coefs = ols.select(
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("tn")
        ).alias("icpt"),
    )
    h = idx.alias("h")
    lagv = idx.select(
        F.col("i").alias("li"), F.col("rev").alias("naive")
    )
    holdout = (
        h.filter(F.col("i") > F.col("n") - 12)
        .join(lagv, F.col("li") == F.col("i") - 1)
        .crossJoin(F.broadcast(coefs))
        .select(
            "rev",
            "naive",
            (F.col("icpt") + F.col("slope") * F.col("i")).alias("ols_fc"),
        )
    )
    e_ols = (F.col("ols_fc") - F.col("rev")) * (F.col("ols_fc") - F.col("rev"))
    e_nv = (F.col("naive").cast("double") - F.col("rev")) * (
        F.col("naive").cast("double") - F.col("rev")
    )
    return holdout.agg(
        F.count("*").cast("long").alias("n_holdout"),
        F.round(F.sqrt(F.avg(e_ols)) / 100.0, 6).alias("rmse_ols"),
        F.round(F.sqrt(F.avg(e_nv)) / 100.0, 6).alias("rmse_naive"),
        F.round(F.sqrt(F.avg(e_ols)) / F.sqrt(F.avg(e_nv)), 6).alias(
            "theil_u2"
        ),
    )


@register(
    "supplier_revenue_lorenz",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS x
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x, l_suppkey) AS r,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(x) OVER () AS BIGINT) AS tot,
             CAST(sum(x) OVER (ORDER BY x, l_suppkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM rev
    ),
    deciles AS (
      SELECT CAST(ceil(r * 10.0 / n) AS BIGINT) AS decile,
             max(r) AS top_r, max(cum) AS cum_rev,
             max(n) AS n, max(tot) AS tot
      FROM ranked GROUP BY 1
    )
    SELECT decile,
           CAST(top_r AS BIGINT) AS suppliers_cum,
           round(CAST(top_r AS DOUBLE) / n, 6) AS pop_share_cum,
           round(CAST(cum_rev AS DOUBLE) / tot, 6) AS rev_share_cum,
           round(CAST(top_r AS DOUBLE) / n
                 - CAST(cum_rev AS DOUBLE) / tot, 6) AS lorenz_gap
    FROM deciles
    """,
    doc="Lorenz curve of supplier revenue concentration in deciles "
    "(E276): suppliers ranked ascending by exact integer-cent revenue "
    "(supplier-key tie-break), cumulative population share vs "
    "cumulative revenue share at each decile boundary, plus the "
    "Lorenz gap (whose integral is the Gini). The drill-down the "
    "scalar entries can't give: nation_revenue_gini and "
    "nation_supplier_hhi say HOW concentrated, this says WHERE on "
    "the distribution the concentration lives ('the bottom 50% of "
    "suppliers carry 31% of revenue'). Windows run over the "
    "supplier-dimension aggregate (never lineitem grain); at 100 TB "
    "the global rank would switch to the repo's standard two-level "
    "prefix-sum form (customer_snm_pairs' pattern).",
)
def supplier_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("cents").cast("long").alias("x"))
    w_rank = Window.orderBy("x", "l_suppkey")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "x",
        F.row_number().over(w_rank).alias("r"),
        F.count("*").over(w_all).cast("long").alias("n"),
        F.sum("x").over(w_all).cast("long").alias("tot"),
        F.sum("x")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    deciles = ranked.groupBy(
        F.ceil(F.col("r") * 10.0 / F.col("n")).cast("long").alias("decile")
    ).agg(
        F.max("r").alias("top_r"),
        F.max("cum").alias("cum_rev"),
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
    )
    return deciles.select(
        "decile",
        F.col("top_r").cast("long").alias("suppliers_cum"),
        F.round(F.col("top_r").cast("double") / F.col("n"), 6).alias(
            "pop_share_cum"
        ),
        F.round(F.col("cum_rev").cast("double") / F.col("tot"), 6).alias(
            "rev_share_cum"
        ),
        F.round(
            F.col("top_r").cast("double") / F.col("n")
            - F.col("cum_rev").cast("double") / F.col("tot"),
            6,
        ).alias("lorenz_gap"),
    )


@register(
    "orders_daily_ar2_yulewalker",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*)::BIGINT AS x
      FROM orders GROUP BY 1
    ),
    s AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
    tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx FROM s),
    y AS (SELECT t, (tot.n * x - tot.sx)::BIGINT AS y, x FROM s, tot),
    s0 AS (SELECT sum(y * y)::BIGINT AS v FROM y),
    s1 AS (SELECT sum(a.y * b.y)::BIGINT AS v FROM y a JOIN y b ON b.t = a.t - 1),
    s2 AS (SELECT sum(a.y * b.y)::BIGINT AS v FROM y a JOIN y b ON b.t = a.t - 2),
    phi AS (
      SELECT round(CAST(s1.v AS DOUBLE)
                   * (CAST(s0.v AS DOUBLE) - CAST(s2.v AS DOUBLE))
                   / (CAST(s0.v AS DOUBLE) * s0.v
                      - CAST(s1.v AS DOUBLE) * s1.v), 6) AS phi1,
             round((CAST(s0.v AS DOUBLE) * s2.v
                    - CAST(s1.v AS DOUBLE) * s1.v)
                   / (CAST(s0.v AS DOUBLE) * s0.v
                      - CAST(s1.v AS DOUBLE) * s1.v), 6) AS phi2
      FROM s0, s1, s2
    ),
    fc AS (
      SELECT c.x AS xt, a.x AS x1, b.x AS x2,
             tot.sx::DOUBLE / tot.n AS m, phi.phi1, phi.phi2
      FROM y c JOIN y a ON a.t = c.t - 1 JOIN y b ON b.t = c.t - 2, tot, phi
    ),
    err AS (
      SELECT
        sum(CAST(round((xt - (m + phi1 * (x1 - m) + phi2 * (x2 - m)))
                       * 1000) AS BIGINT)
            * CAST(round((xt - (m + phi1 * (x1 - m) + phi2 * (x2 - m)))
                         * 1000) AS BIGINT))::BIGINT AS se_ar,
        sum((xt - x1) * (xt - x1))::BIGINT AS se_naive,
        count(*)::BIGINT AS nf
      FROM fc
    )
    SELECT tot.n AS n_days, phi.phi1, phi.phi2,
           round(sqrt(CAST(err.se_ar AS DOUBLE) / err.nf) / 1000, 4)
             AS rmse_ar2,
           round(sqrt(CAST(err.se_naive AS DOUBLE) / err.nf), 4)
             AS rmse_naive,
           round(1 - (sqrt(CAST(err.se_ar AS DOUBLE) / err.nf) / 1000)
                   / sqrt(CAST(err.se_naive AS DOUBLE) / err.nf), 4) AS skill
    FROM tot, phi, err
    """,
    doc="AR(2) fit on the daily order-count series via Yule-Walker — "
    "the parametric member of the serial-structure family (Ljung-Box "
    "detects whether structure exists, PACF-order-2 here MODELS it): "
    "phi1/phi2 from lag-0/1/2 autocovariances, then in-sample one-step "
    "RMSE against the last-value naive and the skill ratio. "
    "Determinism is total: the series is centered in INTEGER space "
    "(y_t = n*x_t - sum(x), exact BIGINT), the three S_k products are "
    "exact integer sums whose n^3 normalizers cancel inside the "
    "phi ratios, and forecast residuals square in milli-unit integers "
    "— every float is a fixed-expression function of exact ints. "
    "Plan: one day-grain aggregate, three tiny self-joins on the "
    "days dimension, 1-row output.",
)
def orders_daily_ar2_yulewalker(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    s = d.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    )
    tot = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    y = s.crossJoin(F.broadcast(tot)).select(
        "t", "x", (F.col("n") * F.col("x") - F.col("sx")).alias("y")
    )
    ya = y.select(F.col("t").alias("ta"), F.col("y").alias("yda"), F.col("x").alias("xa"))
    s0 = y.agg(F.sum(F.col("y") * F.col("y")).cast("long").alias("v0"))
    s1 = (
        y.join(ya, y["t"] - 1 == ya["ta"])
        .agg(F.sum(F.col("y") * F.col("yda")).cast("long").alias("v1"))
    )
    s2 = (
        y.join(ya, y["t"] - 2 == ya["ta"])
        .agg(F.sum(F.col("y") * F.col("yda")).cast("long").alias("v2"))
    )
    phi = (
        s0.crossJoin(s1)
        .crossJoin(s2)
        .select(
            F.expr(
                "round(CAST(v1 AS DOUBLE) * (CAST(v0 AS DOUBLE)"
                " - CAST(v2 AS DOUBLE)) / (CAST(v0 AS DOUBLE) * v0"
                " - CAST(v1 AS DOUBLE) * v1), 6)"
            ).alias("phi1"),
            F.expr(
                "round((CAST(v0 AS DOUBLE) * v2 - CAST(v1 AS DOUBLE) * v1)"
                " / (CAST(v0 AS DOUBLE) * v0 - CAST(v1 AS DOUBLE) * v1), 6)"
            ).alias("phi2"),
        )
    )
    yb = y.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    fc = (
        y.join(ya, y["t"] - 1 == ya["ta"])
        .join(yb, y["t"] - 2 == yb["tb"])
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(phi))
        .select(
            F.col("x").alias("xt"),
            F.col("xa").alias("x1"),
            F.col("xb").alias("x2"),
            F.expr("CAST(sx AS DOUBLE) / n").alias("m"),
            "phi1",
            "phi2",
        )
    )
    err = fc.agg(
        F.sum(
            F.expr(
                "CAST(round((xt - (m + phi1 * (x1 - m) + phi2 * (x2 - m)))"
                " * 1000) AS BIGINT)"
                " * CAST(round((xt - (m + phi1 * (x1 - m) + phi2 * (x2 - m)))"
                " * 1000) AS BIGINT)"
            )
        ).cast("long").alias("se_ar"),
        F.sum((F.col("xt") - F.col("x1")) * (F.col("xt") - F.col("x1")))
        .cast("long")
        .alias("se_naive"),
        F.count("*").cast("long").alias("nf"),
    )
    return (
        tot.crossJoin(phi)
        .crossJoin(err)
        .select(
            F.col("n").alias("n_days"),
            "phi1",
            "phi2",
            F.expr(
                "round(sqrt(CAST(se_ar AS DOUBLE) / nf) / 1000, 4)"
            ).alias("rmse_ar2"),
            F.expr("round(sqrt(CAST(se_naive AS DOUBLE) / nf), 4)").alias(
                "rmse_naive"
            ),
            F.expr(
                "round(1 - (sqrt(CAST(se_ar AS DOUBLE) / nf) / 1000)"
                " / sqrt(CAST(se_naive AS DOUBLE) / nf), 4)"
            ).alias("skill"),
        )
    )


@register(
    "orders_daily_hurst_rs",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             (sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100)::BIGINT
               AS x
      FROM orders GROUP BY 1
    ),
    s AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
    ws AS (SELECT unnest([16, 32, 64, 128]) AS w),
    blk AS (
      SELECT ws.w, ((s.t - 1) // ws.w)::BIGINT AS b,
             ((s.t - 1) % ws.w)::BIGINT + 1 AS j, s.x
      FROM s, ws
      WHERE s.t <= ((SELECT count(*) FROM s) // ws.w) * ws.w
    ),
    bs AS (
      SELECT w, b, sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
      FROM blk GROUP BY 1, 2
    ),
    cum AS (
      SELECT w, b, j, sum(x) OVER (
        PARTITION BY w, b ORDER BY j ROWS UNBOUNDED PRECEDING)::BIGINT AS cx
      FROM blk
    ),
    dev AS (
      SELECT c.w, c.b, (c.w * c.cx - c.j * bs.sx)::BIGINT AS y
      FROM cum c JOIN bs ON bs.w = c.w AND bs.b = c.b
    ),
    rr AS (
      SELECT w, b, (max(y) - min(y))::BIGINT AS r_scaled FROM dev GROUP BY 1, 2
    ),
    rs AS (
      SELECT rr.w, rr.b,
             (CAST(rr.r_scaled AS DOUBLE) / rr.w)
             / sqrt((CAST(bs.sxx AS DOUBLE)
                     - CAST(bs.sx AS DOUBLE) * bs.sx / rr.w) / rr.w) AS ratio
      FROM rr JOIN bs ON bs.w = rr.w AND bs.b = rr.b
    ),
    mrs AS (
      SELECT w, count(*)::BIGINT AS n_blocks,
             round(sum(CAST(round(ratio * 1000000) AS BIGINT))::DOUBLE
                   / count(*) / 1000000, 6) AS mean_rs
      FROM rs GROUP BY w
    ),
    pts AS (SELECT ln(CAST(w AS DOUBLE)) AS lx, ln(mean_rs) AS ly FROM mrs),
    ols AS (
      SELECT round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
                   / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4)
        AS hurst
      FROM pts
    )
    SELECT mrs.w, mrs.n_blocks, mrs.mean_rs, ols.hurst FROM mrs, ols
    """,
    doc="Hurst exponent via classical rescaled-range (R/S) analysis on "
    "daily revenue: non-overlapping blocks at 4 window sizes, per-"
    "block range of INTEGER-scaled cumulative deviations (y = w*cum - "
    "j*sum, exact BIGINT — the mean never floats) over the population "
    "std, micro-unit block means, then the log-log OLS slope = H. "
    "H~0.5 = memoryless, >0.5 = persistent trends, <0.5 = mean-"
    "reverting — the long-memory diagnostic behind choosing AR-family "
    "models (the AR(2) entry) vs differencing. Everything aggregates "
    "on the days dimension: one day-grain pass, block-grain windows, "
    "4-point driver-sized regression.",
)
def orders_daily_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV 100"
            " AS BIGINT)"
        ).alias("x")
    )
    s = d.select("x", F.row_number().over(Window.orderBy("day")).alias("t"))
    n1 = s.agg(F.count("*").cast("long").alias("n_days"))
    ws = spark.createDataFrame([(16,), (32,), (64,), (128,)], "w INT")
    blk = (
        s.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(ws))
        .filter(F.col("t") <= F.expr("(n_days DIV w) * w"))
        .select(
            "w",
            F.expr("CAST((t - 1) DIV w AS BIGINT)").alias("b"),
            F.expr("CAST((t - 1) % w AS BIGINT) + 1").alias("j"),
            "x",
        )
    )
    bs = blk.groupBy("w", "b").agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    wcum = Window.partitionBy("w", "b").orderBy("j").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = blk.select(
        "w", "b", "j", F.sum("x").over(wcum).cast("long").alias("cx")
    )
    dev = cum.join(bs, ["w", "b"]).select(
        "w",
        "b",
        (F.col("w").cast("long") * F.col("cx") - F.col("j") * F.col("sx"))
        .cast("long")
        .alias("y"),
    )
    rr = dev.groupBy("w", "b").agg(
        (F.max("y") - F.min("y")).cast("long").alias("r_scaled")
    )
    rs = rr.join(bs, ["w", "b"]).select(
        "w",
        "b",
        F.expr(
            "(CAST(r_scaled AS DOUBLE) / w)"
            " / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / w) / w)"
        ).alias("ratio"),
    )
    mrs = rs.groupBy("w").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.expr(
            "round(CAST(sum(CAST(round(ratio * 1000000) AS BIGINT)) AS DOUBLE)"
            " / count(*) / 1000000, 6)"
        ).alias("mean_rs"),
    )
    pts = mrs.select(
        F.expr("ln(CAST(w AS DOUBLE))").alias("lx"),
        F.expr("ln(mean_rs)").alias("ly"),
    )
    ols = pts.agg(
        F.expr(
            "round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))"
            " / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4)"
        ).alias("hurst")
    )
    return mrs.crossJoin(F.broadcast(ols)).select(
        F.col("w").cast("int").alias("w"), "n_blocks", "mean_rs", "hurst"
    )


@register(
    "orders_daily_permutation_entropy",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*)::BIGINT AS x
      FROM orders GROUP BY 1
    ),
    s AS (SELECT x, row_number() OVER (ORDER BY day) AS t FROM d),
    tri AS (
      SELECT a.x AS x1, b.x AS x2, c.x AS x3
      FROM s a JOIN s b ON b.t = a.t + 1 JOIN s c ON c.t = a.t + 2
    ),
    pat AS (
      SELECT CASE
        WHEN x1 <= x2 AND x2 <= x3 THEN '012'
        WHEN x1 <= x3 AND x3 < x2  THEN '021'
        WHEN x2 < x1  AND x1 <= x3 THEN '102'
        WHEN x3 < x1  AND x1 <= x2 THEN '120'
        WHEN x2 <= x3 AND x3 < x1  THEN '201'
        ELSE '210' END AS pattern
      FROM tri
    ),
    cnt AS (SELECT pattern, count(*)::BIGINT AS c FROM pat GROUP BY 1),
    nn AS (SELECT sum(c)::BIGINT AS n FROM cnt),
    terms AS (
      SELECT pattern, c,
             CAST(round(-(CAST(c AS DOUBLE) / nn.n)
                        * ln(CAST(c AS DOUBLE) / nn.n) * 1000000) AS BIGINT)
               AS term_micro
      FROM cnt, nn
    ),
    h AS (
      SELECT round(sum(term_micro)::DOUBLE / 1000000 / ln(6.0), 6) AS h_norm
      FROM terms
    )
    SELECT t.pattern, t.c AS n_triples,
           round(CAST(t.c AS DOUBLE) / nn.n, 6) AS p, h.h_norm
    FROM terms t, nn, h
    """,
    doc="Permutation entropy (Bandt & Pompe, order 3) of the daily "
    "order-count series: every consecutive triple classifies into one "
    "of 6 ordinal patterns by pure integer comparisons (ties broken "
    "toward the earlier day — a stable argsort, stated in the shared "
    "CASE), and the normalized Shannon entropy of the pattern "
    "histogram reads out dynamical complexity: 1.0 = pattern-random, "
    "low = deterministic motifs. Complements the magnitude-based "
    "tests (runs/Ljung-Box/Mann-Kendall) with an ORDINAL one that is "
    "outlier-immune. Integer micro-nat entropy terms; two tiny "
    "t-shifted self-joins on the days dimension.",
)
def orders_daily_permutation_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    s = d.select("x", F.row_number().over(Window.orderBy("day")).alias("t"))
    sa = s.select(F.col("t").alias("ta"), F.col("x").alias("x1"))
    sb = s.select(F.col("t").alias("tb"), F.col("x").alias("x2"))
    sc_ = s.select(F.col("t").alias("tc"), F.col("x").alias("x3"))
    tri = sa.join(sb, sb["tb"] == sa["ta"] + 1).join(
        sc_, sc_["tc"] == sa["ta"] + 2
    )
    pat = tri.select(
        F.expr(
            "CASE"
            " WHEN x1 <= x2 AND x2 <= x3 THEN '012'"
            " WHEN x1 <= x3 AND x3 < x2  THEN '021'"
            " WHEN x2 < x1  AND x1 <= x3 THEN '102'"
            " WHEN x3 < x1  AND x1 <= x2 THEN '120'"
            " WHEN x2 <= x3 AND x3 < x1  THEN '201'"
            " ELSE '210' END"
        ).alias("pattern")
    )
    cnt = pat.groupBy("pattern").agg(F.count("*").cast("long").alias("c"))
    nn = cnt.agg(F.sum("c").cast("long").alias("n"))
    terms = cnt.crossJoin(F.broadcast(nn)).select(
        "pattern",
        "c",
        "n",
        F.expr(
            "CAST(round(-(CAST(c AS DOUBLE) / n)"
            " * ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT)"
        ).alias("term_micro"),
    )
    h = terms.agg(
        F.expr(
            "round(CAST(sum(term_micro) AS DOUBLE) / 1000000 / ln(6.0), 6)"
        ).alias("h_norm")
    )
    return terms.crossJoin(F.broadcast(h)).select(
        "pattern",
        F.col("c").alias("n_triples"),
        F.expr("round(CAST(c AS DOUBLE) / n, 6)").alias("p"),
        "h_norm",
    )


@register(
    "orders_its_segmented_regression",
    """
    WITH daily AS (
      SELECT date_diff('day', TIMESTAMP '1998-01-01',
                       date_trunc('day', o_orderdate)) AS x,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
      FROM orders GROUP BY 1
    ),
    seg AS (
      SELECT CASE WHEN x < 0 THEN 0 ELSE 1 END AS post,
             count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx
      FROM daily GROUP BY 1
    ),
    fit AS (
      SELECT post, n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               AS slope,
             (CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                * sx) / n AS level_t0
      FROM seg
    ),
    pre AS (SELECT n, slope, level_t0 FROM fit WHERE post = 0),
    pst AS (SELECT n, slope, level_t0 FROM fit WHERE post = 1)
    SELECT pre.n AS n_days_pre, pst.n AS n_days_post,
           round(pre.slope / 100, 4) AS slope_pre,
           round(pst.slope / 100, 4) AS slope_post,
           round((pst.slope - pre.slope) / 100, 4) AS slope_change,
           round(pre.level_t0 / 100, 2) AS level_pre_t0,
           round(pst.level_t0 / 100, 2) AS level_post_t0,
           round((pst.level_t0 - pre.level_t0) / 100, 2) AS level_jump
    FROM pre CROSS JOIN pst
    """,
    doc="Interrupted time-series / segmented regression on daily order "
    "revenue around a 1998-01-01 cutover: independent OLS lines on "
    "the pre and post segments (x = days since cutover, so the "
    "intercepts ARE the segment levels AT the cutover), reporting "
    "the level jump and slope change — the standard "
    "policy/deploy-impact readout, and the causal-inference "
    "companion to lineitem_discount_did (which compares groups; "
    "this compares regimes over time). Both fits come from five "
    "exact integer sufficient statistics per segment (revenue in "
    "cents, HUGEINT/decimal cross products), combined in one "
    "double expression tree — bit-identical cross-engine. Scale "
    "shape: one day-grain aggregate over orders with map-side "
    "combine, then a 2-row rollup; the daily frame is "
    "time-dimension-sized, so cost at 100 TB is the single scan.",
)
def orders_its_segmented_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = o.groupBy(
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))),
            F.lit("1998-01-01").cast("date"),
        ).alias("x")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    seg = daily.groupBy(
        F.when(F.col("x") < 0, 0).otherwise(1).alias("post")
    ).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * F.col("sx"))
    level = (F.col("sy").cast("double") - slope * F.col("sx")) / n
    fit = seg.select("post", "n", slope.alias("slope"), level.alias("level_t0"))
    pre = fit.filter(F.col("post") == 0).select(
        F.col("n").alias("n_days_pre"),
        F.col("slope").alias("slope_p"),
        F.col("level_t0").alias("level_p"),
    )
    pst = fit.filter(F.col("post") == 1).select(
        F.col("n").alias("n_days_post"),
        F.col("slope").alias("slope_q"),
        F.col("level_t0").alias("level_q"),
    )
    return pre.crossJoin(pst).select(
        "n_days_pre",
        "n_days_post",
        F.round(F.col("slope_p") / 100, 4).alias("slope_pre"),
        F.round(F.col("slope_q") / 100, 4).alias("slope_post"),
        F.round((F.col("slope_q") - F.col("slope_p")) / 100, 4).alias(
            "slope_change"
        ),
        F.round(F.col("level_p") / 100, 2).alias("level_pre_t0"),
        F.round(F.col("level_q") / 100, 2).alias("level_post_t0"),
        F.round((F.col("level_q") - F.col("level_p")) / 100, 2).alias(
            "level_jump"
        ),
    )


@register(
    "nation_trade_gravity_ols",
    """
    WITH flows AS (
      SELECT n1.n_name AS i, n2.n_name AS j,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT))::BIGINT AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      JOIN orders   o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN nation  n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation  n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name <> n2.n_name
      GROUP BY 1, 2
    ),
    mo AS (SELECT i, sum(cents)::BIGINT AS m_out FROM flows GROUP BY i),
    mi AS (SELECT j, sum(cents)::BIGINT AS m_in FROM flows GROUP BY j),
    obs AS (
      SELECT ln(CAST(f.cents AS DOUBLE)) AS y,
             ln(CAST(mo.m_out AS DOUBLE)) AS x1,
             ln(CAST(mi.m_in AS DOUBLE)) AS x2
      FROM flows f JOIN mo ON mo.i = f.i JOIN mi ON mi.j = f.j
      WHERE f.cents > 0
    ),
    s AS (
      SELECT
        sum(CAST(round(1.0 * 1000000) AS BIGINT)) AS s00,
        sum(CAST(round(x1 * 1000000) AS BIGINT)) AS sx1,
        sum(CAST(round(x2 * 1000000) AS BIGINT)) AS sx2,
        sum(CAST(round(x1 * x1 * 1000000) AS BIGINT)) AS sx11,
        sum(CAST(round(x1 * x2 * 1000000) AS BIGINT)) AS sx12,
        sum(CAST(round(x2 * x2 * 1000000) AS BIGINT)) AS sx22,
        sum(CAST(round(y * 1000000) AS BIGINT)) AS sy,
        sum(CAST(round(x1 * y * 1000000) AS BIGINT)) AS sx1y,
        sum(CAST(round(x2 * y * 1000000) AS BIGINT)) AS sx2y,
        sum(CAST(round(y * y * 1000000) AS BIGINT)) AS syy,
        count(*)::BIGINT AS n
      FROM obs
    ),
    t AS (
      SELECT n,
        CAST(s00 AS DOUBLE) / 1000000 AS a,
        CAST(sx1 AS DOUBLE) / 1000000 AS b,
        CAST(sx2 AS DOUBLE) / 1000000 AS c,
        CAST(sx11 AS DOUBLE) / 1000000 AS d,
        CAST(sx12 AS DOUBLE) / 1000000 AS e,
        CAST(sx22 AS DOUBLE) / 1000000 AS f,
        CAST(sy AS DOUBLE) / 1000000 AS g0,
        CAST(sx1y AS DOUBLE) / 1000000 AS g1,
        CAST(sx2y AS DOUBLE) / 1000000 AS g2,
        CAST(syy AS DOUBLE) / 1000000 AS tyy
      FROM s
    ),
    fit AS (
      SELECT n, g0 AS ty, g1 AS tx1y, g2 AS tx2y, tyy, a,
        a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
          AS det,
        round(((d * f - e * e) * g0 + (c * e - b * f) * g1
               + (b * e - c * d) * g2) / det, 9) AS b0,
        round(((c * e - b * f) * g0 + (a * f - c * c) * g1
               + (c * b - a * e) * g2) / det, 9) AS b1,
        round(((b * e - c * d) * g0 + (c * b - a * e) * g1
               + (a * d - b * b) * g2) / det, 9) AS b2
      FROM t
    )
    SELECT n AS n_pairs,
           round(b0, 6) AS beta0,
           round(b1, 6) AS beta_out,
           round(b2, 6) AS beta_in,
           round(1.0 - (tyy - (b0 * ty + b1 * tx1y + b2 * tx2y))
                 / (tyy - ty * ty / a), 6) AS r2
    FROM fit
    """,
    doc="Gravity model of inter-nation trade (the classic empirical "
    "trade-economics regression, public since Tinbergen 1962): "
    "ln(flow i->j) ~ beta0 + beta_out ln(exports of i) + beta_in "
    "ln(imports of j), fit by OLS over the ~600 directed nation "
    "pairs. Per-pair log observations come from exact integer cent "
    "flows; the ten OLS sufficient statistics freeze to integer "
    "micro-units (order-independent sums), and the 3x3 normal-"
    "equation solve reuses the closed-form adjugate recipe of the "
    "IRLS classifier entry, with R^2 evaluated AT the 9-rounded "
    "coefficients so both engines compute the identical expression. "
    "Scale shape: the only data-sized work is the Q7-style "
    "fact-table join + nation-pair aggregate (one orderkey "
    "shuffle, nation dims broadcast); everything after runs on a "
    "nation^2-sized frame.",
)
def nation_trade_gravity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("i")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("j")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    flows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("nk1"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("nk2"))
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(cents).cast("long").alias("cents"))
        .persist()
    )
    mo = flows.groupBy("i").agg(F.sum("cents").cast("long").alias("m_out"))
    mi = flows.groupBy("j").agg(F.sum("cents").cast("long").alias("m_in"))
    obs = (
        flows.join(F.broadcast(mo), "i")
        .join(F.broadcast(mi), "j")
        .filter(F.col("cents") > 0)
        .select(
            F.log(F.col("cents").cast("double")).alias("y"),
            F.log(F.col("m_out").cast("double")).alias("x1"),
            F.log(F.col("m_in").cast("double")).alias("x2"),
        )
    )

    def _micro(col):
        return F.sum(F.round(col * 1000000).cast("long"))

    y, x1, x2 = F.col("y"), F.col("x1"), F.col("x2")
    row = obs.agg(
        _micro(F.lit(1.0)).alias("s00"),
        _micro(x1).alias("sx1"),
        _micro(x2).alias("sx2"),
        _micro(x1 * x1).alias("sx11"),
        _micro(x1 * x2).alias("sx12"),
        _micro(x2 * x2).alias("sx22"),
        _micro(y).alias("sy"),
        _micro(x1 * y).alias("sx1y"),
        _micro(x2 * y).alias("sx2y"),
        _micro(y * y).alias("syy"),
        F.count("*").alias("n"),
    ).first()
    flows.unpersist()
    a = float(row["s00"]) / 1000000
    b = float(row["sx1"]) / 1000000
    c = float(row["sx2"]) / 1000000
    d = float(row["sx11"]) / 1000000
    e = float(row["sx12"]) / 1000000
    f = float(row["sx22"]) / 1000000
    g0 = float(row["sy"]) / 1000000
    g1 = float(row["sx1y"]) / 1000000
    g2 = float(row["sx2y"]) / 1000000
    tyy = float(row["syy"]) / 1000000
    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    b0 = round(
        ((d * f - e * e) * g0 + (c * e - b * f) * g1 + (b * e - c * d) * g2)
        / det,
        9,
    )
    b1 = round(
        ((c * e - b * f) * g0 + (a * f - c * c) * g1 + (c * b - a * e) * g2)
        / det,
        9,
    )
    b2 = round(
        ((b * e - c * d) * g0 + (c * b - a * e) * g1 + (a * d - b * b) * g2)
        / det,
        9,
    )
    r2 = round(
        1.0 - (tyy - (b0 * g0 + b1 * g1 + b2 * g2)) / (tyy - g0 * g0 / a), 6
    )
    out = [
        (
            int(row["n"]),
            round(b0, 6),
            round(b1, 6),
            round(b2, 6),
            r2,
        )
    ]
    return spark.createDataFrame(
        out,
        "n_pairs BIGINT, beta0 DOUBLE, beta_out DOUBLE, beta_in DOUBLE, "
        "r2 DOUBLE",
    )


@register(
    "part_newsvendor_stock",
    """
    WITH daily AS (
      SELECT p.p_brand AS brand,
             date_trunc('day', l.l_shipdate) AS d,
             CAST(sum(l.l_quantity) AS BIGINT) AS demand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT brand, demand,
             row_number() OVER (
               PARTITION BY brand ORDER BY demand ASC, d ASC
             ) AS rn,
             count(*) OVER (PARTITION BY brand) AS n
      FROM daily
    )
    SELECT brand, max(n)::BIGINT AS n_days,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                    THEN demand END)::BIGINT AS median_daily_demand,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                    THEN demand END)::BIGINT AS stock_level_cf75
    FROM ranked GROUP BY brand ORDER BY brand
    """,
    doc="Newsvendor stock levels per brand (the classic single-period "
    "inventory model, public OR textbook material): with underage "
    "cost 3x overage cost the optimal order-up-to level is the "
    "critical fractile F^-1(cu/(cu+co)) = F^-1(0.75) of daily "
    "demand — here the exact type-1 order statistic (ceil(0.75 n)) "
    "of the brand's daily shipped-quantity distribution, alongside "
    "the median for reference. Demands are exact integer sums, the "
    "quantile is an order-statistic SELECTION (no interpolated "
    "float quantile), so the report is bit-identical cross-engine. "
    "Scale shape: one (brand, day)-grain aggregate with map-side "
    "combine; the per-brand window sorts day-grain frames (bounded "
    "by calendar x 25 brands, not data volume).",
)
def part_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("day", F.col("l_shipdate")).alias("d"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("demand"))
    )
    w = Window.partitionBy("brand").orderBy(
        F.col("demand").asc(), F.col("d").asc()
    )
    wc = Window.partitionBy("brand")
    ranked = daily.select(
        "brand",
        "demand",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return (
        ranked.groupBy("brand")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("demand"),
                )
            )
            .cast("long")
            .alias("median_daily_demand"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"),
                    F.col("demand"),
                )
            )
            .cast("long")
            .alias("stock_level_cf75"),
        )
        .orderBy("brand")
    )


@register(
    "orders_panel_fe_regression",
    """
    WITH seq AS (
      SELECT o_custkey AS cust,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
             ) AS x,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    g AS (
      SELECT cust, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::HUGEINT AS sxy, sum(x * x)::BIGINT AS sxx
      FROM seq GROUP BY cust
    ),
    within AS (
      SELECT
        sum(CAST(round((CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sy / n) * 1000) AS BIGINT))
          AS d1_milli,
        sum(CAST(round((CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx / n) * 1000) AS BIGINT))
          AS d2_milli,
        count(*)::BIGINT AS n_customers,
        sum(n)::BIGINT AS n_orders
      FROM g WHERE n >= 2
    ),
    pooled AS (
      SELECT count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx
      FROM seq
    )
    SELECT w.n_customers, w.n_orders,
           round(CAST(w.d1_milli AS DOUBLE) / w.d2_milli / 100, 4)
             AS fe_slope_per_order,
           round((p.n * CAST(p.sxy AS DOUBLE) - CAST(p.sx AS DOUBLE) * p.sy)
                 / (p.n * CAST(p.sxx AS DOUBLE) - CAST(p.sx AS DOUBLE) * p.sx)
                 / 100, 4) AS pooled_slope_per_order
    FROM within w CROSS JOIN pooled p
    """,
    doc="Panel fixed-effects (within) regression of order value on the "
    "customer's order sequence number — 'do customers spend more as "
    "they mature?' with customer-level heterogeneity absorbed: the "
    "within estimator sums per-customer demeaned cross products "
    "Sxy - SxSy/n over customers with >= 2 orders, each group "
    "contribution frozen to integer milli-units so the two totals "
    "are exact order-independent sums; the pooled OLS slope from "
    "global exact sufficient statistics sits beside it, and the "
    "gap between the two IS the customer-heterogeneity bias the FE "
    "design removes (textbook econometrics, public). Scale shape: "
    "one per-customer window for the sequence index (customer-"
    "keyed, bounded partitions), one customer-grain aggregate, one "
    "global aggregate — no data-sized join anywhere.",
)
def orders_panel_fe_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    seq = o.select(
        "cust",
        F.row_number()
        .over(
            Window.partitionBy("cust").orderBy("o_orderdate", "o_orderkey")
        )
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    ).persist()
    g = seq.groupBy("cust").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d1 = F.round(
        (
            F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy") / F.col("n")
        )
        * 1000
    ).cast("long")
    d2 = F.round(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n")
        )
        * 1000
    ).cast("long")
    within = g.filter(F.col("n") >= 2).agg(
        F.sum(d1).alias("d1_milli"),
        F.sum(d2).alias("d2_milli"),
        F.count("*").cast("long").alias("n_customers"),
        F.sum("n").cast("long").alias("n_orders"),
    )
    pooled = seq.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
    )
    out = within.crossJoin(F.broadcast(pooled)).select(
        "n_customers",
        "n_orders",
        F.round(
            F.col("d1_milli").cast("double") / F.col("d2_milli") / 100, 4
        ).alias("fe_slope_per_order"),
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            / 100,
            4,
        ).alias("pooled_slope_per_order"),
    )
    rows = out.collect()
    seq.unpersist()
    return spark.createDataFrame(rows, out.schema)


@register(
    "part_eoq_policy",
    """
    WITH d AS (
      SELECT p.p_brand AS brand,
             CAST(sum(l.l_quantity) AS BIGINT) AS demand_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    h AS (
      SELECT p_brand AS brand,
             sum(CAST(round(p_retailprice * 100) AS BIGINT))::BIGINT
               AS price_cents,
             count(*)::BIGINT AS n_parts
      FROM part GROUP BY 1
    )
    SELECT d.brand, d.demand_qty,
           round(CAST(h.price_cents AS DOUBLE) / h.n_parts / 100, 2)
             AS avg_unit_price,
           round(sqrt(2.0 * d.demand_qty * 100.0
                      / (0.2 * (CAST(h.price_cents AS DOUBLE)
                                / h.n_parts / 100))), 2) AS eoq_units,
           round(d.demand_qty
                 / sqrt(2.0 * d.demand_qty * 100.0
                        / (0.2 * (CAST(h.price_cents AS DOUBLE)
                                  / h.n_parts / 100))), 2)
             AS orders_per_period
    FROM d JOIN h ON h.brand = d.brand
    ORDER BY d.brand
    """,
    doc="Economic order quantity policy per brand (the classic Wilson "
    "EOQ formula, public OR textbook): EOQ = sqrt(2DS/H) with "
    "demand D = total shipped quantity (exact integer), fixed order "
    "cost S = $100, and holding cost H = 20% of the brand's average "
    "unit retail price (a single division of exact integer cents) — "
    "plus the implied order frequency D/EOQ. The restock-sizing "
    "companion to part_newsvendor_stock's service-level quantile "
    "(EOQ prices the ORDERING cadence, the newsvendor fractile the "
    "buffer). One fact-side aggregate with a broadcast part dim and "
    "one part-dim aggregate; identical sqrt/divide trees on both "
    "engines, rounded on output.",
)
def part_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    d = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum("l_quantity").cast("long").alias("demand_qty"))
    )
    h = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.round(F.col("p_retailprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents"),
        F.count("*").cast("long").alias("n_parts"),
    )
    unit_price = F.col("price_cents").cast("double") / F.col("n_parts") / 100
    eoq = F.sqrt(
        2.0 * F.col("demand_qty") * 100.0 / (0.2 * unit_price)
    )
    return (
        d.join(F.broadcast(h), "brand")
        .select(
            "brand",
            "demand_qty",
            F.round(unit_price, 2).alias("avg_unit_price"),
            F.round(eoq, 2).alias("eoq_units"),
            F.round(F.col("demand_qty") / eoq, 2).alias("orders_per_period"),
        )
        .orderBy("brand")
    )
