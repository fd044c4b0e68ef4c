"""Space-filling-curve data layout: Morton (Z-order) keys and
block-skipping manifests.

At 100 TB the scan you avoid is worth more than the scan you speed
up: engines prune parquet row-groups / files whose min-max column
stats can't satisfy the predicate, and HOW rows are laid out across
those blocks decides how many survive pruning. A single-column sort
gives perfect pruning on that column and none on any other;
interleaving the bits of several quantized columns (Morton order —
the curve behind Delta Lake's ``OPTIMIZE ZORDER BY``, Iceberg's
``sort_order(zorder(...))`` and ClickHouse's ``mortonEncode``) bounds
the min-max box of every key-range block in EVERY interleaved
dimension at once, so multi-dimensional predicates skip most blocks
under one physical order.

Everything here is exact integer arithmetic — equi-width bucket
quantization and bit interleaving — so a DuckDB oracle can restate
the whole layout hash-exactly; there are no windows anywhere (block
ids are key PREFIXES, not row_number ranges, exactly like range
partitioning on the z-key at cluster scale).

Reference: no counterpart in the reference repo (its engine delegates
layout to Snowflake micro-partitions); this is the Spark-first
storage-layout mandate of SURVEY §2.15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize_long(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """See :func:`quantize`; returns a long bucket in ``[0, 2**bits)``.

    Implemented as ``(col - lo) * 2^bits div (hi - lo + 1)`` with the
    ``div`` spelled ``(n - n % d) / d`` so every step stays integer
    (inputs are non-negative, both engines' ``%`` agree there)."""
    n = (col - lo) * F.lit(1 << bits)
    d = hi - lo + F.lit(1)
    return ((n - (n % d)) / d).cast("long")


def zorder_key(qx: Column, qy: Column, bits: int = 8) -> Column:
    """Morton-interleave two ``bits``-bit bucket ranks into one
    ``2*bits``-bit Z-key: bit i of ``qx`` lands at position 2i+1, bit
    i of ``qy`` at 2i. Pure shifts/masks — hash-exact cross-engine."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + (F.shiftright(qx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
            + (F.shiftright(qy, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        )
    return z.cast("long")


def zorder_key_sql(qx: str, qy: str, bits: int = 8) -> str:
    """The DuckDB restatement of :func:`zorder_key` (same bit algebra,
    ``>>``/``&`` operators), for oracle CTEs."""
    terms = []
    for i in range(bits):
        terms.append(f"(({qx} >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({qy} >> {i}) & 1) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"
