"""Entity resolution: fuzzy string matching at scale.

The reference has no fuzzy matching (its joins are strict equi-joins,
SURVEY.md §2.3); this is the Spark-native extension for the classic
"same entity, slightly different string" problem — customer names,
product titles, OCR'd identifiers.

The scale design is the FastSS / deletion-neighborhood trick: for an
edit-distance-1 candidate set you never compare all n² pairs — each
string explodes into L position-masked variants ("Cust_mer#042"), and
two strings within one substitution of each other MUST share the
variant masked at their differing position. Candidate generation is an
inverted-index equi-join on the variant (one shuffle, |input|×L rows);
exact ``levenshtein`` runs on candidates only. Same inverted-index
shape as the n-gram Jaccard and TF-IDF joins in operators/dedup.py —
never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def masked_variants(df: DataFrame, name_col: str, id_col: str) -> DataFrame:
    """Explode each string into its position-masked variants:
    ``(id, name, pos, variant)`` where ``variant`` is ``name`` with
    character ``pos`` replaced by ``_``. Narrow map-only explode
    (output = input × string length); equal variants imply equal
    lengths and an equal masked position, so the variant alone is the
    blocking key."""
    # two-step select: aliasing the input to "name" and referencing it
    # inside the explode lambda in ONE select creates a lateral column
    # alias reference, which Generate cannot carry (Spark internal
    # error when the input column is itself called "name")
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    name = F.col("name")
    variants = F.transform(
        F.sequence(F.lit(1), F.length(name)),
        lambda p: F.concat(
            name.substr(F.lit(1), p - 1),
            F.lit("_"),
            name.substr(p + 1, F.length(name) - p),
        ),
    )
    return base.select(
        "id",
        "name",
        F.posexplode(variants).alias("pos", "variant"),
    )


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str = "c_name",
    id_col: str = "c_custkey",
    max_distance: int = 1,
) -> DataFrame:
    """Every pair of rows whose ``name_col`` values are within
    ``max_distance`` (default 1) substitutions — candidate pairs from
    the shared-masked-variant equi-join, verified with exact
    ``levenshtein`` (JVM built-in on both engines).

    With ``max_distance=1`` on equal-length strings the blocking is
    LOSSLESS: a single substitution always shares exactly one masked
    variant. (Insertions/deletions change length and need the full
    deletion-neighborhood variant set — out of scope here.) Output
    ``(id_a, id_b, name_a, name_b, lev)``.
    """
    v = masked_variants(df, name_col, id_col)
    a = v.select(
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        "variant",
    )
    b = v.select(
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("variant").alias("variant_b"),
    )
    return (
        a.join(
            b,
            (F.col("variant") == F.col("variant_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
        .withColumn(
            "lev", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("lev") <= max_distance)
    )
