"""Edit-distance (fuzzy) matching via deletion-neighborhood blocking.

Entity resolution over short strings — titles, names, product codes,
normalized URLs — needs ALL pairs within Levenshtein distance d, and
the naive definition is a cross join. The FastSS observation (Bocek et
al. 2007, "Fast Similarity Search in Large Dictionaries") turns it
into an equi-join: if ``ed(a, b) <= d`` then deleting at most ``d``
characters from each can produce the SAME string, so the candidate set
``{(a, b) : D_d(a) ∩ D_d(b) ≠ ∅}`` is a superset of the true result —
generate each string's deletion variants, equi-join on the variant,
verify survivors with the exact ``levenshtein`` (a JVM built-in both
here and in the oracle engine).

Exactness: no true pair is missed (the deletion-variant intersection
is a NECESSARY condition for ed <= d); false candidates are removed by
the verify step. The DuckDB oracle for the contract query is the
brute-force definition itself — a cross join + levenshtein filter —
so the correctness gate checks the blocking claim, not just the
arithmetic.

Scale shape: |D_d(s)| is 1 + L + C(L,2)·[d=2] variants per string —
for the short strings this targets (L ≤ ~40, d ≤ 2) a bounded
constant. One (variant)-keyed shuffle generates candidates, one
(pair)-keyed dedup bounds re-verification; verification is codegen.
The cross join never happens at any corpus size. Long strings do not
belong here (variants explode, and edit distance on documents is the
wrong tool — use MinHash/SimHash in operators/dedup.py).

Reference: none (no string-similarity surface); training-data-pipeline
superset (near-duplicate titles/URLs, label joining).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column | str, max_dist: int = 1) -> Column:
    """Array of all strings obtainable from ``col`` by deleting at most
    ``max_dist`` characters (the string itself included), distinct.
    Pure HOF expressions. NULL input → NULL."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    s = F.col(col) if isinstance(col, str) else col

    def dels(x):
        # all single-character deletions of x (empty array for '')
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(x), F.lit(1))),
            lambda i: F.concat(
                x.substr(F.lit(1), i - 1),
                x.substr(i + 1, F.greatest(F.length(x) - i, F.lit(0))),
            ),
        )

    d1 = F.when(F.length(s) > 0, dels(s)).otherwise(F.array().cast("array<string>"))
    out = F.array_union(F.array(s), d1)
    if max_dist == 2:
        d2 = F.flatten(
            F.transform(
                d1, lambda v: F.when(F.length(v) > 0, dels(v)).otherwise(
                    F.array().cast("array<string>")
                )
            )
        )
        out = F.array_union(out, d2)
    return F.when(s.isNotNull(), F.array_distinct(out))


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """All distinct pairs ``(id_a < id_b)`` whose ``col`` values are
    within Levenshtein distance ``max_dist`` — exact, without a cross
    join. Returns ``(id_a, id_b, dist)``. NULL strings never match."""
    base = df.select(F.col(id_col).alias("_id"), F.col(col).alias("_s")).where(
        F.col("_s").isNotNull()
    )
    variants = base.select(
        "_id", "_s", F.explode(deletion_variants(F.col("_s"), max_dist)).alias("_v")
    )
    a = variants.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_v"
    )
    b = variants.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_v"
    )
    cand = (
        a.join(b, "_v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_sa", "_sb").cast("long"))
        .where(F.col("dist") <= int(max_dist))
        .select("id_a", "id_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 1,
    *,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """Join two relations on fuzzy string equality (``ed <= max_dist``)
    — same blocking, across relations. Returns ``(left_id, right_id,
    dist)`` with the ids aliased ``id_l`` / ``id_r``."""
    lv = left.select(
        F.col(left_id).alias("id_l"), F.col(col).alias("_sl")
    ).where(F.col("_sl").isNotNull()).select(
        "id_l", "_sl",
        F.explode(deletion_variants(F.col("_sl"), max_dist)).alias("_v"),
    )
    rv = right.select(
        F.col(right_id).alias("id_r"), F.col(col).alias("_sr")
    ).where(F.col("_sr").isNotNull()).select(
        "id_r", "_sr",
        F.explode(deletion_variants(F.col("_sr"), max_dist)).alias("_v"),
    )
    cand = lv.join(rv, "_v").select("id_l", "id_r", "_sl", "_sr").distinct()
    return (
        cand.withColumn("dist", F.levenshtein("_sl", "_sr").cast("long"))
        .where(F.col("dist") <= int(max_dist))
        .select("id_l", "id_r", "dist")
    )
