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
    if max_dist == 1:
        out = F.array_union(F.array(s), d1)
        return F.when(s.isNotNull(), F.array_distinct(out))
    # max_dist == 2: pin d1 as an HOF lambda variable — captured
    # naively inside the second-level transform, the whole first-level
    # deletion build re-runs for every d1 element (O(len³) character
    # work instead of O(len²))
    def with_d1(dd):
        d2 = F.flatten(
            F.transform(
                dd, lambda v: F.when(F.length(v) > 0, dels(v)).otherwise(
                    F.array().cast("array<string>")
                )
            )
        )
        return F.array_union(F.array_union(F.array(s), dd), d2)

    out = F.transform(F.array(d1), with_d1)[0]
    return F.when(s.isNotNull(), F.array_distinct(out))


def fuzzy_string_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of DISTINCT string values within Levenshtein distance
    ``max_dist`` — ``(s_a < s_b, dist)``, so ``dist >= 1``. This is the
    workhorse: candidate generation runs over the distinct-value
    relation, so duplicated strings (the common case in real corpora —
    shared titles, boilerplate prefixes) cost ONE row each instead of
    forming quadratic hot groups in the variant join. Output is
    bounded by the data's actual near-match structure."""
    strings = (
        df.select(F.col(col).alias("_s")).where(F.col("_s").isNotNull()).distinct()
    )
    variants = strings.select(
        "_s", F.explode(deletion_variants(F.col("_s"), max_dist)).alias("_v")
    )
    a = variants.select(F.col("_s").alias("s_a"), "_v")
    b = variants.select(F.col("_s").alias("s_b"), "_v")
    cand = (
        a.join(b, "_v")
        .where(F.col("s_a") < F.col("s_b"))
        .select("s_a", "s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b").cast("long"))
        .where(F.col("dist") <= int(max_dist))
    )


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """All distinct id pairs ``(id_a < id_b)`` whose ``col`` values are
    within Levenshtein distance ``max_dist`` — exact, without a cross
    join. Returns ``(id_a, id_b, dist)``. NULL strings never match.

    Candidate generation runs on DISTINCT strings (``fuzzy_string_
    pairs``), then expands back to ids: cross-string pairs join each
    side's id group; same-string pairs (dist 0) are the per-string
    ``m·(m-1)/2`` id combinations. That expansion is the TRUE answer's
    size — a corpus where one title repeats m times genuinely has m²/2
    matching pairs — so callers on heavy-duplicate corpora usually
    want ``fuzzy_string_pairs`` (bounded) or an exact-dedup pass
    first; this form is for when the id pairs themselves are the
    deliverable."""
    base = df.select(F.col(id_col).alias("_id"), F.col(col).alias("_s")).where(
        F.col("_s").isNotNull()
    )
    sp = fuzzy_string_pairs(base, "_s", max_dist)
    la = base.select(F.col("_id").alias("_ida"), F.col("_s").alias("s_a"))
    lb = base.select(F.col("_id").alias("_idb"), F.col("_s").alias("s_b"))
    cross = (
        sp.join(la, "s_a")
        .join(lb, "s_b")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "dist",
        )
    )
    r = base.select(F.col("_id").alias("_id2"), F.col("_s"))
    same = (
        base.join(r, "_s")
        .where(F.col("_id") < F.col("_id2"))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id2").alias("id_b"),
            F.lit(0).cast("long").alias("dist"),
        )
    )
    return same.unionByName(cross)


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
    — same distinct-first blocking, across relations. Returns
    ``(id_l, id_r, dist)``. As with ``fuzzy_pairs``, the variant join
    runs on each side's DISTINCT strings; expansion to id pairs is the
    true output size."""
    lbase = left.select(
        F.col(left_id).alias("id_l"), F.col(col).alias("_sl")
    ).where(F.col("_sl").isNotNull())
    rbase = right.select(
        F.col(right_id).alias("id_r"), F.col(col).alias("_sr")
    ).where(F.col("_sr").isNotNull())
    lv = lbase.select("_sl").distinct().select(
        "_sl", F.explode(deletion_variants(F.col("_sl"), max_dist)).alias("_v")
    )
    rv = rbase.select("_sr").distinct().select(
        "_sr", F.explode(deletion_variants(F.col("_sr"), max_dist)).alias("_v")
    )
    spairs = (
        lv.join(rv, "_v")
        .select("_sl", "_sr")
        .distinct()
        .withColumn("dist", F.levenshtein("_sl", "_sr").cast("long"))
        .where(F.col("dist") <= int(max_dist))
    )
    return (
        spairs.join(lbase, "_sl").join(rbase, "_sr").select("id_l", "id_r", "dist")
    )
