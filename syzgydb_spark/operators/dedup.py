"""Deduplication operators for training-data pipelines.

Extends the reference's surface (it has no dedup; BASELINE.json names
these as first-class north-star operators). Every variant is designed
as a shuffle-on-key plan — no cross products:

* exact           — hash groupBy on a normalized fingerprint
* MinHash + LSH   — shingles → minhash signature → banded bucket join
* SimHash         — 64-bit sign-sum sketch, banded candidate join,
                    hamming verify
* n-gram Jaccard  — inverted-index (posting-list) pair generation
* embedding       — cosine near-dup via the hyperplane LSH index

At 100 TB: all candidate generation is equi-join on computed BIGINT
keys (AQE-skew-safe); verification only touches candidate pairs. The
only driver-side data are constants (hash coefficients, planes).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import fingerprint, word_ngrams, word_tokens
from syzgydb_spark.functions.vector import cosine_distance
from syzgydb_spark.operators.lsh import LshIndex

# MinHash works in a 31-bit space: base hashes and coefficients are
# < 2^31, so a·x + b < 2^62 never overflows int64 (Spark 4 runs ANSI
# mode — overflow would throw, not wrap)
_MERSENNE = (1 << 31) - 1


def _pairs_from_buckets(
    keyed: DataFrame, key_cols: list[str], id_col: str, *, max_bucket: int = 10000
) -> DataFrame:
    """(id, bucket-key) rows → distinct candidate pairs (id_a < id_b).

    One groupBy shuffle of narrow keys; pairs are generated inside each
    bucket with HOF combinations — the upstream (possibly expensive)
    key computation runs exactly once, unlike a self-join which
    evaluates both sides. ``max_bucket`` guards the O(b²) blowup of a
    degenerate hot bucket (those buckets are skipped — callers relying
    on completeness must pick keys with bounded selectivity)."""
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.collect_list(id_col).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pairs_arr = F.flatten(
        F.transform(
            "ids",
            lambda a, i: F.transform(
                F.slice("ids", i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))),
                lambda b: F.struct(
                    F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b")
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Map every doc to its duplicate group: (id, fingerprint,
    group_min_id, group_size). group_min_id == id ⇔ the row is the
    kept representative. One shuffle (groupBy fingerprint)."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("group_min_id"), F.count("*").alias("group_size")
    )
    return fp.join(groups, "fp").select(id_col, "fp", "group_min_id", "group_size")


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-duplicate group."""
    reps = exact_duplicates(df, text_col, id_col).where(
        F.col(id_col) == F.col("group_min_id")
    ).select(id_col)
    return df.join(reps, id_col, "left_semi")


# ---------------------------------------------------------------- MinHash


def _minhash_coeffs(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).tolist()
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).tolist()
    return a, b


def _base_hash(col: Column, hash_fn: str) -> Column:
    """Shingle/token → positive int64. ``xxhash64`` is the fast path;
    ``md5`` derives the value from the first 15 md5 hex digits, which
    DuckDB reproduces exactly (('0x'||substr(md5(x),1,15))::BIGINT) —
    used by the oracle-checked signature queries."""
    if hash_fn == "xxhash64":
        return F.abs(F.xxhash64(col))
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn}")


def minhash_signature(
    text: Column | str,
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> Column:
    """MinHash signature as ARRAY<BIGINT>: word-``shingle_n``-gram
    shingles hashed with xxhash64, then ``num_hashes`` universal hashes
    h_i(x) = (a_i·x + b_i) mod (2^61-1), min over shingles. Pure
    Catalyst HOFs — whole-stage codegen, no Python."""
    shingles = F.array_distinct(word_ngrams(text, shingle_n))
    # single-pass fold: one xxhash per shingle, then 64 (a·h+b) mod p
    # updates via zip_with against a packed coefficient literal —
    # O(|shingles|·num_hashes) total, vs O(num_hashes) *passes* if each
    # hash re-ran its own transform over the (expensive) shingle expr
    a, b = _minhash_coeffs(num_hashes, seed)
    ab = F.array(
        *[
            F.struct(F.lit(int(a[i])).alias("a"), F.lit(int(b[i])).alias("b"))
            for i in range(num_hashes)
        ]
    )
    base = F.transform(shingles, lambda s: _base_hash(s, hash_fn) % _MERSENNE)
    # base, a, b all < 2^31 ⇒ a*h + b < 2^62: safe under ANSI
    init = F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes)
    sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda x, y: F.least(x, (y["a"] * h + y["b"]) % _MERSENNE)
        ),
    )
    return F.when(F.size(shingles) > 0, sig)


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Plan shape: signature project → explode bands (fan-out ×bands) →
    self equi-join on (band_idx, band_hash) → dedup pairs → verify true
    Jaccard on distinct shingle sets. Candidates only — never N².
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        minhash_signature(
            text_col, num_hashes=num_hashes, shingle_n=shingle_n, seed=seed
        ).alias("sig"),
    ).where(F.col("sig").isNotNull())

    # banded keys only — (id, band, band_hash) — so the self-join
    # shuffles 3 narrow columns, never the shingle arrays
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice("sig", i * rows + 1, rows)), i)
                    .alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    cand = _pairs_from_buckets(banded, ["band", "bh"], id_col)

    # attach shingle sets only to surviving candidates for the exact
    # Jaccard verify
    sh = df.select(
        F.col(id_col), F.array_distinct(word_ngrams(text_col, shingle_n)).alias("sh")
    )
    cand = cand.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")

    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- SimHash


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: tokens hashed with xxhash64; for
    each bit position the ±1 votes are summed; sign → bit.

    Plan: explode tokens → single groupBy(id) with ``bits`` conditional
    SUMs (map-side partial aggregation does the heavy lifting) → pack.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_tokens(text_col))).alias("tok")
    ).withColumn("h", _base_hash(F.col("tok"), hash_fn))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    shift_bits = bits - 1 if bits == 64 else bits
    packed = F.lit(0).cast("long")
    for i in range(shift_bits):
        packed = packed.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    if bits == 64:
        # bit 63 would overflow a signed shift under ANSI; fold it in
        # as the sign bit via min-long
        packed = packed.bitwiseOR(
            F.when(F.col("b63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    chunks: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole: the 64-bit sketch splits into ``chunks`` pieces; a pair
    within ``max_hamming`` bit flips must agree on ≥1 chunk **only if**
    ``chunks > max_hamming``, so by default chunks = max_hamming + 1.
    Candidates come from per-chunk equi-joins, verified with
    bit_count(xor). Note the scale trade-off: large max_hamming →
    narrow chunks → more random chunk collisions to verify.
    """
    if chunks is None:
        chunks = max_hamming + 1
    if chunks <= max_hamming:
        raise ValueError("need chunks > max_hamming for the pigeonhole guarantee")
    sh = simhash(df, text_col, id_col)
    width = 64 // chunks
    chunk_specs = []  # (shift, mask_width); last chunk absorbs the remainder
    for c in range(chunks):
        shift = c * width
        w = width if c < chunks - 1 else 64 - shift
        chunk_specs.append((shift, w))

    def _ck(shift: int, w: int):
        col = F.shiftrightunsigned("simhash", shift)
        if shift + w < 64:
            col = col.bitwiseAND(F.lit((1 << w) - 1))
        return col

    parts = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), _ck(*spec).alias("ck"))
                    for c, spec in enumerate(chunk_specs)
                ]
            )
        ).alias("p"),
    ).select(id_col, "simhash", F.col("p.chunk").alias("chunk"), F.col("p.ck").alias("ck"))

    cand = _pairs_from_buckets(parts.select(id_col, "chunk", "ck"), ["chunk", "ck"], id_col)
    cand = cand.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")), "id_a"
    ).join(sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")), "id_b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted index: explode
    distinct shingles → posting lists → pair counts → |A∩B| /
    (|A|+|B|-|A∩B|). ``max_df`` drops shingles appearing in more than
    that many docs (stopword-shingle blowup guard — at corpus scale
    the hottest posting lists dominate the join; log what was cut)."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(word_ngrams(text_col, shingle_n))).alias("sh")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_df is not None:
        keep = sh.groupBy("sh").agg(F.count("*").alias("df")).where(F.col("df") <= max_df)
        sh = sh.join(keep.select("sh"), "sh", "left_semi")
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------ embedding cosine


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    max_distance: float = 0.1,
    dim: int | None = None,
    num_tables: int = 8,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-duplicate pairs via hyperplane-LSH blocking + exact
    verify: angular distance ≤ max_distance. Same candidate-join shape
    as the ANN search — never a full cross product."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    idx = LshIndex(dim, num_tables=num_tables, num_planes=num_planes, seed=seed, method="cosine")
    signed = idx.with_signatures(df.select(id_col, vec_col), vec_col)

    # one narrow (id, table, sig) relation → bucket pair generation:
    # the pandas-UDF signature pass runs once, not once per table side
    keyed = signed.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(c).alias("sig"))
                    for t, c in enumerate(idx.sig_cols())
                ]
            )
        ).alias("k"),
    ).select(id_col, F.col("k.tbl").alias("tbl"), F.col("k.sig").alias("sig"))
    pairs = _pairs_from_buckets(keyed, ["tbl", "sig"], id_col)

    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("distance", cosine_distance("va", "vb"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
