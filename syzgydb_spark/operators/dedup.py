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

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import (
    fingerprint,
    ngrams_from_tokens,
    word_ngrams,
    word_tokens,
)
from syzgydb_spark.functions.vector import cosine_distance_batch
from syzgydb_spark.operators.lsh import LshIndex

# MinHash works in a 31-bit space: base hashes and coefficients are
# < 2^31, so a·x + b < 2^62 never overflows int64 (Spark 4 runs ANSI
# mode — overflow would throw, not wrap)
_MERSENNE = (1 << 31) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input has fewer partitions. Python-kernel stages (the Arrow MinHash
    fold) inherit the scan's partitioning, and a small/single-file
    table reads as 1 partition — serializing the kernel on 1 of N
    cores. At real scale inputs already have ≥ parallelism partitions
    and this is a no-op (one driver-side partition-count probe per
    batch job, not per row). Call it on the NARROW projection so the
    one-off shuffle moves only the columns the kernel needs. The
    partition count comes from the plan's file listing (no RDD
    conversion, no job): in-memory/non-file plans count as small."""
    from syzgydb_spark.session import scan_splits_estimate

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    splits = scan_splits_estimate(df)
    if splits is None or splits < target:
        return df.repartition(target)
    return df


def _pairs_from_buckets(
    keyed: DataFrame,
    key_cols: list[str],
    id_col: str,
    *,
    max_bucket: int = 10000,
    observation: Observation | None = None,
) -> DataFrame:
    """(id, bucket-key) rows → distinct candidate pairs (id_a < id_b).

    One groupBy shuffle of narrow keys; pairs are generated inside each
    bucket with HOF combinations — the upstream (possibly expensive)
    key computation runs exactly once, unlike a self-join which
    evaluates both sides. ``max_bucket`` guards the O(b²) blowup of a
    degenerate hot bucket: oversized buckets are SKIPPED, which bounds
    recall. The skip is never silent — pass an ``Observation`` and after
    the action ``observation.get`` reports ``skipped_buckets``,
    ``largest_skipped_bucket`` and ``candidate_buckets`` (the
    ``df.observe`` analog of the reference's per-search
    ``PercentSearched`` metric, collection.go:700-709)."""
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.collect_list(id_col).alias("ids"))
        .where(F.size("ids") > 1)
    )
    if observation is not None:
        buckets = buckets.observe(
            observation,
            F.coalesce(
                F.sum((F.size("ids") > max_bucket).cast("long")), F.lit(0)
            ).alias("skipped_buckets"),
            F.max(F.when(F.size("ids") > max_bucket, F.size("ids"))).alias(
                "largest_skipped_bucket"
            ),
            F.count(F.lit(1)).alias("candidate_buckets"),
        )
    buckets = buckets.where(F.size("ids") <= max_bucket)
    if observation is not None:
        # AQE's empty-relation propagation erases the CollectMetrics
        # node when every bucket is skipped (empty downstream), losing
        # the metrics; an eager localCheckpoint pins their collection
        # to this job. Only paid when metrics were asked for.
        buckets = buckets.localCheckpoint(eager=True)
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


def dedup_normalized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalization-aware exact dedup: documents equal after
    lowercasing and collapsing every punctuation/whitespace run to one
    space count as the same document ("Hello,  world!" ≡ "hello
    world"); min id per group survives. The step between byte-exact
    dedup (misses trivial reformatting) and MinHash (pays shingling) —
    most large corpus builds run it right after exact dedup.

    Shape identical to ``dedup_exact``: normalization is codegen'd
    into the scan, the group key is the 8-byte md5 fold of the
    normalized text, one (key)-keyed aggregation + a semi join on the
    id. Nothing wider than (id, key) shuffles."""
    from syzgydb_spark.functions.text import normalized_fingerprint64

    fp = df.select(F.col(id_col), normalized_fingerprint64(text_col).alias("nfp"))
    groups = fp.groupBy("nfp").agg(F.min(id_col).alias("group_min_id"))
    reps = fp.join(groups, "nfp").where(F.col(id_col) == F.col("group_min_id")).select(id_col)
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


def _hashed_shingles(text: Column | str, shingle_n: int, hash_fn: str) -> Column:
    """Distinct shingle set as int64 hashes in the 31-bit space — the
    one representation both the signature fold and the Jaccard verify
    consume, so shingling+hashing runs once and candidate joins shuffle
    8-byte longs instead of n-gram strings."""
    return F.array_distinct(
        F.transform(word_ngrams(text, shingle_n), lambda s: _base_hash(s, hash_fn) % _MERSENNE)
    )


def _sig_from_base(base: Column, num_hashes: int, seed: int) -> Column:
    """MinHash fold over pre-hashed shingles; NULL for empty docs."""
    # single-pass fold: 64 (a·h+b) mod p updates via zip_with against a
    # packed coefficient literal — O(|shingles|·num_hashes) total, vs
    # O(num_hashes) *passes* if each hash re-ran its own transform over
    # the (expensive) shingle expr
    a, b = _minhash_coeffs(num_hashes, seed)
    ab = F.array(
        *[
            F.struct(F.lit(int(a[i])).alias("a"), F.lit(int(b[i])).alias("b"))
            for i in range(num_hashes)
        ]
    )
    # base, a, b all < 2^31 ⇒ a*h + b < 2^62: safe under ANSI
    init = F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes)
    sig = F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda x, y: F.least(x, (y["a"] * h + y["b"]) % _MERSENNE)
        ),
    )
    return F.when(F.size(base) > 0, sig)


def _sig_from_base_batch(base: Column, num_hashes: int, seed: int) -> Column:
    """Arrow-batched numpy MinHash fold — bit-identical to
    ``_sig_from_base`` (same coefficients, same 31-bit integer math,
    int64 throughout) but ~10× faster: the expression fold is an
    interpreted HOF allocating a ``num_hashes`` array per shingle,
    while numpy does one (num_hashes × |shingles|) broadcast + min
    per doc. NULL for empty docs, like the expression form."""
    from pyspark.sql.functions import pandas_udf

    a, b = _minhash_coeffs(num_hashes, seed)

    @pandas_udf("array<long>")
    def _sig(hs_series):
        import numpy as np
        import pandas as pd

        A = np.array(a, dtype=np.int64)[:, None]
        B = np.array(b, dtype=np.int64)[:, None]
        M = (1 << 31) - 1
        out = []
        for hs in hs_series:
            if hs is None or len(hs) == 0:
                out.append(None)
                continue
            h = np.asarray(hs, dtype=np.int64)[None, :]
            out.append(((A * h + B) % M).min(axis=1))
        return pd.Series(out)

    return _sig(base)


def _md5_minhash_batch(shingles: Column, num_hashes: int, bands: int, seed: int) -> Column:
    """One Arrow pass from distinct shingle strings to (hashed shingle
    set, band keys): hashlib md5 ≡ Spark ``md5``/``conv`` ≡ DuckDB
    ``md5`` on UTF-8 bytes, so every value is reproduced exactly by
    both the Catalyst expression path and the DuckDB oracle. Exists
    because per-shingle md5+conv inside an interpreted transform()
    lambda measured ~15 µs/shingle — the whole md5 pipeline belongs in
    one vectorized kernel."""
    from pyspark.sql.functions import pandas_udf

    a, b = _minhash_coeffs(num_hashes, seed)
    rows = num_hashes // bands

    @pandas_udf("struct<hs: array<long>, bh: array<long>>")
    def _f(sh_series):
        import hashlib

        import numpy as np
        import pandas as pd

        A = np.array(a, dtype=np.int64)[:, None]
        B = np.array(b, dtype=np.int64)[:, None]
        M = (1 << 31) - 1

        def md5int(s: bytes) -> int:
            return int(hashlib.md5(s).hexdigest()[:15], 16)

        hs_out, bh_out = [], []
        for sh in sh_series:
            if sh is None or len(sh) == 0:
                hs_out.append([])
                bh_out.append(None)
                continue
            h = np.unique(
                np.array([md5int(s.encode("utf-8")) % M for s in sh], dtype=np.int64)
            )
            sig = ((A * h[None, :] + B) % M).min(axis=1)
            bh_out.append(
                np.array(
                    [
                        md5int(
                            ",".join(
                                str(int(x)) for x in sig[i * rows : (i + 1) * rows]
                            ).encode("utf-8")
                        )
                        for i in range(bands)
                    ],
                    dtype=np.int64,
                )
            )
            hs_out.append(h)
        return pd.DataFrame({"hs": hs_out, "bh": bh_out})

    # Deterministic ON PURPOSE: the persisted minhash relation is
    # re-resolved across calls through CacheManager.sameResult, which
    # is always false for nondeterministic expressions — marking this
    # kernel nondeterministic (the usual pushed-filter-duplication
    # pin) would make every warm caller re-pay the whole cache fill.
    # Callers must instead avoid filtering on the kernel's output
    # column before the persist boundary (see _minhash_keyed).
    return _f(shingles)


def minhash_signature(
    text: Column | str,
    *,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> Column:
    """MinHash signature as ARRAY<BIGINT>: word-``shingle_n``-gram
    shingles hashed to the 31-bit space, then ``num_hashes`` universal
    hashes h_i(x) = (a_i·x + b_i) mod (2^31-1), min over shingles. Pure
    Catalyst HOFs — whole-stage codegen, no Python. (Duplicate base
    hashes don't affect a min-fold, so distinct-on-hash ≡ the
    distinct-on-string shingle set.)"""
    return _sig_from_base(_hashed_shingles(text, shingle_n, hash_fn), num_hashes, seed)


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
    hash_fn: str = "xxhash64",
    max_bucket: int = 10000,
    observation: Observation | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    Plan shape: hashed-shingle project (persisted — it feeds the
    signature, and both sides of the verify join, so shingling runs
    once) → signature → explode bands (fan-out ×bands) → self
    equi-join on (band_idx, band_hash) → dedup pairs → verify true
    Jaccard on the distinct *hashed* shingle sets. Candidates only —
    never N². The verify join carries ARRAY<BIGINT> (8 B/shingle), not
    the n-gram strings, and array_intersect compares longs: Jaccard
    over the hashed sets equals Jaccard over the string sets up to
    31-bit hash collisions, and with ``hash_fn='md5'`` the DuckDB
    oracle reproduces the hashes (hence the values) exactly.

    ``impl='arrow'`` (default) computes the signature fold with the
    numpy kernel — integer-exact vs the ``'expr'`` Catalyst fold
    (asserted by tests), ~10× faster. Recall is bounded by
    ``max_bucket``: degenerate-hot LSH buckets are skipped, with counts
    surfaced through ``observation`` (see _pairs_from_buckets).
    """
    hs, banded = _minhash_keyed(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        seed=seed,
        hash_fn=hash_fn,
        impl=impl,
    )

    cand = _pairs_from_buckets(
        banded, ["band", "bh"], id_col, max_bucket=max_bucket, observation=observation
    )

    # attach hashed shingle sets only to surviving candidates for the
    # exact Jaccard verify
    cand = cand.join(
        hs.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
    ).join(hs.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")), "id_b")

    # sets are distinct → |A∪B| = |A|+|B|-|A∩B|; one intersect per pair
    from syzgydb_spark.cache import own_cached

    return own_cached(
        cand.withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")).cast("double"))
        .withColumn("union", F.size("hs_a") + F.size("hs_b") - F.col("inter"))
        .withColumn(
            "jaccard",
            F.when(F.col("union") > 0, F.col("inter") / F.col("union")).otherwise(F.lit(0.0)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        getattr(hs, "_persisted_src", None),
    )


def _minhash_keyed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    hash_fn: str,
    impl: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash front-end: text → (``hs`` = (id, hashed shingle
    set), ``banded`` = (id, band, band-hash key)). The hs relation is
    persisted eagerly — it feeds the band keys AND the verify join(s),
    and concurrent downstream branches would otherwise recompute the
    kernel while the cache is still filling."""
    from pyspark.storagelevel import StorageLevel

    rows = num_hashes // bands
    src = _spread(df.select(F.col(id_col), F.col(text_col)))
    if impl == "arrow" and hash_fn == "md5":
        # one Arrow kernel does hash+fold+band keys; the JVM only
        # shingles (regexp split + zip_with)
        shingles = F.array_distinct(word_ngrams(text_col, shingle_n))
        # NO empty-hs filter here: a where(size(hs)>0) on the kernel
        # output gets pushed below the _spread exchange WITH a second
        # copy of the ArrowEvalPython node (the optimizer duplicates,
        # not moves, UDF evaluation under a pushed filter) — every doc
        # paid md5-shingling + signature fold TWICE per cache fill.
        # The filter is also semantically dead: an empty-hs doc has
        # bh NULL, so posexplode emits no band keys, it can never
        # become a candidate, and every verify join is inner on
        # candidate ids. (asNondeterministic would also pin one eval
        # but breaks CROSS-CALL cache reuse — sameResult is false for
        # nondeterministic expressions — so warm callers would re-pay
        # the whole fill; measured as a 1.4x warm regression.)
        mh = (
            src.select(
                F.col(id_col),
                _md5_minhash_batch(shingles, num_hashes, bands, seed).alias("_mh"),
            )
            .select(id_col, F.col("_mh.hs").alias("hs"), F.col("_mh.bh").alias("bh"))
        )
        # hashes only (~8 B/shingle) — tiny next to the text; feeds the
        # band join AND both verify sides, so the text is read once.
        # Eager: downstream branches (band join + 2 verify sides) run
        # concurrently inside one job and would each recompute the
        # kernel while the cache is still being populated.
        mh = mh.persist(StorageLevel.MEMORY_AND_DISK)
        mh.count()
        hs = mh.select(id_col, "hs")
        # callers that manage cache lifetime (per-micro-batch streaming)
        # unpersist through this handle — hs itself is a derived node
        hs._persisted_src = mh
        banded = mh.select(
            id_col, F.posexplode("bh").alias("band", "bh")
        ).select(id_col, "band", "bh")
    else:
        # Pre-filter on the RAW text, not the projected hs column:
        # size(hs) > 0 ⟺ the doc has ≥ shingle_n word tokens
        # (ngrams_from_tokens emits max(0, tokens-(n-1)) grams, and
        # hashing/array_distinct never empty a non-empty gram set), so
        # the predicates select identical rows — but a filter on the
        # projected column is rewritten below the _spread exchange
        # WITH a full copy of the shingle+hash expression (the JVM
        # analog of the §4.4 UDF duplication): every doc paid
        # shingling + per-shingle hashing twice per fill. The cheap
        # tokenize-only predicate sits below the exchange on its own.
        hs = src.where(F.size(word_tokens(text_col)) >= shingle_n).select(
            F.col(id_col), _hashed_shingles(text_col, shingle_n, hash_fn).alias("hs")
        )
        hs = hs.persist(StorageLevel.MEMORY_AND_DISK)
        hs.count()
        hs._persisted_src = hs
        sig_fn = _sig_from_base_batch if impl == "arrow" else _sig_from_base
        sig = hs.select(id_col, sig_fn(F.col("hs"), num_hashes, seed).alias("sig"))

        # banded keys only — (id, band, band_hash) — so the self-join
        # shuffles 3 narrow columns, never the shingle arrays
        banded = sig.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda i: F.struct(
                        i.alias("band"),
                        _base_hash(
                            F.concat_ws(",", F.slice("sig", i * rows + 1, rows)), hash_fn
                        ).alias("bh"),
                    ),
                )
            ).alias("bk"),
        ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    return hs, banded


def minhash_dedup_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    impl: str = "arrow",
) -> DataFrame:
    """Keep only the rows of ``new_df`` with NO near-duplicate
    (jaccard ≥ threshold) in ``corpus_df`` — the incremental form of
    MinHash dedup: each incoming crawl/batch is checked against the
    standing corpus without re-pairing the corpus with itself
    (``dedup_against`` is the exact-match sibling).

    Shape: both sides go through the shared MinHash front-end; the
    candidate join is a band-key EQUI-join between the two sides (new ×
    corpus, never new × new), verified with exact Jaccard on the hashed
    shingle sets, and survivors come from one anti-join. At scale the
    corpus side's signatures are a narrow precomputable relation —
    persist them once per corpus version and only the new batch pays
    the kernel."""
    hs_n, band_n = _minhash_keyed(
        new_df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=seed, hash_fn=hash_fn, impl=impl,
    )
    hs_c, band_c = _minhash_keyed(
        corpus_df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=seed, hash_fn=hash_fn, impl=impl,
    )
    dup_ids = _dup_ids_against(hs_n, band_n, hs_c, band_c, id_col, threshold)
    return new_df.join(dup_ids, id_col, "left_anti")


def _dup_ids_against(
    hs_n: DataFrame,
    band_n: DataFrame,
    hs_c: DataFrame,
    band_c: DataFrame,
    id_col: str,
    threshold: float,
    *,
    earlier_only: bool = False,
) -> DataFrame:
    """New-side ids with a verified near-dup on the corpus side:
    band-key equi-join candidates → exact Jaccard on the hashed shingle
    sets. With ``earlier_only`` (self-dedup within one relation) only
    corpus rows with a LOWER id count — "has an earlier near-dup".
    The keyed inputs come from ``_minhash_keyed`` or from a persisted
    signature store (streaming_near_dedup)."""
    cand = (
        band_n.join(
            band_c.select(
                F.col(id_col).alias("_cid"), F.col("band"), F.col("bh")
            ),
            ["band", "bh"],
        )
        .select(id_col, "_cid")
        .dropDuplicates([id_col, "_cid"])
    )
    if earlier_only:
        cand = cand.where(F.col("_cid") < F.col(id_col))
    verify = cand.join(hs_n.select(F.col(id_col), F.col("hs").alias("_hn")), id_col).join(
        hs_c.select(F.col(id_col).alias("_cid"), F.col("hs").alias("_hc")), "_cid"
    )
    inter = F.size(F.array_intersect("_hn", "_hc")).cast("double")
    union = F.size("_hn") + F.size("_hc") - inter
    return (
        verify.where(F.when(union > 0, inter / union).otherwise(F.lit(0.0)) >= threshold)
        .select(id_col)
        .distinct()
    )


def _minhash_sig_keyed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    hash_fn: str,
    impl: str,
) -> tuple[DataFrame, DataFrame]:
    """Signature-only MinHash front-end: text → (``sig`` = (id,
    num_hashes-component MinHash signature), ``banded`` = (id, band,
    band-hash key)). The BOUNDED-state twin of ``_minhash_keyed``:
    state per document is ``num_hashes`` longs — constants — where the
    hashed shingle sets are O(document tokens). Verification must then
    use the MinHash Jaccard ESTIMATE (``_dup_ids_against_sig``)
    instead of the exact set intersection."""
    from pyspark.storagelevel import StorageLevel

    rows = num_hashes // bands
    src = _spread(df.select(F.col(id_col), F.col(text_col)))
    # same cheap equivalent pre-filter as _minhash_keyed's expr branch:
    # filtering on the projected hs column would duplicate the full
    # shingle+hash expression below the exchange (JVM §4.4 analog)
    base = src.where(F.size(word_tokens(text_col)) >= shingle_n).select(
        F.col(id_col), _hashed_shingles(text_col, shingle_n, hash_fn).alias("hs")
    )
    sig_fn = _sig_from_base_batch if impl == "arrow" else _sig_from_base
    sig = base.select(id_col, sig_fn(F.col("hs"), num_hashes, seed).alias("sig"))
    # narrow (num_hashes longs/row); feeds the band keys AND both
    # verify sides — same eager-persist rationale as _minhash_keyed
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    sig.count()
    sig._persisted_src = sig
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    _base_hash(
                        F.concat_ws(",", F.slice("sig", i * rows + 1, rows)), hash_fn
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    return sig, banded


def _dup_ids_against_sig(
    sig_n: DataFrame,
    band_n: DataFrame,
    sig_c: DataFrame,
    band_c: DataFrame,
    id_col: str,
    threshold: float,
    *,
    earlier_only: bool = False,
) -> DataFrame:
    """Signature-only twin of ``_dup_ids_against``: band-key candidates
    verified with the MinHash Jaccard ESTIMATE — the fraction of
    agreeing signature components (unbiased; std ≈
    sqrt(J(1-J)/num_hashes), so at 64 hashes a true-0.7 pair is
    estimated ±0.057 — the small recall/precision wobble a bounded
    state buys)."""
    cand = (
        band_n.join(
            band_c.select(F.col(id_col).alias("_cid"), F.col("band"), F.col("bh")),
            ["band", "bh"],
        )
        .select(id_col, "_cid")
        .dropDuplicates([id_col, "_cid"])
    )
    if earlier_only:
        cand = cand.where(F.col("_cid") < F.col(id_col))
    verify = cand.join(sig_n.select(F.col(id_col), F.col("sig").alias("_sn")), id_col).join(
        sig_c.select(F.col(id_col).alias("_cid"), F.col("sig").alias("_sc")), "_cid"
    )
    agree = F.aggregate(
        F.zip_with("_sn", "_sc", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = agree.cast("double") / F.size("_sn")
    return verify.where(est >= threshold).select(id_col).distinct()


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
    bits: int = 64,
    hash_fn: str = "xxhash64",
    max_bucket: int = 10000,
    observation: Observation | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole: the ``bits``-bit sketch splits into ``chunks`` pieces; a
    pair within ``max_hamming`` bit flips must agree on ≥1 chunk **only
    if** ``chunks > max_hamming``, so by default chunks = max_hamming+1.
    Candidates come from per-chunk equi-joins, verified with
    bit_count(xor). Note the scale trade-off: large max_hamming →
    narrow chunks → more random chunk collisions to verify.

    The pigeonhole guarantee is additionally bounded by ``max_bucket``
    (oversized chunk buckets are skipped — surfaced via
    ``observation``, see _pairs_from_buckets). ``hash_fn='md5'`` with
    ``bits=48`` is the DuckDB-reproducible configuration used by the
    oracle-checked query.
    """
    if chunks is None:
        chunks = max_hamming + 1
    if chunks <= max_hamming:
        raise ValueError("need chunks > max_hamming for the pigeonhole guarantee")
    sh = simhash(df, text_col, id_col, bits=bits, hash_fn=hash_fn)
    # (id, 64-bit sketch) — 16 bytes/row; consumed by the chunk
    # explode AND both verify-join sides, each of which would
    # otherwise re-run the full sketch computation (tokenize + bit
    # votes) over the corpus. Lazy persist: lineage retained for
    # fault tolerance.
    from pyspark.storagelevel import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    width = bits // chunks
    chunk_specs = []  # (shift, mask_width); last chunk absorbs the remainder
    for c in range(chunks):
        shift = c * width
        w = width if c < chunks - 1 else bits - shift
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

    cand = _pairs_from_buckets(
        parts.select(id_col, "chunk", "ck"),
        ["chunk", "ck"],
        id_col,
        max_bucket=max_bucket,
        observation=observation,
    )
    cand = cand.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a")), "id_a"
    ).join(sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b")), "id_b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    from syzgydb_spark.cache import own_cached

    return own_cached(
        cand.select("id_a", "id_b", ham.alias("hamming")).where(
            F.col("hamming") <= max_hamming
        ),
        sh,
    )


# ------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 100_000,
    hash_shingles: bool = False,
    observation: Observation | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via an inverted index: explode
    distinct shingles → posting lists → pair counts → |A∩B| /
    (|A|+|B|-|A∩B|).

    A shingle appearing in d docs contributes O(d²) rows to the pair
    join, so ``max_df`` drops shingles appearing in more than that many
    docs — finite BY DEFAULT (a stop-shingle at corpus scale is a
    join-explosion, not a signal). Dropped shingles still count toward
    set sizes, so measured similarity is conservative (never inflated).
    The cut is surfaced, not silent: pass an ``Observation`` to read
    ``dropped_shingles`` / ``max_shingle_df`` after the action. Pass
    ``max_df=None`` for exact semantics on bounded corpora.

    ``hash_shingles=True`` is the 100 TB path: shingles become 8-byte
    xxhash64 longs BEFORE the explode, so the posting-list shuffle and
    the pair join carry fixed-width longs instead of n-gram strings
    (~n× narrower rows). Jaccard is unchanged up to 64-bit hash
    collisions; keep the default for the engine-portable exact/oracle
    form."""
    shingles = F.array_distinct(word_ngrams(text_col, shingle_n))
    if hash_shingles:
        shingles = F.transform(shingles, lambda s: F.xxhash64(s))
    sh = df.select(F.col(id_col), F.explode(shingles).alias("sh"))
    # the posting relation feeds FOUR consumers (set sizes, document
    # frequencies, the max_df probe, and both sides of the pair
    # self-join — ReuseExchange does not fire across the aliased
    # branches); without sharing each one re-runs tokenize + ngram +
    # explode over the corpus. This relation is corpus-token-sized, so
    # lazy persist, NOT localCheckpoint: the lineage stays, blocks
    # evict under pressure and recompute on executor loss instead of
    # aborting the job.
    from pyspark.storagelevel import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_df is not None:
        dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
        if observation is not None:
            dfreq = dfreq.observe(
                observation,
                F.coalesce(F.sum((F.col("df") > max_df).cast("long")), F.lit(0)).alias(
                    "dropped_shingles"
                ),
                F.max("df").alias("max_shingle_df"),
            )
        keep = dfreq.where(F.col("df") <= max_df)
        if observation is not None:
            # pin metrics collection against AQE empty-relation
            # propagation (see _pairs_from_buckets)
            keep = keep.localCheckpoint(eager=True)
        sh = sh.join(keep.select("sh"), "sh", "left_semi")
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    from syzgydb_spark.cache import own_cached

    return own_cached(
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        sh,
    )


# ------------------------------------------------- incremental dedup


def dedup_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only the rows of ``new_df`` whose normalized fingerprint
    does not already appear in ``corpus_df`` — the incremental form of
    exact dedup (each crawl/batch checked against the standing corpus
    without re-deduplicating the corpus).

    Shape: fingerprint both sides (a narrow 32-byte column), LEFT ANTI
    join on it. At 100 TB the anti-join is the optimal exact plan: the
    corpus side ships only fingerprints, and Spark's runtime bloom /
    semi-join filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
    prune most new-batch partitions before the shuffle. A lossy
    pre-filter (driver bloom) would still need this join for the
    maybe-hits, so it is not layered in.

    Note: ``new_df`` is NOT self-deduplicated — compose with
    ``dedup_exact`` first if the batch may contain internal dupes."""
    fp_new = new_df.withColumn("_fp", fingerprint(text_col))
    fp_corpus = corpus_df.select(fingerprint(text_col).alias("_fp"))
    return fp_new.join(fp_corpus, "_fp", "left_anti").drop("_fp")


# -------------------------------------------------- duplicated spans


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    gram_n: int = 5,
    min_span_tokens: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """Substring-level duplication: maximal token spans of a document
    that also appear (as the same ``gram_n``-gram run) in at least one
    OTHER document — the distributed analog of suffix-array substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"), seeded with fixed-width grams instead of
    a monolithic suffix array (which needs the whole corpus in one
    address space; gram posting lists shard on a hash key).

    Returns ``(doc_id, span_start, span_end, span_tokens)`` where
    span_start/span_end are 0-based token positions of the first and
    last token covered and ``span_tokens = span_end - span_start + 1 ≥
    min_span_tokens``.

    Plan: posexplode grams → per-gram distinct-doc count (two hash
    aggregations, map-side combined) → semi-join back the grams seen in
    ≥2 docs → classic islands trick per doc (``pos - row_number()`` is
    constant within a run of consecutive duplicated gram starts) → one
    groupBy per island. Nothing wider than (doc, pos, gram-hash)
    shuffles; the per-doc window partitions by document, never global.

    A span is flagged wherever it occurs (every copy reported) —
    ownership (which copy to keep) is a policy decision composed
    downstream, e.g. keep the copy in the doc with min id.
    """
    # narrow projection, spread to cluster parallelism BEFORE the
    # expensive tokenize+gram+hash subtree (a single-file table scans
    # as one partition and would compute every gram on one core)
    src = _spread(df.select(F.col(id_col), F.col(text_col)))
    grams = src.select(
        F.col(id_col),
        F.posexplode(ngrams_from_tokens(word_tokens(text_col), gram_n)).alias(
            "pos", "gram"
        ),
    ).select(id_col, "pos", _base_hash(F.col("gram"), hash_fn).alias("gh"))
    # grams feeds BOTH the duplicated-gram aggregation and the probe
    # side of the semi join below; without a persist each consumer
    # re-runs the tokenize+gram+hash subtree from the text (two full
    # passes over the corpus). The persisted relation is (id, pos,
    # 8-byte hash) — token-count-sized but narrow, spills to disk
    # gracefully. Lazy: the aggregation's map stage fills the blocks,
    # the probe stage (gated on the aggregation via the broadcast)
    # reads them. Caller releases via release_cached(result).
    from pyspark.storagelevel import StorageLevel

    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)

    # a gram is cross-doc duplicated ⇔ min(doc) ≠ max(doc) over its
    # occurrences — a plain min/max aggregation (map-side combined, so
    # a stop-gram's million occurrences reduce to one row per map task
    # BEFORE the shuffle; a count-distinct formulation would shuffle
    # raw (gh, doc) pairs and melt on skew). `shared` is the duplicated
    # subset only — typically small, so AQE broadcasts the semi join
    # and the gram relation never shuffles.
    shared = (
        grams.groupBy("gh")
        .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
        .select("gh")
    )
    dup_pos = grams.join(shared, "gh", "left_semi").select(id_col, "pos")

    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = islands.groupBy(id_col, "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + gram_n - 1).alias("span_end"),
    )
    from syzgydb_spark.cache import own_cached

    return own_cached(
        spans.withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .where(F.col("span_tokens") >= min_span_tokens)
        .select(id_col, "span_start", "span_end", "span_tokens"),
        grams,
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    gram_n: int = 5,
    min_span_tokens: int = 10,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cut cross-document duplicated token spans, keeping ONE copy —
    the policy step after :func:`duplicate_spans` (Lee et al. 2022
    remove all but one occurrence of each duplicated substring).

    Keeper policy: spans are clustered by the md5 of their exact token
    run; the copy in the lowest-id document survives, every other copy
    is cut. (Spans whose maximal extents differ between docs — e.g. one
    doc also shares a longer run with a third doc — have different
    content fingerprints and are both kept; only content-identical
    maximal runs dedupe, which keeps the semantics exact and
    engine-portable.)

    Returns ``(id, clean_text, n_cut_spans)`` where ``clean_text`` is
    the surviving tokens space-joined (token-stream text, the normal
    currency of a training pipeline at this stage; original inter-token
    whitespace is not preserved).

    Plan: spans (see duplicate_spans) → slice the span's tokens out of
    the tokenized doc → groupBy span fingerprint for the min-id keeper
    → collect cut ranges per doc (a handful of structs per doc) → one
    positional HOF filter rebuilds the text. No step is wider than the
    span relation; the full token arrays only ride the final per-doc
    join."""
    from syzgydb_spark.functions.text import md5_long

    spans = duplicate_spans(
        df,
        text_col,
        id_col,
        gram_n=gram_n,
        min_span_tokens=min_span_tokens,
        hash_fn=hash_fn,
    )
    toks_df = df.select(
        F.col(id_col), word_tokens(text_col).alias("_toks")
    )
    sp = (
        spans.join(toks_df, id_col)
        .withColumn(
            "_fp",
            md5_long(
                F.concat_ws(
                    " ",
                    F.slice(
                        "_toks",
                        F.col("span_start") + 1,
                        F.col("span_tokens").cast("int"),
                    ),
                )
            ),
        )
        .select(id_col, "span_start", "span_end", "_fp")
    )
    # span-relation-sized; consumed twice below (keeper election + cut
    # join), and each consumer would otherwise re-run the whole
    # span-detection lineage — gram posting lists over the corpus —
    # from scratch. Lazy persist keeps the lineage (executor loss
    # recomputes instead of failing the job).
    from pyspark.storagelevel import StorageLevel

    sp = sp.persist(StorageLevel.MEMORY_AND_DISK)
    keepers = sp.groupBy("_fp").agg(F.min(id_col).alias("_keep"))
    cuts = (
        sp.join(keepers, "_fp")
        .where(F.col(id_col) != F.col("_keep"))
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_cuts"),
            F.count("*").alias("n_cut_spans"),
        )
    )
    kept_tokens = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_cuts",
            lambda c: (i >= c["span_start"]) & (i <= c["span_end"]),
        ),
    )
    from syzgydb_spark.cache import own_cached

    return own_cached(
        toks_df.join(cuts, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_cuts").isNull(), F.concat_ws(" ", "_toks"))
            .otherwise(F.concat_ws(" ", kept_tokens))
            .alias("clean_text"),
            F.coalesce("n_cut_spans", F.lit(0)).cast("long").alias("n_cut_spans"),
        ),
        sp,
        # propagate the gram-relation handle duplicate_spans attached,
        # so release_cached(result) drops both intermediates
        *getattr(spans, "_syzgy_persisted", ()),
    )


# -------------------------------------------------- duplicate grouping


def duplicate_groups(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Near-dup pairs → transitive duplicate groups ``(doc_id,
    group_id)`` with group_id = min doc id of the connected component
    (so ``doc_id == group_id`` marks the keeper — same convention as
    exact_duplicates.group_min_id).

    Iterative min-label propagation WITH adaptive pointer jumping,
    pure joins (no GraphFrames): labels initialize fused-with-round-1
    as min(self, min neighbor) — one aggregation over the edge
    relation, no separate distinct-nodes pass — then each round every
    node takes the min of its own label and its neighbors' labels;
    from effective round 3 it also takes its label's label (path
    halving). The neighbor step alone
    converges in O(component diameter) rounds — fine for dense
    near-dup clusters (≤3 rounds, which is why the jump join stays
    off there) but a CHAIN of sliding near-copies (doc₁~doc₂~…~docₙ)
    has diameter n and blew the round budget; the jump step halves
    label-chain lengths every round, so convergence is O(log n) on
    ANY component shape (a 300-node path converges in ~9 rounds —
    tested). Labels are always component-member ids and monotonically
    non-increasing, so the fixpoint is the component min, same result
    as before. Each round shuffles relations of edge/node size — the
    transitive closure is never materialized. Lineage is truncated
    per round (localCheckpoint), which iterative join plans require.
    The convergence check rides the SAME pass: the new labels join the
    old ones and an Observation sums the changed flags while the
    checkpoint materializes — one Spark job per round instead of two
    (the old separate join+limit+count re-shuffled the label relation
    a second time every round; at cluster scale that is a full extra
    stage DAG and driver round-trip per iteration).
    Raises if not converged within ``max_iterations``.

    Nodes are the ids appearing in ``pairs``; documents with no
    near-dup edge are trivially their own group and are not emitted.
    """
    # No distinct on edges: the min-fold each round is duplicate-
    # insensitive, every in-repo pair source already emits unique
    # (id_a < id_b) rows (_pairs_from_buckets ends in dropDuplicates),
    # and the two projections of a strict lower/upper pair set cannot
    # collide — the distinct was a full edge-sized shuffle + stage
    # buying nothing. A caller with massively duplicated pairs should
    # dedup upstream.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint()
    )
    # Fused init ≡ round 1: label₀(v) = min(v, min over neighbors) is
    # exactly what the first plain propagation round computes from
    # self-labels, and it costs ONE aggregation over the checkpointed
    # edge relation — the same shuffle the old distinct-nodes init
    # paid, but a full round's progress comes with it. (Every node
    # appears as src because edges are bidirectional.)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_mn")).alias("label"),
        )
        .localCheckpoint()
    )

    for round_idx in range(max_iterations):
        neighbor = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
        )
        stepped = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if round_idx >= 2:
            # pointer jump (path halving): label ← label's label. A
            # label is always itself a node id of the same component,
            # so the lookup is a self-join on the freshly stepped
            # relation; least() keeps monotonicity when the jump
            # target is stale. Engaged from the loop's 3rd iteration
            # (the 4th EFFECTIVE round, since the fused init already
            # performed round 1): dense near-dup clusters converge in
            # ≤3 plain rounds (the jump join would be pure overhead),
            # while a still-unconverged graph is long-path-shaped and
            # needs the halving. NOT round_idx >= 1: the stepped
            # self-join in the loop's SECOND iteration deterministically
            # trips a Catalyst union-constraint rewrite ("key not
            # found: node#N") when the pairs source is a LocalRelation
            # — the same internal error that forced the r12 fused-init
            # revert; one plain round before the first jump sidesteps
            # the rewrite and costs chains at most one extra round.
            jump = stepped.select(
                F.col("node").alias("_jn"), F.col("label").alias("_jl")
            )
            stepped = stepped.join(
                jump, stepped.label == jump._jn, "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_jl"), F.col("label"))
                ).alias("label"),
            )
        obs = Observation()
        merged = (
            stepped.alias("n")
            .join(labels.alias("o"), "node")
            .select(
                F.col("node"),
                F.col("n.label").alias("label"),
                (F.col("n.label") != F.col("o.label")).alias("_chg"),
            )
            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("changed"))
            .select("node", "label")
        )
        new_labels = merged.localCheckpoint()
        changed = obs.get["changed"] or 0
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("group_id")
            )
    raise RuntimeError(f"label propagation did not converge in {max_iterations} rounds")


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    *,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Corpus compaction: near-dup pairs → transitive groups → ONE
    keeper per group, the member with the highest ``score`` (ties →
    lowest id). Documents with no near-dup edge are their own group.
    Returns ``(group_id, kept_doc_id, group_size)`` — the post-dedup
    corpus inventory; join ``kept_doc_id`` back to ``docs`` for the
    surviving rows.

    This is the step after pair generation that pipelines like
    RefinedWeb/FineWeb run: collapse each duplicate cluster to its
    best exemplar rather than an arbitrary one. Shape: label
    propagation (``duplicate_groups``, O(diameter) bounded joins on
    the edge relation) then TWO aggregations — best score per group,
    then min-id among the best-scored. No per-group window anywhere,
    so a pathological million-member duplicate cluster is just a hot
    groupBy key (AQE-splittable), never a single-task sort.

    ``score`` must be non-null (coalesce upstream); exact types
    (int/decimal) make the tie semantics exact across engines.

    The keeper fold is ONE aggregation when both score and id are
    numeric: ``max(struct(score, ~id))`` — struct comparison is
    field-by-field, so the max is the highest score and, on ties, the
    largest bit-complemented id = the LOWEST id (``~x = -x-1`` is a
    strictly order-reversing bijection over the FULL integer domain,
    so ids at the type's MIN_VALUE are handled exactly, unlike
    negation). Identical rows to the two-step argmax (best-score agg
    + join + min-id agg) at a third of the shuffle passes; the
    two-step remains as the fallback for non-numeric score/id types.
    Groups whose scores are ALL null (a violation of the non-null
    contract above) degrade identically on both branches: the group
    is emitted with the lowest id as keeper.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, NumericType, ShortType

    score_c = F.col(score) if isinstance(score, str) else score
    groups = duplicate_groups(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    )
    if id_col != "doc_id":
        groups = groups.withColumnRenamed("doc_id", id_col)
    member = (
        docs.select(F.col(id_col), score_c.alias("_score"))
        .join(groups, id_col, "left")
        .withColumn("group_id", F.coalesce("group_id", F.col(id_col)))
    )
    score_t = member.schema["_score"].dataType
    id_t = member.schema[id_col].dataType
    if isinstance(score_t, NumericType) and isinstance(
        id_t, (ByteType, ShortType, IntegerType, LongType)
    ):
        return (
            member.groupBy("group_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("_score").alias("s"),
                        F.bitwise_not(F.col(id_col)).alias("ni"),
                    )
                ).alias("_k"),
                F.count(F.lit(1)).cast("long").alias("group_size"),
            )
            .select(
                "group_id",
                F.bitwise_not(F.col("_k.ni")).cast(id_t).alias("kept_doc_id"),
                "group_size",
            )
        )
    best = member.groupBy("group_id").agg(
        F.max("_score").alias("_best"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    )
    return (
        member.join(best, "group_id")
        # null-safe: a group whose scores are ALL null (contract
        # violation) keeps its lowest id, matching the struct-max fast
        # path, instead of silently vanishing from the inventory
        .where(F.col("_score").eqNullSafe(F.col("_best")))
        .groupBy("group_id", "group_size")
        .agg(F.min(id_col).alias("kept_doc_id"))
        .select("group_id", "kept_doc_id", "group_size")
    )


# ------------------------------------------------------ embedding cosine


def blocked_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    *,
    max_distance: float = 0.1,
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b) within equality blocks.

    One groupBy shuffle moving N rows; each block computes its full
    pairwise angular-distance matrix as one BLAS ``X @ X.T`` inside
    ``applyInPandas`` — Arrow never transfers N² pair rows, and there
    is no join. Zero vectors get distance 1.0 (collection.go:828-830).

    Per-block work is O(n²) BY DESIGN — this is the exact sibling of
    ``embedding_near_duplicates``; use it when blocks are bounded
    (labels, shards, LSH buckets), and the LSH variant when they
    aren't. A hot block lands in a single task: bound block sizes
    upstream."""
    md = float(max_distance)

    def _block(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        X = np.array(pdf["_vec"].tolist(), dtype=np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        denom = norms[:, None] * norms[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.clip((X @ X.T) / denom, -1.0, 1.0)
        dist = np.arccos(cos) / np.pi
        dist[denom == 0.0] = 1.0
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = dist[iu, ju] <= md
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "distance": dist[iu, ju][keep],
            }
        )

    prepped = df.select(
        F.col(block_col).alias("_b"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
    )
    return prepped.groupBy("_b").applyInPandas(
        _block, "id_a long, id_b long, distance double"
    )


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
    max_bucket: int = 10000,
    observation: Observation | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs via hyperplane-LSH blocking + exact
    verify: angular distance ≤ max_distance. Same candidate-join shape
    as the ANN search — never a full cross product. The verify stage is
    an Arrow-batched numpy cosine (cosine_distance_batch), not the
    per-pair interpreted HOF. Recall bounded by ``max_bucket``
    (skips surfaced via ``observation``)."""
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
    pairs = _pairs_from_buckets(
        keyed, ["tbl", "sig"], id_col, max_bucket=max_bucket, observation=observation
    )

    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("distance", cosine_distance_batch("va", "vb"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003 — the MOSS scheme): hash every word k-gram, slide a window of
    ``window`` consecutive hashes, and select each window's minimal
    hash (rightmost on ties). The guarantee: any shared substring of
    at least k + window − 1 tokens contributes at least one IDENTICAL
    selected fingerprint to both documents — so overlap detection is
    an equi-join on ``fp``, with controllable density ≈ 2/(window+1).

    Returns exploded rows ``(id, pos, fp)`` — one row per distinct
    selected (position, hash); join two corpora on ``fp`` for
    plagiarism/contamination-style span evidence (a coarser, cheaper
    sibling of ``duplicate_spans``' exact gram accounting).

    Pure Catalyst (HOF expressions; the argmin is min-then-rightmost-
    position so the same formulation replays in list-function SQL);
    md5-based hashes keep it engine-portable.

    ``impl='arrow'`` (default) runs the md5 + sliding-min selection in
    one numpy kernel over the Catalyst-built gram arrays — bit-identical
    to the ``'expr'`` HOF path (same md5-fold, same rightmost-tie rule;
    asserted by tests) and it dedups (pos, fp) PER DOC inside the
    kernel, which is equivalent to the global dropDuplicates (the doc
    id is part of the key) — so the Arrow plan has ZERO shuffles where
    the expression plan pays a corpus-wide exchange, and the per-window
    work is a vectorized stride trick instead of interpreted
    ArrayTransform machinery (measured 4.2 s → sub-second at sf0.1).

    The ``'expr'`` hash array is PINNED as an HOF lambda variable (the
    hashed_embedding/build_v idiom), and each window's slice+min pair
    is pinned again one level down: referenced naively inside the
    per-window lambda, Catalyst re-inlines the whole gram-build +
    md5 pipeline into EVERY window position — O(tokens²) interpreted
    ArrayTransform with per-element string copies, live-measured as a
    single 20+ minute task on sf0.1's longer documents (the sf0.1
    full-registry sweep, r9-verdict task 2, is what exposed it).
    Pinned, the scan is O(tokens × window)."""
    from syzgydb_spark.functions.text import md5_long, word_ngrams

    grams = word_ngrams(text_col, k)
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        win = int(window)

        @pandas_udf("array<struct<pos: long, fp: long>>")
        def _winnow(gram_series):
            import hashlib

            import numpy as np
            import pandas as pd

            swv = np.lib.stride_tricks.sliding_window_view
            out = []
            for grams_ in gram_series:
                if grams_ is None or len(grams_) < win:
                    out.append([])
                    continue
                h = np.fromiter(
                    (
                        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                        for g in grams_
                    ),
                    dtype=np.int64,
                    count=len(grams_),
                )
                sw = swv(h, win)                      # (n_win, window)
                mh = sw.min(axis=1)
                # rightmost in-window occurrence of the min
                right = win - 1 - np.argmax(sw[:, ::-1] == mh[:, None], axis=1)
                pos = np.arange(len(mh), dtype=np.int64) + right
                sel = np.unique(np.stack([pos, mh], axis=1), axis=0)
                out.append(
                    [{"pos": int(p), "fp": int(f)} for p, f in sel]
                )
            return pd.Series(out)

        # asNondeterministic: the where(size>0) below otherwise gets
        # pushed beneath the _spread exchange WITH a second copy of the
        # kernel (ArrowEvalPython twice in the plan — the optimizer
        # duplicates, not moves, UDF evaluation under a pushed filter),
        # so every doc paid the md5 kernel twice. The function is pure;
        # the marker only pins one evaluation site.
        _winnow = _winnow.asNondeterministic()

        # _spread the NARROW (id, text) projection before the kernel: a
        # single-file scan is 1 partition and would run every doc's
        # hashing on one core; spreading text (not the ~5× larger gram
        # arrays) keeps the one-off exchange cheap, and the gram build
        # is codegen'd after the repartition
        src = _spread(df.select(F.col(id_col), F.col(text_col)))
        return (
            src.select(F.col(id_col), _winnow(grams).alias("_sel"))
            .where(F.size("_sel") > 0)
            .select(id_col, F.explode("_sel").alias("_s"))
            .select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp"))
        )
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r}")
    h = F.transform(grams, lambda g: md5_long(g))

    def per_doc(hh):
        n_win = F.size(hh) - window + 1
        # guard: Spark's sequence(0, negative) runs DOWNWARD; short
        # docs (fewer than k+window-1 tokens) must yield no windows,
        # not a descending index range
        idx = F.when(
            n_win > 0, F.sequence(F.lit(0), n_win - 1)
        ).otherwise(F.array().cast("array<int>"))

        def select_in_window(i):
            sl = F.slice(hh, i + 1, window)
            # second-level pin: (slice, min) computed once per window
            return F.transform(
                F.array(F.struct(sl.alias("sl"),
                                 F.array_min(sl).alias("mh"))),
                lambda t: F.struct(
                    (i + F.array_max(F.filter(
                        F.sequence(F.lit(0), F.lit(window - 1)),
                        lambda j: F.get(t["sl"], j) == t["mh"],
                    ))).cast("long").alias("pos"),
                    t["mh"].alias("fp"),
                ),
            )[0]

        return F.transform(idx, select_in_window)

    sel = F.transform(F.array(h), per_doc)[0]
    return (
        df.select(F.col(id_col), sel.alias("_sel"))
        .where(F.size("_sel") > 0)
        .select(id_col, F.explode("_sel").alias("_s"))
        .select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp"))
        # adjacent windows usually select the same (pos, fp): dedup at
        # row level (engine-portable; struct-list distinct is not)
        .dropDuplicates([id_col, "pos", "fp"])
    )


# ------------------------------------------------------- line-level dedup


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 2,
    min_line_chars: int = 15,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact line deduplication (the RefinedWeb / CCNet
    paragraph-dedup policy, Penedo et al. 2023 §3.2 / Wenzek et al.
    2020 §2: a line whose trimmed content appears ``min_count``+ times
    anywhere in the corpus is boilerplate — navigation chrome, cookie
    banners, share buttons — and is removed from EVERY document).

    Only lines with at least ``min_line_chars`` characters after
    trimming participate (counting or removal): short lines repeat for
    legitimate reasons and stay. Matching is on the trimmed line; the
    original line text is what survives into ``clean_text``.

    Returns ``(id, clean_text, n_lines, n_removed_lines)`` — surviving
    units re-joined with ``sep`` in original order (``sep='\\n'``
    gives line-level dedup; ``'\\n\\n'`` the RefinedWeb paragraph-level
    variant).

    Plan: posexplode lines (map-side) → count by 8-byte line hash (one
    narrow groupBy, partial aggregation) → hash equi-join marks
    duplicated lines → one groupBy(id) rebuilds the text. Nothing
    wider than the line relation ever shuffles, and the dup-set join
    key is a single long. ``hash_fn='md5'`` uses the engine-portable
    60-bit md5 fold (DuckDB-replayable, used by the oracle);
    ``'xxhash64'`` is the production default. A 64-bit collision can
    merge two distinct lines' counts; at corpus scale that is ~n²/2⁶⁵
    lines mislabeled, documented and accepted (the md5 path has the
    same property, replayed identically by the oracle).
    """
    # null text behaves as empty (the row survives with clean_text '');
    # posexplode of a null array would silently DROP the document.
    # ``sep`` generalizes the unit: '\n\n' gives PARAGRAPH-level dedup
    # (the RefinedWeb variant), same plan shape.
    lines = _eligible_lines(
        df, text_col, id_col,
        min_line_chars=min_line_chars, hash_fn=hash_fn, sep=sep,
    )
    return _line_dedup_apply(
        lines, None, min_count=min_count, id_col=id_col, sep=sep
    )


def _line_dedup_apply(
    lines: DataFrame,
    store_counts: DataFrame | None,
    *,
    min_count: int,
    id_col: str,
    sep: str,
) -> DataFrame:
    """Shared dup-decision + text rebuild over an ``_eligible_lines``
    relation: a line hash is boilerplate when its prior-corpus count
    (``store_counts``: (h, _sn), optional) plus its count in ``lines``
    reaches ``min_count``. Batch line_dedup passes None; the store and
    streaming variants pass their aggregated prior counts."""
    cur = (
        lines.where(F.col("_h").isNotNull())
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count("*").alias("_bn"))
    )
    if store_counts is not None:
        cur = cur.join(store_counts, "h", "left")
    else:
        cur = cur.withColumn("_sn", F.lit(0))
    dups = (
        cur.where(F.coalesce(F.col("_sn"), F.lit(0)) + F.col("_bn") >= min_count)
        .select(F.col("h").alias("_h"), F.lit(True).alias("_dup"))
    )
    marked = lines.join(dups, "_h", "left")
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("_dup").isNull(), F.struct("_pos", "_line"))
        )
    )
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            sep, F.transform(kept, lambda s: s["_line"])
        ).alias("clean_text"),
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed_lines"),
    )


# ----------------------------------------- persisted fingerprint store


def build_fingerprint_store(
    df: DataFrame,
    table: str,
    *,
    text_col: str = "text",
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Materialize the standing corpus's exact-dedup state as a
    BUCKETED fingerprint table (distinct md5 fingerprints, bucketed and
    sorted on ``fp``). ``dedup_against`` recomputes corpus fingerprints
    from text on every batch — correct, but at 100 TB the incremental
    path should (1) never rescan corpus text and (2) never shuffle the
    corpus side. A bucketed store gives both: the one-time build pays
    one shuffle, and every subsequent probe join reads the store
    co-partitioned and pre-sorted straight off disk (no Exchange, no
    Sort on the store side — plan-asserted in test_plan_quality)."""
    from syzgydb_spark.sources.bucketed import save_bucketed

    fps = df.select(fingerprint(text_col).alias("fp")).distinct()
    save_bucketed(fps, table, keys="fp", buckets=buckets, sort="fp", path=path)


def dedup_against_store(
    spark,
    new_df: DataFrame,
    table: str,
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup against a persisted fingerprint store
    (see :func:`build_fingerprint_store`): keep the rows of ``new_df``
    whose fingerprint is absent. Per-batch cost is proportional to the
    BATCH: only the new side exchanges (into the store's bucketing);
    the store side never shuffles or sorts. Same result as
    ``dedup_against(new_df, corpus)`` by construction (differential-
    tested). ``new_df`` is not self-deduplicated — compose with
    ``dedup_exact`` first if the batch may contain internal dupes."""
    from syzgydb_spark.sources.bucketed import read_bucketed

    store = read_bucketed(spark, table)
    fp_new = new_df.withColumn("_fp", fingerprint(text_col))
    return (
        fp_new.join(store, fp_new["_fp"] == store["fp"], "left_anti").drop("_fp")
    )


def update_fingerprint_store(
    spark,
    accepted_df: DataFrame,
    table: str,
    text_col: str = "text",
) -> None:
    """Fold an accepted batch's fingerprints into the store. Appends
    bucketed files under the SAME bucket spec (Spark validates the
    layout), so the no-Exchange probe property is preserved; appended
    rows are deduplicated against the store first, keeping it
    distinct for a SINGLE folding writer (the intended shape: one
    ingest pipeline owns the store). Concurrent folds are not
    transactional — two writers folding overlapping batches can both
    append the same fingerprint; dedup results stay correct (a
    duplicate store row still anti-joins the same docs away) but the
    store grows redundantly. Many small appends also add a file per
    bucket per batch — re-run :func:`build_fingerprint_store`
    periodically to compact both away (the collection ``compact()``
    analog for analytic tables)."""
    from syzgydb_spark.sources.bucketed import read_bucketed

    store = read_bucketed(spark, table)
    fresh = (
        accepted_df.select(fingerprint(text_col).alias("fp"))
        .distinct()
        .join(store, "fp", "left_anti")
    )
    n_buckets = next(
        (
            int(r["data_type"])
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            if r["col_name"] == "Num Buckets"
        ),
        None,
    )
    if n_buckets is None:
        raise ValueError(
            f"table {table!r} is not bucketed — create it with "
            "build_fingerprint_store, not a plain write"
        )
    fresh.write.format("parquet").mode("append").bucketBy(
        n_buckets, "fp"
    ).sortBy("fp").saveAsTable(table)


def _eligible_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_line_chars: int,
    hash_fn: str,
    sep: str = "\n",
):
    """(id, pos, line, h) rows; h is null for exempt (short) lines —
    the shared exploder for line_dedup and the line store."""
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep), -1)
        ).alias("_pos", "_line"),
    )
    key = F.trim(F.col("_line"))
    return lines.withColumn(
        "_h",
        F.when(F.length(key) >= min_line_chars, _base_hash(key, hash_fn)),
    )


def build_line_store(
    df: DataFrame,
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 15,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist the standing corpus's line-frequency state as a bucketed
    ``(h BIGINT, n BIGINT)`` table — the :func:`line_dedup` sibling of
    :func:`build_fingerprint_store`. Counts cover every eligible line
    EVER SEEN (pre-removal): boilerplate keeps accumulating evidence
    across crawls, which is exactly the policy an incremental pipeline
    wants. Appends are per-batch DELTA rows; readers sum per hash —
    a groupBy on the bucket key, which the bucketed layout satisfies
    with NO Exchange."""
    from syzgydb_spark.sources.bucketed import save_bucketed

    counts = (
        _eligible_lines(
            df, text_col, id_col,
            min_line_chars=min_line_chars, hash_fn=hash_fn, sep=sep,
        )
        .where(F.col("_h").isNotNull())
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    save_bucketed(counts, table, keys="h", buckets=buckets, sort="h", path=path)


def update_line_store(
    spark,
    batch_df: DataFrame,
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 15,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
) -> None:
    """Fold an ingested batch's line counts into the store (delta rows
    under the same bucket spec; same single-folding-writer contract as
    ``update_fingerprint_store``). Re-run :func:`build_line_store` on
    the full corpus periodically to compact the deltas."""
    n_buckets = next(
        (
            int(r["data_type"])
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            if r["col_name"] == "Num Buckets"
        ),
        None,
    )
    if n_buckets is None:
        raise ValueError(
            f"table {table!r} is not bucketed — create it with build_line_store"
        )
    deltas = (
        _eligible_lines(
            batch_df, text_col, id_col,
            min_line_chars=min_line_chars, hash_fn=hash_fn, sep=sep,
        )
        .where(F.col("_h").isNotNull())
        .groupBy(F.col("_h").alias("h"))
        .agg(F.count("*").alias("n"))
    )
    deltas.write.format("parquet").mode("append").bucketBy(
        n_buckets, "h"
    ).sortBy("h").saveAsTable(table)


def line_dedup_against_store(
    spark,
    new_df: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 2,
    min_line_chars: int = 15,
    hash_fn: str = "xxhash64",
    sep: str = "\n",
) -> DataFrame:
    """Incremental corpus-wide line dedup: a line of the NEW batch is
    boilerplate when its store count plus its batch count reaches
    ``min_count`` — each crawl is cleaned against everything already
    ingested without re-scanning the corpus. (Incremental semantics:
    the removal applies to the current and future batches; lines
    already committed in earlier batches are not retroactively cut —
    run batch :func:`line_dedup` over the corpus for that.)

    Same output contract as ``line_dedup``. The store side aggregates
    and joins entirely within its bucketed layout (no Exchange, plan-
    asserted); only batch-sized relations shuffle."""
    from syzgydb_spark.sources.bucketed import read_bucketed

    lines = _eligible_lines(
        new_df, text_col, id_col,
        min_line_chars=min_line_chars, hash_fn=hash_fn, sep=sep,
    )
    store_counts = (
        read_bucketed(spark, table).groupBy("h").agg(F.sum("n").alias("_sn"))
    )
    return _line_dedup_apply(
        lines, store_counts, min_count=min_count, id_col=id_col, sep=sep
    )


def novelty_scores(
    df: DataFrame,
    *,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT
    word ``shingle_n``-grams that appear in NO other document —
    ``(id, n_shingles, n_unique, novelty)``. Binary dedup asks "is
    this a copy"; novelty is the continuous form curation mixes use to
    down-weight documents that are mostly recombinations of corpus
    boilerplate (novelty → 0) and favor genuinely new text
    (novelty → 1). Documents too short for a single shingle report
    NULL novelty (0 shingles), distinct from a real 0.0.

    Shape: distinct shingles per doc → one gram-keyed doc-frequency
    aggregation (map-side combined) → join back → per-doc rollup.
    With ``hash_shingles`` (default — the 100 TB path, same md5 fold
    every keyed dedup operator here uses) both shuffles carry 8-byte
    keys, never gram strings; the oracle replays the identical fold,
    so the hash form is exact cross-engine, not approximate."""
    from syzgydb_spark.functions.text import md5_long, ngrams_from_tokens, word_tokens

    # _spread: the tokenize → ngram → md5 chain is the compute-bound
    # part and inherits the scan's split count — widen narrow scans to
    # the cluster parallelism before it (no-op at real scale)
    toks = _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), word_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_w")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams_from_tokens(F.col("_w"), shingle_n))
        ).alias("_g"),
    )
    if hash_shingles:
        grams = grams.select(F.col(id_col), md5_long(F.col("_g")).alias("_g"))
    # persist: both the doc-frequency aggregation and the probe side
    # of the join consume this relation, and its lineage is the full
    # tokenize → ngram → md5 chain — narrow (id, 8-byte) rows cached
    # vs two corpus-token passes recomputed (measured 2× at sf1).
    # Caller owns the cache (release_cached), the house convention.
    from pyspark.storagelevel import StorageLevel

    from syzgydb_spark.cache import own_cached

    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    dfc = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        grams.join(dfc, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
    )
    res = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_unique") / F.col("n_shingles"), 6),
            ).alias("novelty"),
        )
    )
    return own_cached(res, grams)
