"""Text-analysis functions for large-scale training-data pipelines.

All pure Catalyst expressions (split/filter/transform/regexp_*) — no
Python in the row path, so these run inside whole-stage codegen over
arbitrarily large document scans. These extend the reference's surface
(it has no text operators beyond the filter language, SURVEY.md §2.7);
they are the north-star LLM-pipeline operators from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, deterministic stopword lists for the n-gram language-ID
# heuristic. Intentionally tiny: the goal is a cheap, reproducible
# scorer, not a model.
STOPWORDS = {
    "en": ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"],
    "de": ["der", "die", "das", "und", "oder", "von", "zu", "in", "ist", "es", "nicht", "mit", "ein", "eine", "auf"],
    "fr": ["le", "la", "les", "et", "ou", "de", "des", "en", "est", "il", "que", "pour", "dans", "un", "une"],
    "es": ["el", "la", "los", "las", "y", "o", "de", "en", "es", "que", "por", "para", "un", "una", "con"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def word_tokens(text: Column | str) -> Column:
    """Lowercased word tokens (whitespace/punct split), empties removed."""
    toks = F.split(F.lower(_col(text)), r"[^\p{L}\p{N}']+")
    return F.filter(toks, lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_token_estimate(text: Column | str) -> Column:
    """BPE-ish token-count estimate via a GPT-style pre-tokenizer regex:
    runs of letters, runs of digits, punctuation clusters, whitespace."""
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    return F.regexp_count(_col(text), F.lit(pat))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams (shingles) of the lowercased text. Text
    shorter than ``n`` yields an EMPTY array — the old length floor
    produced [''] for empty text and a single short gram otherwise,
    making every short document share identical gram sets (spurious
    full-similarity near-dups in shingle-set use). The lowercased
    string is pinned as an HOF lambda variable — captured naively it
    is re-lowered (a full copy) once per gram."""
    def per_doc(ss):
        count = F.length(ss) - (n - 1)
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda i: F.substring(ss, i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(F.lower(_col(text))), per_doc)[0]


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) from a token-array expression.

    Built by zipping the token array against its own shifted copies —
    n-1 zip_with passes, O(n·L) total — instead of a slice per
    position, which is O(L²) and dominated the MinHash profile.

    The input expression is pinned as a higher-order-function lambda
    variable (``transform(array(toks), t -> ...)``) so it is evaluated
    exactly ONCE per row: the naive form references ``toks`` in every
    slice/size, and Catalyst's project-collapse happily re-inlines an
    upstream tokenization into each reference — profiled at ~10
    evaluations of split+filter per row for n=5, the dominant cost of
    every gram-based operator before this guard."""

    def build(t: Column) -> Column:
        count = F.greatest(F.size(t) - (n - 1), F.lit(0))
        grams = F.slice(t, 1, count)
        for k in range(1, n):
            shifted = F.slice(t, k + 1, count)
            grams = F.zip_with(grams, shifted, lambda g, tok: F.concat(g, F.lit(" "), tok))
        return grams

    return F.transform(F.array(toks), build)[0]


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of the text, space-joined."""
    return ngrams_from_tokens(word_tokens(text), n)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    toks = word_tokens(text)
    stops = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(stops)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def cjk_ratio(text: Column | str) -> Column:
    """Fraction of characters in the CJK unified ideograph block."""
    t = _col(text)
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        cjk.cast("double") / F.length(t)
    )


def language_id(text: Column | str) -> Column:
    """Heuristic language ID over {en,de,fr,es,zh}: CJK-character ratio
    wins for zh; otherwise argmax of per-language stopword ratios
    (deterministic tie-break by language code).

    The token array is pinned as an HOF lambda variable so the
    tokenization runs ONCE per row — four independent stopword_ratio
    expressions would each re-inline split+filter (~12 tokenizations
    per row under project-collapse; the ngrams_from_tokens guard,
    applied here too)."""

    def build(toks: Column) -> Column:
        n = F.size(toks)
        scored = [
            F.struct(
                F.when(n == 0, F.lit(0.0))
                .otherwise(
                    F.size(
                        F.filter(toks, lambda t: t.isin(STOPWORDS[lang]))
                    ).cast("double")
                    / n
                )
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS)
        ]
        return F.greatest(*scored)["lang"]

    best = F.transform(F.array(word_tokens(text)), build)[0]
    return F.when(cjk_ratio(text) > 0.05, F.lit("zh")).otherwise(best)


def punct_ratio(text: Column | str) -> Column:
    t = _col(text)
    p = F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(p.cast("double") / F.length(t))


def mean_word_length(text: Column | str) -> Column:
    toks = word_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(text: Column | str, lang: str = "en") -> Column:
    """Composite document-quality score in [0,1]: rewards reasonable
    length, a healthy stopword ratio, moderate punctuation, and plausible
    mean word length — the classic cheap pre-filter for LLM training
    corpora (cf. C4/Gopher rules)."""
    t = _col(text)
    length_score = F.least(F.length(t).cast("double") / 500.0, F.lit(1.0))
    stop = stopword_ratio(t, lang)
    stop_score = F.least(stop / 0.3, F.lit(1.0))
    punct = punct_ratio(t)
    punct_score = F.when(punct > 0.3, F.lit(0.0)).otherwise(1.0 - punct / 0.3)
    mwl = mean_word_length(t)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_score + stop_score + punct_score + mwl_score) / 4.0


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the
    whitespace-normalized, lowercased text. Stable across engines
    (DuckDB computes the identical value, making it oracle-checkable);
    use ``fingerprint64`` for a compact join key."""
    norm = F.regexp_replace(F.trim(F.lower(_col(text))), r"\s+", " ")
    return F.md5(norm.cast("binary"))


def md5_long(c: Column) -> Column:
    """md5 of the column's UTF-8 bytes folded to a BIGINT (first 15 hex
    digits) — the engine-portable 60-bit hash every md5-keyed operator
    shares (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def fingerprint64(text: Column | str) -> Column:
    """64-bit fingerprint: first 15 hex digits of md5 as a BIGINT."""
    return F.conv(F.substring(fingerprint(text), 1, 15), 16, 10).cast("long")


def normalized_text(text: Column | str) -> Column:
    """Aggressive dedup normalization: lowercase, every run of
    non-alphanumerics (punctuation, whitespace, symbols) collapsed to a
    single space, edges trimmed. NULL text normalizes to '' so a null
    doc joins the empty-doc group instead of vanishing. Same regex
    dialect subset as DuckDB's RE2, so oracles reproduce it exactly."""
    norm = F.regexp_replace(F.lower(F.coalesce(_col(text), F.lit(""))), r"[^\p{L}\p{N}]+", " ")
    return F.trim(norm)


def normalized_fingerprint64(text: Column | str) -> Column:
    """64-bit BIGINT key of the dedup-normalized text (md5-folded, the
    shared engine-portable hash)."""
    return md5_long(normalized_text(text))


# PII patterns kept RE2-simple (no lookaround/backrefs) so the same
# regex runs identically under Java regex (Spark) and RE2 (DuckDB) —
# oracle-checkable, and portable to any engine a pipeline hands the
# scrub step to. The phone pattern deliberately requires a phone SHAPE
# (+country prefix, (area) code, or 3-3-4 groups) rather than any long
# digit run: a greedy \d[\d\s.-]{7,}\d would eat dates
# ("2026-08-13 12"), year lists, and numeric tables — corrupting
# exactly the corpus the scrub is meant to clean. Unusual formats can
# slip through; precision over recall is the right default for a
# training-data pass.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (
        r"\+\d{1,3}[\s.-]?\(?\d{1,4}\)?[\s.-]?\d{2,4}(?:[\s.-]?\d{2,4}){0,2}"
        r"|\(\d{3}\)[\s.-]?\d{3}[\s.-]?\d{4}"
        r"|\b\d{3}[\s.-]\d{3}[\s.-]\d{4}\b",
        "[PHONE]",
    ),
]


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (bits) of the character distribution — the
    classic cheap spam/garbage detector: keyboard mash, repeated
    padding, and base64 blobs sit at the tails while natural prose
    lands mid-range. Empty/NULL text scores 0.0.

    Arrow kernel: the per-row histogram is a C-speed ``Counter`` and
    the fold runs over the SORTED distinct characters with plain
    sequential float adds and C ``log2`` — the exact IEEE computation
    the DuckDB oracle performs, bit-for-bit. The pure-Catalyst
    :func:`char_entropy_expr` differs by a last ulp on ~20% of docs
    (Java's log2 is ln/ln2) and is O(distinct·len) per row in the
    interpreted HOF evaluator — measured 20 s at sf0.1 where this
    kernel is sub-second; keep it for SQL-only contexts.
    """
    import pandas as pd

    @F.pandas_udf("double")
    def _ent(s):
        # stdlib-only nested closure (cloudpickle ships it by value);
        # Counter is a C-speed histogram, the sorted sequential fold
        # reproduces the oracle's IEEE order exactly
        from collections import Counter
        from math import log2

        def one(t):
            if not t:
                return 0.0
            c = Counter(t)
            n = len(t)
            acc = 0.0
            for _, v in sorted(c.items()):
                p = v / n
                acc = acc + p * log2(p)
            return -acc

        return pd.Series(
            [one(t if t is not None else "") for t in s], dtype="float64"
        )

    return _ent(_col(text))


def unicode_clean(text: Column | str) -> Column:
    """Unicode hygiene for crawled text: NFC normalization (composed
    forms — 'e' + COMBINING ACUTE becomes 'é', so the same word gets
    ONE fingerprint/shingle/token regardless of how the source encoded
    it), then strip invisible characters (C0/C1 controls except tab
    and newline, zero-widths U+200B-200D, BOM — the classic dedup- and
    tokenizer-poisoners), then collapse space/tab runs. NULL stays
    NULL. Run this BEFORE fingerprinting/shingling: two byte-different
    encodings of one string otherwise land in different dedup groups.

    Arrow kernel (stdlib unicodedata + re in a nested closure); the
    DuckDB oracle replays it exactly with ``nfc_normalize`` (both
    implement the Unicode standard — parity spot-checked over
    combining marks, ligatures, fullwidth forms, supplementary plane)
    + the same character-class regexes in RE2 spelling.
    """
    import pandas as pd

    @F.pandas_udf("string")
    def _uc(s):
        import re
        import unicodedata

        ctrl = re.compile(
            "[\x00-\x08\x0b-\x1f\x7f-\x9f"
            "\u200b-\u200d\ufeff]"
        )
        ws = re.compile("[ \t]+")

        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize("NFC", t)
            return ws.sub(" ", ctrl.sub("", t))

        return pd.Series([one(t) for t in s], dtype=object)

    return _uc(_col(text))


#: RE2 spelling of unicode_clean's two scrub regexes — the DuckDB
#: oracle and any external replayer use these verbatim.
UNICODE_CLEAN_CTRL_RE = (
    r"[\x00-\x08\x0B-\x1F\x7F-\x9F\x{200B}-\x{200D}\x{FEFF}]"
)
UNICODE_CLEAN_WS_RE = r"[ \t]+"


def char_entropy_expr(text: Column | str) -> Column:
    """Pure-Catalyst form of :func:`char_entropy` (same value to a
    last ulp — Java log2 vs C log2; identical at the contract's 6dp
    rounding): sorted-distinct HOF fold inside codegen. Use where
    Python workers are unavailable; it is O(distinct·len) per row, so
    prefer the Arrow kernel on large corpora."""
    t = F.coalesce(_col(text), F.lit(""))
    chars = F.filter(F.split(t, ""), lambda c: c != F.lit(""))
    n = F.size(chars).cast("double")
    p = lambda c: (  # noqa: E731 - local shorthand
        F.size(F.filter(chars, lambda x: x == c)).cast("double") / n
    )
    ent = -F.aggregate(
        F.array_sort(F.array_distinct(chars)),
        F.lit(0.0),
        lambda acc, c: acc + p(c) * F.log2(p(c)),
    )
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def redact_pii(text: Column | str) -> Column:
    """Scrub emails, IPv4 addresses, and phone-shaped digit runs,
    replacing each with a typed tag. Order matters: emails first (they
    contain digits and dots), then IPs, then the greedy phone pattern.
    Pure ``regexp_replace`` chain — whole-stage codegen, no Python."""
    out = _col(text)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def token_chunks(
    text: Column | str, *, chunk_tokens: int = 512, overlap: int = 64
) -> Column:
    """Split a document into word-token windows of ``chunk_tokens``
    with ``overlap`` tokens carried between consecutive chunks — the
    standard context-window prep for LLM training/embedding. Returns
    ARRAY<STRUCT<start INT, n_tokens INT, chunk STRING>> (1-based
    start); empty documents produce an empty array; a trailing window
    whose tokens were all covered by the previous chunk is dropped.
    Pure Catalyst: sequence of starts → slice → array_join. The token
    array is pinned as an HOF lambda variable (the build_v idiom) —
    captured naively, the split+filter tokenization re-runs for every
    start-filter element and every chunk (~3× chunks extra
    tokenizations per document)."""
    if not 0 <= overlap < chunk_tokens:
        # negative overlap would mean step > chunk_tokens: tokens
        # between windows silently appear in NO chunk
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def per_doc(toks):
        n = F.size(toks)
        starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
        # a start contributes new tokens iff it reaches past the
        # previous chunk's end: n >= start + overlap (always true for
        # the first)
        starts = F.filter(starts, lambda s: (s == 1) | (s + overlap <= n))
        return F.transform(
            starts,
            lambda s: F.struct(
                s.cast("int").alias("start"),
                F.least(F.lit(chunk_tokens), n - s + 1).cast("int").alias("n_tokens"),
                F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk"),
            ),
        )

    return F.transform(F.array(word_tokens(text)), per_doc)[0]


def _hash_pairs(toks: Column, dim: int, seed: int, hash_fn: str) -> Column:
    """token array → array<struct<b int, s long>> of (bucket, ±1 sign)
    pairs — the one hashing site both hashed_embedding forms share.

    ``md5`` is the engine-portable binding (DuckDB replays it
    bit-for-bit — the oracle contract); ``xxhash64`` is the production
    path: Spark's native 64-bit hash evaluates inside whole-stage
    codegen at a fraction of md5's cost (md5 was profiled as 8.8 s of
    the 9.5 s sf1 standalone — cryptographic-hash cost for a
    non-cryptographic need). Same salting scheme for both
    (``hb<seed>:``/``hs<seed>:``), so the two are independent hash
    families over the same token stream, not reorderings of one
    another."""
    if hash_fn == "md5":
        def bucket(t):
            return F.pmod(md5_long(F.concat(F.lit(f"hb{seed}:"), t)), F.lit(dim))

        def parity(t):
            return md5_long(F.concat(F.lit(f"hs{seed}:"), t)) % 2 == 0
    elif hash_fn == "xxhash64":
        def bucket(t):
            return F.pmod(F.xxhash64(F.concat(F.lit(f"hb{seed}:"), t)), F.lit(dim))

        def parity(t):
            return F.pmod(F.xxhash64(F.concat(F.lit(f"hs{seed}:"), t)), F.lit(2)) == 0
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; expected 'md5' or 'xxhash64'")
    return F.transform(
        toks,
        lambda t: F.struct(
            bucket(t).cast("int").alias("b"),
            F.when(parity(t), F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("s"),
        ),
    )


def hashed_embedding(
    text: Column | str,
    dim: int = 64,
    *,
    seed: int = 42,
    normalize: bool = True,
    hash_fn: str = "md5",
) -> Column:
    """Feature-hashing document vector (the "hashing trick",
    Weinberger et al. 2009): every word token is hashed to one of
    ``dim`` buckets with an independent ±1 sign hash, and component j
    is the signed count of tokens landing in bucket j (L2-normalized
    by default). The model-free bridge from raw text into every
    embedding-space operator — semdedup, embedding_outliers,
    cluster_balanced_sample, the ANN joins — when no learned embedding
    exists: unbiased inner products, cosine ≈ lexical overlap.

    Pure Catalyst (HOFs over the token array): zero Python, zero
    shuffle, codegen end to end. The default ``hash_fn='md5'`` is the
    shared ``md5_long`` fold, so any SQL engine reproduces the exact
    vector (DuckDB oracle `hashed_doc_embedding`);
    ``hash_fn='xxhash64'`` swaps in Spark's native non-cryptographic
    hash for production pipelines that don't need cross-engine replay
    (see :func:`_hash_pairs`).

    NULL text yields NULL; a text with no tokens yields the zero
    vector (left unnormalized, matching ``l2_normalize``'s
    zero-vector contract)."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    toks = word_tokens(text)
    pairs = _hash_pairs(toks, dim, seed, hash_fn)

    # Pin `pairs` as an HOF lambda variable (the ngrams_from_tokens
    # idiom): referenced naively inside the per-component lambda,
    # Catalyst re-inlines the 2-md5-per-token hashing into EVERY one
    # of the `dim` components (dim× the hashing cost — live-measured
    # as an MLlib fit that re-evaluates it per LBFGS iteration and
    # never finishes). Same pin for `v` before the normalize pass,
    # which otherwise re-inlines the whole signed-count build into the
    # norm AND each divided component.
    def build_v(p: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.aggregate(
                p,
                F.lit(0).cast("long"),
                lambda acc, q: acc + F.when(q["b"] == j, q["s"]).otherwise(F.lit(0)),
            ).cast("double"),
        )

    v = F.transform(F.array(pairs), build_v)[0]

    if normalize:
        def norm_v(vv: Column) -> Column:
            nrm = F.sqrt(F.aggregate(vv, F.lit(0.0), lambda a, x: a + x * x))
            return F.when(nrm == 0.0, vv).otherwise(
                F.transform(vv, lambda x: x / nrm)
            )

        v = F.transform(F.array(v), norm_v)[0]
    # a NULL document is NULL, not a vector of NULL components (the
    # sequence() spine would otherwise produce the latter)
    return F.when(toks.isNull(), F.lit(None).cast("array<double>")).otherwise(v)


def hashed_embedding_batch(
    text: Column | str,
    dim: int = 64,
    *,
    seed: int = 42,
    normalize: bool = True,
    hash_fn: str = "md5",
) -> Column:
    """Arrow twin of :func:`hashed_embedding` — same values
    BIT-FOR-BIT, different cost model. The expression form's
    per-component fold is O(dim x tokens) per document (256-dim on a
    200-token doc = 51k fold steps — live-measured at ~4 ms/doc,
    dominating the bench); this form tokenizes JVM-side with the SAME
    Catalyst regex, ships the token array over Arrow, and builds the
    histogram in O(tokens) with a per-batch token->(bucket, sign)
    memo (md5 pairs computed once per DISTINCT token per batch).

    Bit-parity argument (differential-tested): tokens come from the
    identical expression; hashlib.md5 of the UTF-8 bytes == Catalyst
    md5(cast binary); signed counts are small integers, exact in
    doubles under any accumulation order; the norm sums squares of
    integers (exact below 2^53), so the single rounding site — the
    final per-component division — sees identical operands.

    Use this form in scoring/fit paths; keep the expression form where
    a pure-SQL plan is required (the DuckDB oracle replays both).

    With ``hash_fn='xxhash64'`` the hashing moves JVM-SIDE entirely:
    the (bucket, sign) pairs are computed by the same codegen
    expressions as :func:`hashed_embedding`'s xxhash64 branch and only
    the O(tokens) scatter-add crosses Arrow — the kernel does zero
    Python hashing (the md5 branch's hashlib memo was 8.8 s of the
    9.5 s sf1 standalone; xxhash64 is the production default for
    anything not bound to the cross-engine oracle). Bit-parity with
    the expression form holds for BOTH branches: identical (b, s) per
    token by construction, ±1 integer accumulation is exact in
    doubles, and the single rounding site (the normalize division)
    sees identical operands."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    import pandas as pd  # noqa: F401 (signature import)
    from pyspark.sql.functions import pandas_udf

    d, sd, nrm_flag = int(dim), int(seed), bool(normalize)

    if hash_fn == "xxhash64":
        pairs = _hash_pairs(word_tokens(text), d, sd, hash_fn)

        @pandas_udf("array<double>")
        def _scatter_kernel(b_s, s_s):
            # self-contained closure: executors never import this package
            import math

            import numpy as np
            import pandas as pd

            out = []
            for bs, ss in zip(b_s, s_s):
                if bs is None:
                    out.append(None)
                    continue
                v = np.zeros(d, dtype=np.float64)
                np.add.at(v, np.asarray(bs, dtype=np.int64),
                          np.asarray(ss, dtype=np.float64))
                if nrm_flag:
                    n2 = float(np.dot(v, v))
                    if n2 != 0.0:
                        v = v / math.sqrt(n2)
                out.append(v)
            return pd.Series(out)

        return _scatter_kernel(
            F.transform(pairs, lambda p: p["b"]),
            F.transform(pairs, lambda p: p["s"].cast("double")),
        )
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}; expected 'md5' or 'xxhash64'")

    @pandas_udf("array<double>")
    def _hash_kernel(tok_s):
        # self-contained closure: executors never import this package
        import hashlib
        import math

        import numpy as np
        import pandas as pd

        memo = {}

        def th(t):
            h = memo.get(t)
            if h is None:
                b = int(
                    hashlib.md5(f"hb{sd}:{t}".encode()).hexdigest()[:15], 16
                ) % d
                s = (
                    1.0
                    if int(
                        hashlib.md5(f"hs{sd}:{t}".encode()).hexdigest()[:15], 16
                    ) % 2 == 0
                    else -1.0
                )
                h = (b, s)
                memo[t] = h
            return h

        out = []
        for toks in tok_s:
            if toks is None:
                out.append(None)
                continue
            v = np.zeros(d, dtype=np.float64)
            for t in toks:
                b, s = th(t)
                v[b] += s
            if nrm_flag:
                n2 = float(np.dot(v, v))  # exact: integer-valued squares
                if n2 != 0.0:
                    v = v / math.sqrt(n2)
            out.append(v)
        return pd.Series(out)

    return _hash_kernel(word_tokens(text))
