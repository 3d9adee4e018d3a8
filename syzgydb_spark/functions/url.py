"""URL normalization & domain extraction — Catalyst string expressions.

Web-scale corpus pipelines dedup and throttle by URL long before any
content-based pass: the same page is crawled with and without
``www.``, with ``http`` and ``https``, with tracking query params
(``utm_*``, ``gclid``, ``fbclid``) and fragments appended — all byte-
distinct, all the same document. Canonicalizing first collapses those
families for free and makes per-domain statistics (caps, blocklists,
source mixing) meaningful.

Everything here is built from ``regexp_replace`` / ``regexp_extract``
/ ``lower`` — whole-stage-codegen JVM expressions, zero Python. The
regexes deliberately use only constructs shared by Java's regex and
RE2 (no lookaround, no backrefs), so any engine replays them
identically — the DuckDB oracles run the very same patterns.

Reference: the reference engine stores documents by caller-chosen id
and has no URL layer (syzgydb collection.go:427 — ids are uint64);
this module is part of the training-data-pipeline superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that identify a click, not a resource. The list is
#: the stable core of every public tracking-param blocklist.
TRACKING_PARAMS = r"(utm_[a-z]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lower-cased host of a URL, port and userinfo stripped; NULL
    input stays NULL, a scheme-less input ("example.com/x") is treated
    as host-first. Pure regexp_extract."""
    u = _c(col)
    # strip scheme, then userinfo@, then take up to first / ? #, then
    # strip :port
    no_scheme = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    no_user = F.regexp_replace(no_scheme, r"^[^/?#@]*@", "")
    host = F.regexp_extract(no_user, r"^([^/?#:]*)", 1)
    return F.lower(host)


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a host: the last two labels, or the last
    THREE when the ending pair is a well-known second-level public
    suffix (``co.uk``, ``com.au``, ...). A bounded, documented subset
    of the Public Suffix List — the full PSL is a data file a
    deployment can swap in; the heuristic covers the high-traffic
    ccTLD families and is engine-replayable as one alternation."""
    h = _c(host)
    two_level = (
        r"(co|com|org|net|ac|gov|edu)\."
        r"(uk|jp|au|nz|za|in|br|kr|cn|mx|sg|il|id|th|tr)"
    )
    three = F.regexp_extract(h, r"([^.]+\." + two_level + r")$", 1)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).otherwise(two)


def url_normalize(col: Column | str, *, strip_tracking: bool = True) -> Column:
    """Canonical form of a URL for identity comparison:

    - scheme dropped (http ≡ https ≡ missing)
    - host lower-cased, leading ``www.`` and explicit ``:80``/``:443``
      ports stripped
    - fragment dropped
    - tracking query params (``TRACKING_PARAMS``) dropped when
      ``strip_tracking``; an emptied query loses its ``?``
    - trailing ``/`` dropped (path case is PRESERVED — path case is
      significant per RFC 3986, unlike host case)

    Returns ``host/path?query`` — a pure codegen expression chain,
    suitable as a dedup key or a groupBy domain key after
    ``url_host``/``registered_domain``."""
    u = _c(col)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")  # scheme
    host = F.regexp_extract(u, r"^([^/?#]*)", 1)
    rest = F.regexp_replace(u, r"^[^/?#]*", "")
    host = F.lower(host)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    if strip_tracking:
        # mid/trailing params keep the preceding separator correct:
        # drop "&param=v"; then a leading "?param=v&" becomes "?";
        # then a lone "?param=v" disappears
        rest = F.regexp_replace(rest, r"&" + TRACKING_PARAMS + r"=[^&#]*", "")
        rest = F.regexp_replace(rest, r"\?" + TRACKING_PARAMS + r"=[^&#]*&", "?")
        rest = F.regexp_replace(rest, r"\?" + TRACKING_PARAMS + r"=[^&#]*$", "")
    rest = F.regexp_replace(rest, r"/+(\?|$)", "$1")  # trailing slashes
    return F.concat(host, rest)


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    *,
    id_col: str = "doc_id",
    strip_tracking: bool = True,
) -> DataFrame:
    """URL-canonical dedup: one row per normalized URL, the survivor
    being the smallest id (the deterministic min-id convention every
    dedup operator here uses). Adds ``norm_url`` and ``n_url_dups``.

    Shape: normalize in the scan (codegen), one keyed aggregation
    picking (min id, count), then a join back on the id — the
    exact-dedup shape of ``dedup_exact`` keyed on the URL instead of
    the content hash. The aggregation key is the md5-folded 8-byte
    hash of the normalized URL (the house fingerprint every keyed
    dedup operator uses — at 100 TB the shuffle carries (8 bytes, id)
    instead of ~100-byte URL strings); ``norm_url`` itself is
    recomputed on the surviving row, so the string never shuffles."""
    from syzgydb_spark.functions.text import md5_long

    norm = url_normalize(F.col(url_col), strip_tracking=strip_tracking)
    keyed = df.withColumn("_uk", md5_long(norm))
    reps = keyed.groupBy("_uk").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).cast("long").alias("n_url_dups"),
    )
    return (
        keyed.join(reps.select(id_col, "n_url_dups"), id_col, "inner")
        .withColumn("norm_url", norm)
        .drop("_uk")
    )


def filter_blocklist(
    df: DataFrame,
    blocked_domains,
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose registrable domain is blocklisted — the
    UT1-style domain filter crawl pipelines apply first (cf. RefinedWeb,
    Penedo et al. 2023 §3.1). ``blocked_domains`` is a Python list or a
    1-column DataFrame; either way the list side broadcasts and the
    filter is a broadcast LEFT ANTI join (or a codegen IN for a literal
    list ≤ 1000) — never a shuffle of the corpus. Adds ``domain``."""
    dom = registered_domain(url_host(F.col(url_col)))
    out = df.withColumn("domain", dom)
    if isinstance(blocked_domains, DataFrame):
        bcol = blocked_domains.columns[0]
        blk = blocked_domains.select(F.col(bcol).alias("domain")).distinct()
        return out.join(F.broadcast(blk), "domain", "left_anti")
    blocked = sorted({str(d) for d in blocked_domains})
    if len(blocked) <= 1000:
        return out.where(~F.col("domain").isin(blocked))
    spark = df.sparkSession
    blk = spark.createDataFrame([(d,) for d in blocked], ["domain"])
    return out.join(F.broadcast(blk), "domain", "left_anti")


def per_domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registrable domain,
    smallest-id first — the crawl-pipeline guard against any one site
    dominating the corpus (cf. Gopher's per-domain document caps, Rae
    et al. 2021 §A1). Adds ``domain`` and ``domain_rank``.

    Shape: domain key in the scan, one rank window partitioned by
    domain. Hot domains (the reason this operator exists) make that
    window skewed by construction, but the adjacent ``rank <= cap``
    filter lets Spark ≥3.5 insert ``WindowGroupLimit Partial`` — a
    map-side per-domain bounded heap BEFORE the exchange, so a hot
    domain ships ≤ cap rows per input partition, never its full row
    set (plan-asserted in tests; see operators/skew.py for the
    explicit portable form and the measurement)."""
    from pyspark.sql import Window

    dom = registered_domain(url_host(F.col(url_col)))
    w = Window.partitionBy("domain").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("domain", dom)
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .where(F.col("domain_rank") <= int(cap))
    )
