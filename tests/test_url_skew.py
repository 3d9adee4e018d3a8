"""URL normalization/domain ops (functions/url.py) and skew-safe
two-stage aggregation shapes (operators/skew.py)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from syzgydb_spark.functions.text import word_tokens
from syzgydb_spark.functions.url import (
    dedup_by_url,
    per_domain_cap,
    registered_domain,
    url_host,
    url_normalize,
)
from syzgydb_spark.operators.skew import (
    histogram_quantiles,
    salted_topk,
    two_stage_distinct_count,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(url_normalize("url")).collect()]


def test_url_normalize_rules(spark):
    cases = {
        # scheme + www + trailing slash
        "https://www.Example.COM/path/": "example.com/path",
        "http://example.com/path": "example.com/path",
        # default ports stripped, non-default kept
        "https://example.com:443/a": "example.com/a",
        "http://example.com:8080/a": "example.com:8080/a",
        # fragment dropped
        "https://example.com/a#sec": "example.com/a",
        # tracking-only query loses its ?
        "https://example.com/a?utm_source=x": "example.com/a",
        # leading tracking param, kept param follows
        "https://example.com/a?utm_source=x&page=2": "example.com/a?page=2",
        # mid/trailing tracking params
        "https://example.com/a?page=2&gclid=abc": "example.com/a?page=2",
        "https://example.com/a?page=2&fbclid=1&q=3": "example.com/a?page=2&q=3",
        # path case preserved, host case folded
        "HTTPS://EXAMPLE.com/CaseSensitive": "example.com/CaseSensitive",
        # scheme-less input treated host-first
        "example.com/x/": "example.com/x",
        # root: trailing slash dropped like any other
        "https://example.com/": "example.com",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_url_normalize_keep_tracking(spark):
    df = spark.createDataFrame(
        [("https://a.com/x?utm_source=s",)], ["url"]
    ).select(url_normalize("url", strip_tracking=False).alias("n"))
    assert df.collect()[0][0] == "a.com/x?utm_source=s"


def test_url_host_and_registered_domain(spark):
    rows = [
        ("https://news.bbc.co.uk/story", "news.bbc.co.uk", "bbc.co.uk"),
        ("http://user:pw@Sub.Example.COM:8080/p", "sub.example.com", "example.com"),
        ("https://example.org", "example.org", "example.org"),
        ("https://a.b.gov.au/x?q=1", "a.b.gov.au", "b.gov.au"),
        ("plain.com/path", "plain.com", "plain.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], ["url"]).select(
        url_host("url").alias("h"),
        registered_domain(url_host("url")).alias("d"),
    )
    got = df.collect()
    for (u, h, d), r in zip(rows, got):
        assert r["h"] == h, u
        assert r["d"] == d, u


def test_dedup_by_url_min_id_survivor(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.a.com/x?utm_source=p"),
            (2, "http://a.com/x/"),
            (3, "https://a.com/y"),
            (4, "a.com/x"),
        ],
        ["doc_id", "url"],
    )
    out = dedup_by_url(df).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["n_url_dups"]) for r in out] == [(1, 3), (3, 1)]
    assert out[0]["norm_url"] == "a.com/x"


def test_per_domain_cap(spark):
    rows = [(i, f"https://{'hot' if i % 4 else 'cold'}.com/p{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = per_domain_cap(df, 5, id_col="doc_id")
    got = out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    ).collect()
    by_dom = {r["domain"]: (r["n"], r["mx"]) for r in got}
    # hot.com has 30 docs capped at 5 (smallest ids 1,2,3,5,6),
    # cold.com has 10 docs capped at 5 (0,4,8,12,16)
    assert by_dom["hot.com"] == (5, 6)
    assert by_dom["cold.com"] == (5, 16)


def test_url_normalize_metamorphic(spark):
    """Property sweep: every member of a URL's equivalence class —
    scheme toggled, www. added, host case flipped, default port added,
    tracking params injected (leading and trailing), fragment added,
    trailing slash added — normalizes to the SAME string, and
    normalization is idempotent. Seeded generation, one Spark job."""
    import random

    rng = random.Random(427)
    hosts = ["example.com", "a.b.co.uk", "x-y.org", "m.site.io"]
    paths = ["", "/p", "/p/q", "/P/Q9"]
    queries = ["", "?a=1", "?a=1&b=2"]
    cases = []
    for i in range(200):
        host = rng.choice(hosts)
        path = rng.choice(paths)
        q = rng.choice(queries)
        canon = f"https://{host}{path}{q}"
        # independently toggle every identity-preserving degree of
        # freedom, then assemble the variant from components
        v_scheme = rng.choice(["https://", "http://", ""])
        v_host = ("www." if rng.random() < 0.5 else "") + (
            host.upper() if rng.random() < 0.5 else host
        )
        v_port = rng.choice(["", ":443", ":80"])
        v_path = path + ("/" if rng.random() < 0.5 and not q else "")
        v_q = q
        if rng.random() < 0.5:
            track = rng.choice(["utm_source=x", "gclid=1", "fbclid=zz"])
            if not v_q:
                v_q = "?" + track
            elif rng.random() < 0.5:
                v_q = v_q + "&" + track
            else:  # leading position
                v_q = "?" + track + "&" + v_q[1:]
        v_frag = "#frag" + str(i) if rng.random() < 0.5 else ""
        variant = f"{v_scheme}{v_host}{v_port}{v_path}{v_q}{v_frag}"
        cases.append((canon, variant))
    df = spark.createDataFrame(cases, ["canon", "variant"])
    out = df.select(
        url_normalize("canon").alias("nc"),
        url_normalize("variant").alias("nv"),
        url_normalize(url_normalize("variant")).alias("nnv"),
    ).collect()
    for (canon, variant), r in zip(cases, out):
        assert r["nc"] == r["nv"], (canon, variant, r["nc"], r["nv"])
        assert r["nv"] == r["nnv"], ("not idempotent", variant, r["nv"], r["nnv"])


def test_filter_blocklist_list_and_df(spark):
    from syzgydb_spark.functions.url import filter_blocklist

    df = spark.createDataFrame(
        [
            (1, "https://www.bad.com/x"),
            (2, "https://news.bad.com/y"),
            (3, "https://good.com/z"),
            (4, "https://sub.evil.co.uk/w"),
        ],
        ["doc_id", "url"],
    )
    keep = sorted(
        r["doc_id"]
        for r in filter_blocklist(df, ["bad.com", "evil.co.uk"]).collect()
    )
    assert keep == [3]
    blk = spark.createDataFrame([("bad.com",)], ["d"])
    keep2 = sorted(r["doc_id"] for r in filter_blocklist(df, blk).collect())
    assert keep2 == [3, 4]
    # the DataFrame path must broadcast, not shuffle the corpus
    plan = (
        filter_blocklist(df, blk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_two_stage_distinct_count_matches_direct(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("source", F.explode(word_tokens("text")).alias("t"))
    got = {
        r["source"]: r["n_distinct"]
        for r in two_stage_distinct_count(toks, ["source"], "t").collect()
    }
    want = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("t").alias("n"))
        .collect()
    }
    assert got == want


def test_two_stage_distinct_count_nulls_not_counted(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("b", None)], ["k", "v"]
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in two_stage_distinct_count(df, ["k"], "v").collect()
    }
    # key b has only NULLs: COUNT(DISTINCT) semantics -> no row or 0;
    # stage 1 drops its rows entirely, so b is absent (same as SQL
    # GROUP BY over the non-null relation)
    assert got == {"a": 1}


@pytest.mark.parametrize("salt_on", [None, "term"])
def test_salted_topk_matches_direct_window(spark, sf_dir, salt_on):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select("lang", F.explode(word_tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    order = [F.col("c").desc(), F.col("term").asc()]
    got = sorted(
        (r["lang"], r["term"], r["c"], r["rank"])
        for r in salted_topk(
            counts, ["lang"], order, 7, n_salts=8, salt_on=salt_on
        ).collect()
    )
    w = Window.partitionBy("lang").orderBy(*order)
    want = sorted(
        (r["lang"], r["term"], r["c"], r["rank"])
        for r in counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 7)
        .collect()
    )
    assert got == want


def test_histogram_quantiles_type1_semantics(spark):
    """Against the hand-checkable definition: quantile(p) = smallest
    value whose cumulative count reaches ceil(N*p), on an explicit
    10-row key plus a 1-row key (degenerate N=1)."""
    rows = [("a", v) for v in [1, 2, 2, 3, 3, 3, 7, 8, 9, 10]] + [("z", 42)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {
        (r["k"], r["prob"]): r["value"]
        for r in histogram_quantiles(df, ["k"], "v", (0.1, 0.5, 1.0)).collect()
    }
    # N=10: ceil(1)=1 -> 1; ceil(5)=5 -> 3 (cum at 3 is 6); ceil(10) -> 10
    assert out[("a", 0.1)] == 1
    assert out[("a", 0.5)] == 3
    assert out[("a", 1.0)] == 10
    assert out[("z", 0.5)] == 42 and out[("z", 1.0)] == 42


def test_histogram_quantiles_matches_percentile_on_integers(spark, sf_dir):
    """On integer data, type-1 histogram quantiles must agree with
    percentile_disc-style selection: the returned value is an actual
    data value with CDF(value) >= p."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = histogram_quantiles(docs, ["lang"], "n_chars", (0.5,), precision=0)
    vals = docs.select("lang", "n_chars").collect()
    import math
    from collections import defaultdict

    by_lang = defaultdict(list)
    for r in vals:
        by_lang[r["lang"]].append(r["n_chars"])
    for r in got.collect():
        xs = sorted(by_lang[r["lang"]])
        want = xs[math.ceil(len(xs) * 0.5) - 1]
        assert r["value"] == want, (r["lang"], r["value"], want)


def test_histogram_quantiles_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 5.0), ("b", None)], ["k", "v"]
    )
    out = histogram_quantiles(df, ["k"], "v", (0.5,))
    got = [(r["k"], r["value"]) for r in out.collect()]
    assert got == [("a", 5.0)]  # all-null key absent
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_quantiles(df, ["k"], "v", (0.0, 0.5))


def test_histogram_quantiles_property_vs_reference(spark):
    """Seeded random sweep vs the Python type-1 definition
    (quantile(p) = sorted[ceil(N*p)-1]) across duplicate-heavy,
    negative, and single-value distributions and several keys."""
    import math
    import random

    rng = random.Random(427)
    rows = []
    for k in range(6):
        n = rng.randint(1, 60)
        vals = [rng.randint(-20, 20) for _ in range(n)]
        if k % 3 == 0:
            vals += [7] * rng.randint(5, 30)  # duplicate-heavy
        rows += [(f"k{k}", v) for v in vals]
    probs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        (r["k"], r["prob"]): r["value"]
        for r in histogram_quantiles(df, ["k"], "v", probs, precision=0).collect()
    }
    from collections import defaultdict

    by_k = defaultdict(list)
    for k, v in rows:
        by_k[k].append(v)
    for k, vals in by_k.items():
        xs = sorted(vals)
        for p in probs:
            want = xs[math.ceil(len(xs) * p) - 1]
            assert got[(k, p)] == want, (k, p, got[(k, p)], want)


def test_histogram_quantiles_no_per_key_sort_of_rows(spark):
    """The executed plan's only Sort inputs are the bounded histogram
    relation (grouped buckets), never the raw rows: assert the
    aggregation happens BELOW the first window sort."""
    df = spark.createDataFrame([("a", i % 7) for i in range(1000)], ["k", "v"])
    out = histogram_quantiles(df, ["k"], "v", (0.5, 0.9), precision=0)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # histogram agg present, and it feeds the window (Sort appears
    # after a HashAggregate in the tree dump order)
    assert "HashAggregate" in plan
    ci_sort = plan.find("Sort ")
    ci_agg = plan.rfind("HashAggregate")
    assert ci_sort != -1 and ci_agg > ci_sort


def test_native_rank_filter_is_group_limited(spark):
    """Regression gate for the skew finding (operators/skew.py module
    docs): Spark must keep planning keyed rank-filter windows with a
    PARTIAL WindowGroupLimit before the exchange — the map-side
    bounded heap that makes the plain window skew-safe and the reason
    the plan advisor does not flag it. Checked on per_domain_cap, the
    operator whose hot-domain input is the motivating case."""
    rows = [(i, f"https://{'hot' if i % 10 else 'c' + str(i)}.com/p") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = per_domain_cap(df, 5, id_col="doc_id")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_native_count_distinct_is_two_staged(spark):
    """Regression gate, same finding: groupBy(k).agg(countDistinct(v))
    must keep planning as the (k, v)-keyed partial dedup + two
    exchanges — no task ever holds a hot key's full distinct set, so
    two_stage_distinct_count stays an explicit spelling, not a fix."""
    df = spark.createDataFrame(
        [(i % 3, i % 17) for i in range(100)], ["k", "v"]
    )
    out = df.groupBy("k").agg(F.countDistinct("v").alias("n"))
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count(distinct" in plan, plan
    assert plan.count("Exchange") >= 2, plan


def test_salted_topk_stage1_bounds_tasks(spark):
    """The executed plan must contain TWO window nodes, the first
    partitioned on (key, salt) — the shape that bounds any task by
    rows-per-salt — and stage 2's input is capped at k*n_salts rows
    per key."""
    df = spark.createDataFrame(
        [(i, "k", float(i)) for i in range(1000)], ["id", "k", "v"]
    )
    out = salted_topk(
        df, ["k"], [F.col("v").desc(), F.col("id").asc()], 3, n_salts=4,
        salt_on="id",
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "_salt" in plan
    assert [r["id"] for r in out.orderBy("rank").collect()] == [999, 998, 997]
