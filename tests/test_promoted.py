"""Hot-path metadata promotion on schemaless collections
(Collection.promote_paths): conformance vs the unpromoted variant
path, pushdown plan proof, staleness on update, and validation."""

import json

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.collection import Collection, CollectionOptions

DOCS = [
    (1, {"age": 30, "status": "active", "info": {"city": "oslo"}}),
    (2, {"age": 17, "status": "idle", "info": {"city": "lima"}}),
    (3, {"age": "thirty", "status": "active"}),          # type mismatch
    (4, {"status": None, "info": {"city": "oslo"}}),     # absent age, null status
    (5, {"age": 64.5, "status": "active", "extra": [1, 2]}),
    (6, {"age": 30, "info": "not-an-object"}),           # mid-path non-object
    (7, None),                                           # null metadata
]

FILTERS = [
    "age > 20",
    "age == 30",
    "age >= 17 AND status == 'active'",
    "status == 'active' OR age < 18",
    "age IN [30, 64.5]",
    "status CONTAINS 'act'",
    "info.city == 'oslo'",
    "info.city STARTS_WITH 'o' AND age EXISTS",
    "NOT (age > 20)",          # NOT contributes no hint
    "age != 30",               # != contributes no hint
    "extra.length > 1",        # unpromoted path, promoted mixed out
    "status == 'active' AND extra.length > 1",
]


def _mk(spark, path, promote):
    c = Collection.create(
        spark,
        str(path),
        CollectionOptions(name="p", dimension_count=2, n_buckets=4),
    )
    c.add_documents(
        [
            (i, [float(i), 0.0], json.dumps(m) if m is not None else "not json")
            for i, m in DOCS
        ]
    )
    if promote:
        c.promote_paths(
            {"age": "double", "status": "string", "info.city": "string"}
        )
    return c


def test_promoted_conformance_matches_unpromoted(spark, tmp_path):
    """Every filter — promoted conjuncts, unpromoted paths, and mixes —
    returns exactly the same rows as the plain variant evaluation on
    an unpromoted twin (the hint is conservative: it may only narrow
    the scan, never the result)."""
    plain = _mk(spark, tmp_path / "plain", promote=False)
    promo = _mk(spark, tmp_path / "promo", promote=True)
    wants = {}
    for f in FILTERS:
        want = sorted(r["id"] for r in plain.search(filter=f).collect())
        got = sorted(r["id"] for r in promo.search(filter=f).collect())
        assert got == want, (f, got, want)
        wants[f] = want
    # and through the predicate path used by search_many/pq tiers —
    # all 12 predicates evaluated in ONE job (same Columns, 12 fewer
    # Spark actions; the per-filter search() actions above stay
    # per-filter because search IS the path under test there)
    preds = promo.df().select(
        "id", *[promo._filter_pred(f).alias(f"f{i}")
                for i, f in enumerate(FILTERS)]
    ).collect()
    for i, f in enumerate(FILTERS):
        got2 = sorted(r["id"] for r in preds if r[f"f{i}"])
        assert got2 == wants[f], (f, got2, wants[f])


def test_promoted_pushdown_reaches_scan(spark, tmp_path):
    """The point of promotion: a promoted conjunct shows up in the
    parquet scan's PushedFilters through search(filter=...)."""
    promo = _mk(spark, tmp_path / "promo", promote=True)
    df = promo.search([1.0, 0.0], k=3, filter="age > 20", precision="exact")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("_pv" in ln and "GreaterThan" in ln for ln in pushed), pushed


def test_promoted_survives_update_and_reopen(spark, tmp_path):
    """update_metadata recomputes the promoted columns (a stale value
    would wrongly exclude the updated row), and the promotion persists
    across reopen."""
    promo = _mk(spark, tmp_path / "promo", promote=True)
    promo.update_metadata(2, json.dumps({"age": 99, "status": "active"}))
    got = sorted(r["id"] for r in promo.search(filter="age > 90").collect())
    assert got == [2]

    re = Collection.open(spark, str(tmp_path / "promo"))
    assert re.options.promoted is not None
    got = sorted(r["id"] for r in re.search(filter="age > 90").collect())
    assert got == [2]
    # new writes maintain the columns
    re.add_documents([(8, [8.0, 0.0], json.dumps({"age": 95}))])
    got = sorted(r["id"] for r in re.search(filter="age > 90").collect())
    assert got == [2, 8]


def test_promote_paths_validation(spark, tmp_path):
    plain = _mk(spark, tmp_path / "plain", promote=False)
    with pytest.raises(Exception, match="unpromotable path"):
        plain.promote_paths({"a[0]": "double"})
    with pytest.raises(ValueError, match="unpromotable type"):
        plain.promote_paths({"age": "bigint"})

    typed = Collection.create(
        spark,
        str(tmp_path / "typed"),
        CollectionOptions(
            name="t", dimension_count=2, metadata_schema="age DOUBLE"
        ),
    )
    with pytest.raises(ValueError, match="schemaless"):
        typed.promote_paths({"age": "double"})
