"""Typed metadata collections: CollectionOptions.metadata_schema routes
search(filter=...) through the typed fast path (query/typed.py) —
conformance vs the variant path through the public Collection API, plan
quality (codegen, no variant, scan pushdown), and CRUD round-trips."""

import io
import json
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.collection import Collection, CollectionOptions

SCHEMA = (
    "category STRING, score DOUBLE, tags ARRAY<STRING>, "
    "nested STRUCT<k: BIGINT>"
)


def _docs(n=100):
    return [
        (
            i,
            [float(i % 7), float(i % 3), 1.0],
            json.dumps(
                {
                    "category": ["A", "B", "C"][i % 3],
                    "score": float(i),
                    "tags": [f"t{i % 2}", "x"],
                    "nested": {"k": i},
                }
            ),
        )
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def typed_coll(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("typed") / "coll")
    c = Collection.create(
        spark,
        path,
        CollectionOptions(name="t", dimension_count=3, metadata_schema=SCHEMA),
    )
    c.add_documents(_docs())
    return c


@pytest.fixture(scope="module")
def variant_coll(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("variant") / "coll")
    c = Collection.create(
        spark, path, CollectionOptions(name="v", dimension_count=3)
    )
    c.add_documents(_docs())
    return c


CONFORMANCE_QUERIES = [
    "category == 'A' AND score > 10",
    "category IN ['A', 'C'] OR score <= 3",
    "tags[0] == 't1'",
    "nested.k >= 50",
    "category CONTAINS 'B'",
    "category STARTS_WITH 'A'",
    "missing DOES NOT EXIST",
    "nested.missing > 1",
    "tags.length == 2",
    "LENGTH(category) == 1",
    "NOT (score < 50)",
    "ANY(tags[*] t == 'x')",
    "score CONTAINS 'x'",  # type error → every row dropped
    "category MATCHES '^[AB]$'",
    "score IN [1, 2, 99]",
]


def test_metadata_stored_as_struct(typed_coll):
    dt = typed_coll.df().schema["metadata"].dataType.simpleString()
    assert dt.startswith("struct<"), dt


def test_search_filter_conformance_vs_variant(typed_coll, variant_coll):
    """Same documents, same filter strings: the typed path through
    Collection.search must select exactly the rows the variant
    (reference-faithful) path selects."""
    for q in CONFORMANCE_QUERIES:
        typed_ids = {
            r["id"] for r in typed_coll.search(filter=q).select("id").collect()
        }
        variant_ids = {
            r["id"] for r in variant_coll.search(filter=q).select("id").collect()
        }
        assert typed_ids == variant_ids, (q, typed_ids ^ variant_ids)


def test_knn_search_with_typed_filter(typed_coll):
    res = typed_coll.search(
        [0.0, 0.0, 1.0], k=5, filter="category == 'A' AND score >= 9"
    ).collect()
    assert len(res) == 5
    assert all(r["metadata"]["category"] == "A" for r in res)
    assert all(r["metadata"]["score"] >= 9 for r in res)
    # results keep ascending distance order
    dists = [r["distance"] for r in res]
    assert dists == sorted(dists)


def test_typed_search_plan_codegen_and_pushdown(typed_coll):
    """The point of the fast path: no variant machinery in the plan,
    predicate in a codegen stage, pushable conjuncts at the scan."""
    out = typed_coll.search(filter="category == 'A' AND score > 50")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "variant" not in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "category" in pushed[0] and "score" in pushed[0], plan


def test_variant_search_plan_has_variant(variant_coll):
    """Sanity counterpoint: the schemaless path does use variant."""
    out = variant_coll.search(filter="category == 'A' AND score > 50")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "variant" in buf.getvalue().lower()


def test_crud_on_typed_collection(spark, tmp_path):
    path = str(tmp_path / "crud")
    c = Collection.create(
        spark,
        path,
        CollectionOptions(
            name="c", dimension_count=3, metadata_schema="lang STRING, n BIGINT"
        ),
    )
    c.add_documents(
        [
            (1, [1.0, 0.0, 0.0], json.dumps({"lang": "en", "n": 1})),
            (2, [0.0, 1.0, 0.0], json.dumps({"lang": "de", "n": 2})),
        ]
    )
    row = c.get(1)
    assert row["metadata"]["lang"] == "en" and row["metadata"]["n"] == 1

    # upsert overwrites
    c.add_documents([(1, [0.5, 0.5, 0.0], json.dumps({"lang": "fr", "n": 9}))])
    assert c.get(1)["metadata"]["lang"] == "fr"

    # metadata-only update parses into the declared type
    c.update_metadata(2, json.dumps({"lang": "es", "n": 7}))
    got = c.get(2)
    assert got["metadata"]["lang"] == "es" and got["metadata"]["n"] == 7
    # vector untouched by the metadata update
    assert [round(x) for x in got["vector"]] == [0, 1, 0]

    c.remove([1])
    assert c.count() == 1

    # reopen: metadata_schema persists through options.json
    c2 = Collection.open(spark, path)
    assert c2.metadata_type is not None
    assert {r["id"] for r in c2.search(filter="lang == 'es'").collect()} == {2}


def test_typed_with_lsh_index(spark, tmp_path):
    """The ANN pre-filter path compiles through the typed compiler."""
    import numpy as np

    rng = np.random.default_rng(7)
    path = str(tmp_path / "lsh_typed")
    c = Collection.create(
        spark,
        path,
        CollectionOptions(
            name="l",
            dimension_count=4,
            distance_method="cosine",
            metadata_schema="grp STRING",
            lsh={
                "dim": 4,
                "num_tables": 4,
                "num_planes": 6,
                "seed": 3,
                "method": "cosine",
                "bucket_width": 1.0,
            },
        ),
    )
    c.add_documents(
        [
            (i, rng.uniform(size=4).tolist(), json.dumps({"grp": ["x", "y"][i % 2]}))
            for i in range(500)
        ]
    )
    res = c.search([0.5, 0.5, 0.5, 0.5], k=5, filter="grp == 'x'").collect()
    assert len(res) == 5
    assert all(r["metadata"]["grp"] == "x" for r in res)


def test_map_metadata_schema(spark, tmp_path):
    path = str(tmp_path / "map_meta")
    c = Collection.create(
        spark,
        path,
        CollectionOptions(
            name="m", dimension_count=3, metadata_schema="MAP<STRING, DOUBLE>"
        ),
    )
    c.add_documents(
        [
            (1, [1.0, 0.0, 0.0], json.dumps({"a": 1.0})),
            (2, [0.0, 1.0, 0.0], json.dumps({"b": 2.0})),
        ]
    )
    # maps keep real key membership: absent key ≠ null value
    assert {r["id"] for r in c.search(filter="a DOES NOT EXIST").collect()} == {2}
    assert {r["id"] for r in c.search(filter="a >= 1").collect()} == {1}


def test_invalid_metadata_schema_rejected():
    with pytest.raises(ValueError, match="struct or map"):
        CollectionOptions(name="x", dimension_count=3, metadata_schema="STRING")
    with pytest.raises(ValueError, match="invalid metadata_schema"):
        CollectionOptions(name="x", dimension_count=3, metadata_schema="not a ( type")


def test_json_export_import_roundtrip_typed(spark, tmp_path):
    from syzgydb_spark.sources.json_io import export_json, import_json

    path = str(tmp_path / "src")
    c = Collection.create(
        spark,
        path,
        CollectionOptions(
            name="e", dimension_count=3, metadata_schema="lang STRING"
        ),
    )
    c.add_documents([(1, [1.0, 0.0, 0.0], json.dumps({"lang": "en"}))])
    dump = str(tmp_path / "dump.json")
    export_json(c, dump)
    doc = json.load(open(dump))
    assert doc["records"][0]["metadata"] == {"lang": "en"}
    assert doc["collection"]["metadata_schema"] == "lang STRING"

    c2 = import_json(spark, dump, str(tmp_path / "dst"))
    assert c2.metadata_type is not None
    assert c2.get(1)["metadata"]["lang"] == "en"


def test_jsonl_export_import_roundtrip_typed(spark, tmp_path):
    from syzgydb_spark.sources.json_io import export_jsonl, import_jsonl

    c = Collection.create(
        spark,
        str(tmp_path / "src"),
        CollectionOptions(
            name="j", dimension_count=3, metadata_schema="lang STRING, n BIGINT"
        ),
    )
    c.add_documents(
        [
            (1, [1.0, 0.0, 0.0], json.dumps({"lang": "en", "n": 5})),
            (2, [0.0, 1.0, 0.0], json.dumps({"lang": "de", "n": 7})),
        ]
    )
    dump = str(tmp_path / "dump")
    export_jsonl(c, dump)
    c2 = import_jsonl(spark, dump, str(tmp_path / "dst"))
    assert c2.metadata_type is not None and c2.count() == 2
    got = c2.get(2)
    assert got["metadata"]["lang"] == "de" and got["metadata"]["n"] == 7
    assert {r["id"] for r in c2.search(filter="n >= 6").collect()} == {2}
