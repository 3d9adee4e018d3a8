"""The examples/search_service.py composition must keep serving: the
collection (LSH + filter language) and the BM25 store compose into one
hybrid query whose cross-surface contracts (metadata JSON round-trip,
score column names, RRF input bounds) no unit test sees."""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from examples.search_service import build_service, serve


def test_search_service_end_to_end(spark, sf_dir, tmp_path):
    coll, store = build_service(spark, sf_dir, str(tmp_path / "svc"))
    qv = [
        float(x)
        for x in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where("vec_id = 0")
        .first()["embedding"]
    ]
    res = serve(
        spark, coll, store,
        query_text="table scan filter value",
        query_vector=qv,
        filter="lang IN ['en', 'de']",
        k_candidates=15, top=10,
    ).collect()
    assert 0 < len(res) <= 10
    # fused scores are descending and positive
    scores = [r["rrf_score"] for r in res]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
    # ANN-sourced hits respect the metadata filter (lex-only hits have
    # no metadata attached by construction)
    import json

    for r in res:
        if r["metadata"] is not None:
            assert json.loads(r["metadata"])["lang"] in ("en", "de")
    # both modalities contributed to the fused list: some hit carries
    # metadata (ANN side), and the fusion saw the lexical list too —
    # a pure-ANN list of 15 fused alone caps RRF at 1/(60+1)
    assert any(r["metadata"] is not None for r in res)
    assert scores[0] > 1.0 / 61 + 1e-9 or any(
        r["metadata"] is None for r in res
    )
