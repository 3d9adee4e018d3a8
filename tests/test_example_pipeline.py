"""The examples/pretrain_pipeline.py composition must keep running end
to end: every stage is an operator with its own tests, but the
composition pins cross-operator column contracts (clean_text→text
renames, left_semi id joins, plan→rates hand-off) that no unit test
sees. Also dogfoods plans.assert_scalable on the composed stages."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from examples.pretrain_pipeline import build_corpus


def test_pretrain_pipeline_end_to_end(spark, sf_dir, tmp_path):
    counts = build_corpus(
        spark, sf_dir, str(tmp_path / "corpus"), n_shards=2,
        token_budget=20_000, domain_cap=20,
    )
    stages = [
        "input", "blocklist", "url_dedup", "domain_cap", "c4_clean",
        "line_dedup", "dedup_exact", "near_dedup", "entropy",
        "gopher", "lm_cut", "decontaminated", "mixture",
    ]
    # monotone non-increasing survivors, nothing empties the corpus
    vals = [counts[s] for s in stages]
    assert vals == sorted(vals, reverse=True), counts
    assert counts["mixture"] > 0
    # the web front actually fired: blocklisted domain gone, caps bind
    assert counts["blocklist"] < counts["input"]
    assert counts["domain_cap"] < counts["url_dedup"]
    # near-dedup and quality gates actually fired on this corpus
    assert counts["near_dedup"] < counts["dedup_exact"]
    assert counts["gopher"] < counts["near_dedup"]
    assert counts["lm_cut"] < counts["gopher"]
    # the mixture stage cut to the token budget
    assert counts["mixture"] < counts["decontaminated"]
    # splits partition the mixture output
    assert counts["train"] + counts["val"] + counts["test"] == counts["mixture"]
    # the Bloom handoff store has no false negatives on its own corpus
    assert counts["bloom_store_hits"] == counts["mixture"]
    # shard layout on disk: shard=N dirs under train
    shard_dirs = [
        d for d in os.listdir(tmp_path / "corpus" / "train") if d.startswith("shard=")
    ]
    assert len(shard_dirs) == 2
