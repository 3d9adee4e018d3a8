"""End-to-end pretraining-corpus build — every stage a real 100 TB
pipeline runs, composed from this engine's operators, over the
driver's synthetic `documents` table.

    web front (domain blocklist → URL-canonical dedup → per-domain
    caps → HTML→text extraction) → clean (C4 rules) → corpus-wide
    line dedup → exact dedup → MinHash near-dedup (transitive groups,
    keep the BEST exemplar) → character-entropy floor → Gopher
    quality gate → bigram-LM perplexity cut → benchmark
    decontamination → mixture sampling → LEAKAGE-SAFE train/val/test
    split (near-dup clusters never straddle splits) →
    internally-shuffled shard write → Bloom-store handoff for the
    next incremental crawl

Run directly (defaults to sf0.001):

    python examples/pretrain_pipeline.py [sf_dir] [out_dir]

Each stage is lazy; the per-stage counts reported at the end are the
only actions besides the shard write. Scale notes: every stage here
is one of the operators whose shuffle inventory is documented in
docs/SCALE.md — nothing in this composition adds a shuffle beyond
the member operators' own.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from syzgydb_spark.operators import dedup as DD
from syzgydb_spark.operators import quality as Q
from syzgydb_spark.operators.contamination import decontaminate
from syzgydb_spark.operators.sharding import leakage_safe_split, write_shards


def build_corpus(
    spark,
    sf_dir: str,
    out_dir: str,
    *,
    mixture_weights: dict[str, float] | None = None,
    token_budget: int = 20_000,
    n_shards: int = 4,
    lm_cut_quantile: float = 0.9,
    domain_cap: int = 1_000_000,
    seed: int = 42,
) -> dict:
    """Run the full build; returns per-stage surviving-doc counts."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    counts = {"input": docs.count()}

    # 0. web-acquisition front: the fixture is plain text, so dress it
    #    as a crawl the way the contract queries do — a deterministic
    #    URL per doc and the text wrapped in markup — then run the
    #    standard opening passes: UT1-style domain blocklist (codegen
    #    IN), URL-canonical dedup (scheme/www/tracking variants
    #    collapse before any content work), per-domain caps, and the
    #    regex-tier HTML→text extraction. All zero-Python; the only
    #    shuffles are the dedup's (norm_url, id) agg and the capped
    #    rank window (WindowGroupLimit-bounded).
    from syzgydb_spark.functions.html import strip_html
    from syzgydb_spark.functions.url import (
        dedup_by_url,
        filter_blocklist,
        per_domain_cap,
    )

    crawl = docs.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("http://www.")).otherwise(
                F.lit("https://")
            ),
            F.col("source"),
            F.lit(".com/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=f")).otherwise(
                F.lit("")
            ),
        ),
    ).withColumn(
        "html",
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ),
    )
    crawl = filter_blocklist(crawl, ["src0.com"])
    counts["blocklist"] = crawl.count()
    crawl = dedup_by_url(crawl)
    counts["url_dedup"] = crawl.count()
    crawl = per_domain_cap(crawl, cap=domain_cap, id_col="doc_id")
    counts["domain_cap"] = crawl.count()
    docs = crawl.select(
        "doc_id", strip_html("html").alias("text"), "lang", "source"
    )

    # 1. C4 page flags: drop lorem-ipsum / code pages (zero shuffle).
    #    The synthetic corpus carries no sentence punctuation, so the
    #    terminal-punct LINE rule would empty it — on a web crawl you
    #    would also gate on `keep` and take `clean_text`; here we gate
    #    on the page-level flags and keep the raw text (each rule
    #    outcome ships individually precisely so a pipeline can pick
    #    its gate).
    flags = Q.c4_clean(docs, min_line_words=3, min_sentences=1).where(
        "ok_no_lorem AND ok_no_brace"
    )
    cleaned = docs.join(flags.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "text", "lang", "source"
    )
    counts["c4_clean"] = cleaned.count()

    # 2. corpus-wide line dedup (boilerplate removal); drop docs whose
    #    text is emptied entirely
    lined = (
        DD.line_dedup(cleaned, min_count=4, min_line_chars=15)
        .where(F.length("clean_text") > 0)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(cleaned.select("doc_id", "lang", "source"), "doc_id")
    )
    counts["line_dedup"] = lined.count()

    # 3. exact dedup (content fingerprint, keep min id). Materialize:
    #    everything downstream (minhash fit, keep_best, entropy,
    #    gopher, two LM fits, BPE) acts on this relation, and each
    #    stage's count/fit would otherwise re-execute the whole
    #    html→line-dedup→exact chain per action (measured: the stage
    #    counts dominated the example's wall before the checkpoints)
    exact = DD.dedup_exact(lined).localCheckpoint(eager=False)
    counts["dedup_exact"] = exact.count()

    # 4. MinHash near-dedup: pairs → transitive groups → keep the BEST
    #    exemplar of each component (longest text, ties → min id) —
    #    keep_best's aggregation-only argmax, not an arbitrary member.
    #    The pairs relation is reused by the leakage-safe split below
    #    (stage 9), so the LSH work is paid once.
    pairs = DD.minhash_near_duplicates(
        exact, num_hashes=64, bands=16, shingle_n=3, threshold=0.8, seed=seed
    ).localCheckpoint(eager=False)
    keepers = DD.keep_best(exact, pairs, F.length("text")).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    near = exact.join(keepers, "doc_id", "left_semi")
    counts["near_dedup"] = near.count()

    # 4.5 character-entropy floor: keyboard mash / padding sits at the
    #     low tail (Arrow Counter kernel, zero shuffle). The synthetic
    #     corpus is uniformly prose-like, so the floor is set just
    #     under its observed minimum — on a web crawl this gate bites.
    from syzgydb_spark.functions.text import char_entropy

    near = near.where(char_entropy("text") >= 2.0)
    counts["entropy"] = near.count()

    # 5. Gopher quality gate (zero shuffle; thresholds relaxed to the
    #    synthetic corpus: short docs and a vocabulary that carries
    #    only one of the canonical 8 stopwords)
    passed = (
        Q.gopher_filters(near, min_words=5, max_words=100_000, min_stopwords=1)
        .where("passes")
        .select("doc_id")
    )
    # materialized: the LM stage alone runs 4+ actions over it (two
    # model fits, the perplexity quantile, the keep join)
    quality = near.join(passed, "doc_id", "left_semi").localCheckpoint(
        eager=False)
    counts["gopher"] = quality.count()

    # 6. interpolated bigram-LM perplexity cut: fit on the surviving
    #    corpus, drop the worst (1 - quantile) tail. The bigram term
    #    scores word ORDER (word salad sits at its unigram ceiling;
    #    fluent text earns the bigram discount) — the same cut a
    #    unigram model makes, strictly sharper.
    lm = Q.unigram_lm(quality)
    bi = Q.bigram_lm(quality)
    scored = Q.bigram_perplexity(quality, bi, lm)
    cut = scored.approxQuantile("logppl", [lm_cut_quantile], 0.01)[0]
    keep_ids = scored.where(F.col("logppl") <= cut).select("doc_id")
    lm_kept = quality.join(keep_ids, "doc_id", "left_semi")
    counts["lm_cut"] = lm_kept.count()

    # 7. benchmark decontamination vs a mock eval set (every 97th doc)
    eval_set = docs.where("doc_id % 97 = 0").select("doc_id", "text")
    decon = decontaminate(lm_kept, eval_set, n=8, min_overlap=1)
    counts["decontaminated"] = decon.count()

    # 8. mixture sampling to the token budget — budgeted in REAL
    #    model tokens: fit a subword vocabulary (BPE) on the surviving
    #    corpus and count wordpiece tokens, instead of the whitespace
    #    proxy. The fit is one bounded word-count aggregation; the
    #    apply is a zero-shuffle map.
    from syzgydb_spark.operators.tokenizer import fit_bpe_vocab, tokenize

    # materialize the surviving corpus once: the vocab fit, the
    # mixture aggregation, the sampling pass, and the count below
    # each act on it, and without this the whole upstream chain (and
    # the Python segmenter) would re-execute per action (the
    # cluster_balanced_sample pattern)
    decon = decon.localCheckpoint(eager=False)
    vocab = fit_bpe_vocab(decon, n_merges=60, min_count=2)
    decon_tok = tokenize(decon, vocab).localCheckpoint(eager=False)
    weights = mixture_weights or {"src0": 3.0, "src1": 2.0}
    plan = Q.mixture_plan(
        decon_tok, weights, token_budget, default_weight=1.0,
        token_count_col="wp_tokens_count",
    )
    mixed = Q.apply_mixture(decon_tok, plan, seed=seed).drop(
        "wp_tokens", "wp_tokens_count"
    )
    counts["mixture"] = mixed.count()

    # 9. LEAKAGE-SAFE deterministic split + internally-shuffled train
    #    shards: split membership is keyed on the near-dup CLUSTER id
    #    (stage 4's pairs, already checkpointed), so a test document's
    #    training twin cannot leak eval signal; edge-free docs split
    #    exactly as plain hash_split would
    split = leakage_safe_split(
        mixed, pairs, {"train": 0.9, "val": 0.05, "test": 0.05}, seed=seed
    ).drop("group_id")
    train = split.where("split = 'train'").drop("split")
    write_shards(train, os.path.join(out_dir, "train"), n_shards=n_shards, seed=seed)
    split.where("split = 'val'").drop("split").write.mode("overwrite").parquet(
        os.path.join(out_dir, "val")
    )
    split.where("split = 'test'").drop("split").write.mode("overwrite").parquet(
        os.path.join(out_dir, "test")
    )
    counts["train"] = spark.read.parquet(os.path.join(out_dir, "train")).count()
    counts["val"] = spark.read.parquet(os.path.join(out_dir, "val")).count()
    counts["test"] = spark.read.parquet(os.path.join(out_dir, "test")).count()

    # 10. incremental-ingestion handoff: fold the shipped corpus's
    #     normalized-text keys into a Bloom store next to the shards.
    #     The NEXT crawl probes this store first (zero access to this
    #     corpus) and ships only definitely-new documents into the
    #     exact/near-dedup stages — the 100 TB front-door. As a check,
    #     probe the shipped corpus against its own store: every doc
    #     must hit (Bloom filters have no false negatives).
    from syzgydb_spark.functions.text import normalized_text
    from syzgydb_spark.operators.bloom import (
        build_bloom_store,
        probe_bloom_store,
    )

    bloom_path = os.path.join(out_dir, "_bloom_store")
    build_bloom_store(
        mixed, normalized_text("text"), bloom_path, n_bits=1 << 18, n_hashes=5
    )
    hits = (
        probe_bloom_store(mixed, bloom_path, normalized_text("text"))
        .where("bloom_hit")
        .count()
    )
    counts["bloom_store_hits"] = hits
    return counts


if __name__ == "__main__":
    from syzgydb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pretrain_corpus"
    spark = get_spark(app_name="pretrain-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for stage, n in build_corpus(spark, sf_dir, out_dir).items():
        print(f"{stage:16s} {n}")
