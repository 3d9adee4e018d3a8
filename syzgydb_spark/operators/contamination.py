"""Benchmark-decontamination operator for training-data pipelines.

The standard pre-training hygiene step (extends the reference's
surface; BASELINE.json's LLM-pipeline north star): find training
documents that share long word n-grams with an evaluation/benchmark
set, so they can be dropped or flagged before training.

Plan shape, designed for |train| ≫ |eval|:

* both sides explode to DISTINCT word-``n``-gram md5 hashes
  (ARRAY<BIGINT>-narrow: the gram strings never leave the doc row);
* the eval side — millions of grams at most, from thousands of eval
  documents — is ``broadcast()``, so the probe over the 100 TB train
  side is a map-side hash join: no shuffle of the train grams at all;
* matches aggregate per (train_id, eval_id) into overlap counts —
  keyed on ids, map-side combined.

A degenerate gram that appears in many EVAL docs multiplies every
matching train gram by that count, so eval grams above ``max_eval_df``
are dropped — with the dropped-gram count surfaced through
``observation`` (house rule: no silent caps). Common grams are exactly
the ones that don't indicate contamination, which is why the cap is on
document frequency in the eval set, the same reasoning as stop-shingle
caps in n-gram Jaccard dedup.

md5 hashing (not xxhash64) keeps every value DuckDB-reproducible for
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import md5_long, word_ngrams
from syzgydb_spark.operators.dedup import _spread


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    """(id, gram-hash) rows, distinct per document — the shared
    ``md5_long`` fold over each gram string, computed with Catalyst
    md5/conv inside codegen. The narrow (id, text) projection is
    spread to cluster parallelism first: a single-file scan would
    otherwise compute every gram hash on one core (no-op at scale,
    where scans already have ≥ cores splits)."""
    grams = F.array_distinct(word_ngrams(text_col, n))
    return _spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.transform(grams, md5_long)).alias("gh")
    )


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    n: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
    max_eval_df: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """Contaminated (train, eval) pairs: ``(train_id, eval_id,
    n_common)`` where the two documents share ``n_common ≥ min_overlap``
    distinct word-``n``-grams. Keep ``n`` long (8 is the common
    decontamination choice) — short grams match incidentally.

    ``eval_set`` is broadcast: the operator is a map-side probe of the
    train side, which therefore scales to any train size that scans.
    """
    tg = _gram_hashes(train, train_id, text_col, n).withColumnRenamed(
        train_id, "train_id"
    )
    eg = _gram_hashes(eval_set, eval_id, text_col, n).withColumnRenamed(
        eval_id, "eval_id"
    )

    # drop eval grams shared by too many eval docs (non-indicative),
    # surfacing how many gram values were cut
    df_per_gram = eg.groupBy("gh").agg(
        F.count("*").alias("eval_df"), F.collect_list("eval_id").alias("ids")
    )
    if observation is not None:
        df_per_gram = df_per_gram.observe(
            observation,
            F.coalesce(
                F.sum((F.col("eval_df") > max_eval_df).cast("long")), F.lit(0)
            ).alias("dropped_eval_grams"),
            F.count(F.lit(1)).alias("distinct_eval_grams"),
        )
        # AQE's empty-relation propagation erases the CollectMetrics
        # node when the cap filters everything out (empty downstream);
        # an eager localCheckpoint pins metric collection to this job.
        # Only paid when metrics were asked for; the checkpointed
        # relation is the (broadcast-small) eval gram index.
        df_per_gram = df_per_gram.localCheckpoint(eager=True)
    eg_kept = (
        df_per_gram.where(F.col("eval_df") <= max_eval_df)
        .select("gh", F.explode("ids").alias("eval_id"))
    )

    pairs = tg.join(F.broadcast(eg_kept), "gh").groupBy("train_id", "eval_id").agg(
        F.count("*").alias("n_common")
    )
    return pairs.where(F.col("n_common") >= min_overlap)


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    n: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
    max_eval_df: int = 1000,
) -> DataFrame:
    """Training set with contaminated documents removed — an anti-join
    of ``train`` against the flagged ids."""
    flagged = ngram_contamination(
        train,
        eval_set,
        n=n,
        train_id=train_id,
        eval_id=eval_id,
        text_col=text_col,
        min_overlap=min_overlap,
        max_eval_df=max_eval_df,
    ).select(F.col("train_id").alias(train_id)).distinct()
    return train.join(flagged, train_id, "left_anti")


def decontaminate_spans(
    train: DataFrame,
    eval_set: DataFrame,
    *,
    n: int = 8,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int | None = None,
) -> DataFrame:
    """SPAN-level decontamination: cut every maximal train token run
    whose ``n``-grams appear in the eval set, keeping the rest of the
    document — doc-level ``decontaminate`` throws away a whole long
    document for one quoted benchmark line; span surgery keeps it
    (the Lee et al. span-cut machinery with the cross-doc seed swapped
    for the broadcast eval-gram probe).

    Returns ``(id, clean_text, n_cut_spans)`` like
    ``remove_duplicate_spans`` (token-stream text). Default
    ``min_span_tokens = n``: any eval-overlapping run of at least one
    full gram is contamination — there is no keep-one-copy policy here,
    every flagged span is cut everywhere.

    Plan: positional train grams (narrow (id, pos, hash) rows) →
    map-side broadcast semi-join against the distinct eval grams →
    islands per doc → cut-range structs → one positional HOF filter.
    The train side never shuffles its grams; spans relation-sized
    everywhere; full token arrays ride only the final per-doc join."""
    from pyspark.sql import Window

    from syzgydb_spark.functions.text import word_tokens
    from syzgydb_spark.operators.dedup import _base_hash
    from syzgydb_spark.functions.text import ngrams_from_tokens

    if min_span_tokens is None:
        min_span_tokens = n
    src = _spread(train.select(F.col(train_id), F.col(text_col)))
    grams = src.select(
        F.col(train_id),
        F.posexplode(ngrams_from_tokens(word_tokens(text_col), n)).alias(
            "pos", "gram"
        ),
    ).select(train_id, "pos", _base_hash(F.col("gram"), "md5").alias("gh"))
    eg = (
        _gram_hashes(eval_set, eval_id, text_col, n)
        .select("gh")
        .distinct()
    )
    hit_pos = grams.join(F.broadcast(eg), "gh", "left_semi").select(train_id, "pos")

    w = Window.partitionBy(train_id).orderBy("pos")
    islands = hit_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = (
        islands.groupBy(train_id, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .where(F.col("span_tokens") >= min_span_tokens)
    )
    cuts = spans.groupBy(train_id).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_cuts"),
        F.count("*").alias("n_cut_spans"),
    )
    toks_df = train.select(F.col(train_id), word_tokens(text_col).alias("_toks"))
    kept_tokens = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_cuts",
            lambda c: (i >= c["span_start"]) & (i <= c["span_end"]),
        ),
    )
    return (
        toks_df.join(cuts, train_id, "left")
        .select(
            F.col(train_id),
            F.when(F.col("_cuts").isNull(), F.concat_ws(" ", "_toks"))
            .otherwise(F.concat_ws(" ", kept_tokens))
            .alias("clean_text"),
            F.coalesce("n_cut_spans", F.lit(0)).cast("long").alias("n_cut_spans"),
        )
    )
