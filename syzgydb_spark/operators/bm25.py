"""BM25 keyword search over a document table.

The reference searches vectors only; a training-data / retrieval
pipeline also needs lexical search (mining, contamination audits,
hybrid retrieval next to the ANN operators). Okapi BM25 (Robertson &
Zaragoza 2009):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf / (tf + k1·(1 - b + b·|d|/avgdl))

Scale shape: one explode over the documents (map-side), term counts by
(doc, term) groupBy, and ONLY the query's terms survive past the first
filter — document frequencies and scores touch |q| terms' posting
rows, never the full vocabulary. The corpus constants (N, avgdl)
travel as a broadcast single-row relation, not a driver collect, so
the whole query is one job. Ranking ends in the same
TakeOrderedAndProject shape as the vector top-k.

For repeated queries, ``bm25_index`` persists the posting/stat
relations once; ``bm25_score`` then runs against them without
re-tokenizing the corpus (the LSH-signature pattern applied to text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from syzgydb_spark.functions.text import word_tokens


def bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(postings, stats): ``postings`` = (id, term, tf, dl) — one row
    per distinct term per doc; ``stats`` = single row (n_docs, avgdl).
    Persist both (e.g. ``save_bucketed`` on term) to serve many queries
    from one tokenization pass."""
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl derives from tf (Σ tf per doc), NOT from a second pass over
    # the tokens: both branches then share one identical explode+agg
    # subplan, which Spark executes once (ReusedExchange) — the corpus
    # is tokenized exactly one time
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = tf.join(dl, id_col)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return postings, stats


def bm25_score(
    postings: DataFrame,
    stats: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` (id, score) for a query string against a prebuilt
    index. Ties break ascending id, like the vector search paths."""
    qterms = sorted(
        {t for t in _tokenize_query(query) if t}
    )
    if not qterms:
        # schema must match the non-empty path exactly — derive the id
        # type from the postings (ids are not necessarily LONG)
        id_type = postings.schema[id_col].dataType.simpleString()
        return postings.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, score DOUBLE"
        )
    # query-term-sized slice of the postings, consumed twice (per-term
    # df + scoring join); lazy persist stops the second consumer from
    # re-deriving the postings lineage — for an on-the-fly index (the
    # entry query) that would be a second full tokenize+explode over
    # the corpus. persist keeps the lineage (fault-tolerant), unlike
    # a checkpoint.
    from pyspark.storagelevel import StorageLevel

    matched = postings.where(F.col("term").isin(qterms)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    df_t = matched.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    scored = (
        matched.join(F.broadcast(df_t), "term")
        # single-row corpus constants: a broadcast product with a
        # 1-row side is the standard constants-join shape (compiles to
        # BroadcastNestedLoopJoin, but |right| = 1 — cost is a row
        # append per partition, nothing quadratic; the plan-quality
        # gate allowlists exactly this documented case)
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("score"))
    )
    from syzgydb_spark.cache import own_cached

    return own_cached(
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k),
        matched,
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One-shot convenience: build the index relations inline and
    score. For repeated queries build ``bm25_index`` once instead."""
    postings, stats = bm25_index(docs, text_col, id_col)
    return bm25_score(
        postings, stats, query, id_col=id_col, k=k, k1=k1, b=b
    )


def build_bm25_store(
    docs: DataFrame,
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist the BM25 index as the SERVING layout: postings bucketed
    and sorted on ``term`` (table ``{table}_postings``) plus the 1-row
    corpus-constants table (``{table}_stats``). One tokenization pass
    at build time; afterwards every query's scoring plan reads only
    the probed terms' buckets with NO store-side Exchange — the
    per-term document-frequency aggregation lands on the bucketed
    layout, so only query-term-sized relations ever shuffle. This is
    the text sibling of the LSH/IVF signature columns: index cost paid
    once at write, not per query."""
    postings, stats = bm25_index(docs, text_col, id_col)
    from syzgydb_spark.sources.bucketed import clear_stale_location, save_bucketed

    save_bucketed(
        postings, f"{table}_postings", keys="term", buckets=buckets,
        sort="term", path=(f"{path}/postings" if path else None),
    )
    w = stats.write.format("parquet").mode("overwrite")
    if path:
        w = w.option("path", f"{path}/stats")
    else:
        clear_stale_location(docs.sparkSession, f"{table}_stats")
    w.saveAsTable(f"{table}_stats")


def read_bm25_store(spark, table: str) -> tuple[DataFrame, DataFrame]:
    """(postings, stats) read back WITH the bucket layout (read through
    the catalog; a path read would lose it and re-shuffle)."""
    from syzgydb_spark.sources.bucketed import read_bucketed

    return read_bucketed(spark, f"{table}_postings"), spark.table(f"{table}_stats")


def reciprocal_rank_fusion(
    inputs,
    *,
    id_col: str = "doc_id",
    rrf_k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Fuse BOUNDED ranked candidate lists (e.g. a BM25 top-k and an
    ANN top-k) by reciprocal-rank fusion (Cormack et al. 2009):
    ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))``.

    ``inputs`` is a list of ``(df, order_col, ascending)`` — each df a
    ranked candidate list with ``id_col``. Ranks are assigned with a
    single-partition window, which is exactly right here and ONLY
    here: the inputs are already top-k truncated (bounded by
    construction), so the window sees k rows, not a table. Never feed
    an unbounded relation."""
    from pyspark.sql import Window

    scored = []
    for df, order_col, ascending in inputs:
        order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
        w = Window.orderBy(order, F.col(id_col).asc())
        scored.append(
            df.select(
                F.col(id_col),
                (1.0 / (rrf_k + F.row_number().over(w))).alias("_rrf"),
            )
        )
    u = scored[0]
    for s in scored[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(id_col)
        .agg(F.sum("_rrf").alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top)
    )


def _tokenize_query(query: str) -> list[str]:
    """Driver-side twin of functions.text.word_tokens (lowercase,
    split on non-letter/digit/apostrophe; Python's \\w adds '_', so
    underscores are normalized to separators first)."""
    import re

    return [t for t in re.split(r"[^\w']+", query.lower().replace("_", " ")) if t]
