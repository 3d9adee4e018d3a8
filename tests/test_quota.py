"""Token-quota (mixture packing) operators: batch kernels, the pure
Catalyst prefix variant, and the stateful streaming operator with
quota state persisting across micro-batches."""

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.streaming.quota import (
    batch_token_quota,
    stream_token_quota,
    token_quota_prefix,
)

ROWS = [
    # (doc_id, source, n_tokens)
    (1, "a", 40),
    (2, "a", 40),
    (3, "a", 50),   # greedy: skipped (would overshoot 100), prefix: stops here
    (4, "a", 20),   # greedy: fits after skipping 3
    (5, "b", 90),
    (6, "b", 20),   # overshoots either way
]
SCHEMA = "doc_id long, source string, n_tokens long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_batch_greedy(docs):
    got = sorted(r["doc_id"] for r in batch_token_quota(docs, 100).collect())
    assert got == [1, 2, 4, 5]  # doc 3 skipped without consuming budget


def test_batch_prefix(docs):
    got = sorted(
        r["doc_id"] for r in batch_token_quota(docs, 100, mode="prefix").collect()
    )
    assert got == [1, 2, 5]  # doc 3 consumed budget, so doc 4 no longer fits


def test_prefix_catalyst_matches_kernel(docs):
    """token_quota_prefix vs the raw pandas metering kernel applied per
    stratum — an independent oracle (batch_token_quota prefix mode now
    delegates to token_quota_prefix, so it can't be the oracle)."""
    import pandas as pd

    from syzgydb_spark.streaming.quota import _make_meter

    catalyst = sorted(r["doc_id"] for r in token_quota_prefix(docs, 100).collect())
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "source", "n_tokens"])
    meter = _make_meter("doc_id", "n_tokens", 100, "prefix")
    kernel = sorted(
        int(i)
        for _, grp in pdf.groupby("source")
        for i in meter(grp, 0)[0]["doc_id"]
    )
    assert catalyst == kernel == [1, 2, 5]


def test_prefix_scales_past_one_task_per_stratum(spark):
    """The 100 TB contract (VERDICT r2 #3): with a multi-partition
    input the running sum must NOT collapse each stratum into a single
    window task — the window partitions on (stratum, range-bucket) and
    a driver-side prefix map stitches the buckets. Accepted set is
    identical to the naive one-task-per-stratum window."""
    rows = [(i, "src%d" % (i % 2), (i * 37) % 90 + 1) for i in range(4000)]
    docs = spark.createDataFrame(rows, SCHEMA).repartition(8)
    out = token_quota_prefix(docs, 40_000, num_buckets=8)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan, "window not partitioned by (stratum, bucket)"
    assert "FlatMapGroupsInPandas" not in plan

    # naive single-window oracle
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        r["doc_id"]
        for r in docs.withColumn("_r", F.sum("n_tokens").over(w))
        .where(F.col("_r") <= 40_000)
        .collect()
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == want and len(got) > 100


def test_prefix_is_codegen_window(docs):
    plan = (
        token_quota_prefix(docs, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    assert "FlatMapGroupsInPandas" not in plan  # no Python in this variant


def test_stream_quota_state_across_batches(spark, tmp_path):
    """File 1 eats most of each stratum's budget; file 2's rows must be
    metered against the REMEMBERED usage, proving state survives the
    micro-batch boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "in"
    d.mkdir()

    def write(name, rows):
        # plain single files: the file stream source lists files, not
        # Spark-written parquet directories
        ids, srcs, toks = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(srcs),
                    "n_tokens": pa.array(toks, pa.int64()),
                }
            ),
            str(d / name),
        )

    write("f1.parquet", [(1, "a", 60), (2, "b", 30)])
    write("f2.parquet", [(10, "a", 50), (11, "a", 30), (12, "b", 30)])
    # the file source orders micro-batches by modification time; under
    # load both writes can land in the same mtime tick — pin the order
    import os, time

    now = time.time()
    os.utime(d / "f1.parquet", (now - 10, now - 10))
    os.utime(d / "f2.parquet", (now, now))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = stream_token_quota(stream, 100)
    q = (
        out.writeStream.format("memory")
        .queryName("quota_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM quota_out").collect())
    # a: 60 used in batch 1 -> doc 10 (50) overshoots, doc 11 (30) fits
    # b: 30 used in batch 1 -> doc 12 (30) fits
    assert got == [1, 2, 11, 12]

    # batch oracle on the union in seq order gives the same accepted set
    all_rows = spark.createDataFrame(
        [(1, "a", 60), (2, "b", 30), (10, "a", 50), (11, "a", 30), (12, "b", 30)],
        SCHEMA,
    )
    want = sorted(r["doc_id"] for r in batch_token_quota(all_rows, 100).collect())
    assert got == want


# ---- property-based kernel invariants (no Spark jobs: pure pandas) ----

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pandas as pd

    from syzgydb_spark.streaming.quota import _make_meter

    @st.composite
    def _rows(draw):
        n = draw(st.integers(min_value=0, max_value=40))
        toks = draw(st.lists(st.integers(0, 200), min_size=n, max_size=n))
        return pd.DataFrame({"doc_id": range(n), "n_tokens": toks})

    @given(rows=_rows(), quota=st.integers(0, 2000))
    @settings(max_examples=200, deadline=None)
    def test_quota_kernel_invariants(rows, quota):
        greedy, used_g = _make_meter("doc_id", "n_tokens", quota, "greedy")(rows, 0)
        prefix, used_p = _make_meter("doc_id", "n_tokens", quota, "prefix")(rows, 0)
        # neither policy ever exceeds the quota in ACCEPTED tokens
        assert greedy["n_tokens"].sum() <= quota
        assert prefix["n_tokens"].sum() <= quota
        assert used_g == greedy["n_tokens"].sum()  # greedy budget = accepted
        assert used_p == rows["n_tokens"].sum()  # prefix consumes everything
        # prefix acceptance == cumulative-sum filter (the SQL definition)
        want_prefix = rows[rows["n_tokens"].cumsum() <= quota]
        assert list(prefix["doc_id"]) == list(want_prefix["doc_id"])
        # greedy dominates prefix: anything prefix accepts, greedy accepts
        assert set(want_prefix["doc_id"]) <= set(greedy["doc_id"])
except ImportError:  # pragma: no cover - hypothesis is baked in, but be safe
    pass


def test_prefix_boolean_and_null_strata(spark):
    """Offset-map keys are rendered by SPARK's cast on BOTH sides
    (regression: a Python f-string render gives 'True' where the
    lookup cast gives 'true', silently zeroing every cross-bucket
    offset so each bucket restarted the quota from zero). Boolean and
    NULL strata must meter exactly like string strata."""
    rows = [
        (i, i % 2 == 0 if i % 5 else None, 10) for i in range(2000)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source BOOLEAN, n_tokens LONG"
    ).repartition(8)
    out = token_quota_prefix(docs, 300, num_buckets=8)

    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        r["doc_id"]
        for r in docs.withColumn("_r", F.sum("n_tokens").over(w))
        .where(F.col("_r") <= 300)
        .collect()
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == want
    # each stratum (true/false/null) accepted exactly quota/10 docs
    per = out.groupBy("source").count().collect()
    assert {r["count"] for r in per} == {30}


def test_prefix_nondeterministic_source_snapshot(spark):
    """Both passes of the prefix scan must read ONE snapshot of the
    source (regression: pass 1's running-sum window ran over `docs`
    while the bucket-total offsets came from a checkpointed
    projection — a non-deterministic source then misaligned offsets
    against runs, over- or under-accepting around bucket boundaries).

    With rand()-valued tokens the accepted set per stratum is a
    contiguous seq-prefix ONLY if every pass saw the same token
    sample; a mismatch leaves holes (a rejected row followed by an
    accepted one in the same stratum)."""
    docs = (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("source"),
            (F.rand() * 100).cast("long").alias("n_tokens"),
        )
        .repartition(8)
    )
    out = token_quota_prefix(docs, 17_000, num_buckets=8)
    accepted = sorted(
        (r["source"], r["doc_id"]) for r in out.select("source", "doc_id").collect()
    )
    # some strata must actually hit the quota for the test to bite
    per = {}
    for s, d in accepted:
        per.setdefault(s, []).append(d)
    assert any(len(v) < 1000 for v in per.values())
    for s, ids in per.items():
        stratum_ids = sorted(range(int(s), 3000, 3))
        assert ids == stratum_ids[: len(ids)], f"hole in stratum {s}"
