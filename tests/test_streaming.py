"""Structured Streaming: windowed aggregation with watermark over the
events fixture, and streaming upsert into a Collection — both driven
deterministically with availableNow triggers."""

import shutil

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.collection import Collection, CollectionOptions
from syzgydb_spark.streaming.ingest import (
    read_events_stream,
    stream_into_collection,
    windowed_event_counts,
)


@pytest.fixture()
def events_dir(sf_dir, tmp_path):
    """File streaming sources need a directory, not a single file."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_event_counts(spark, sf_dir, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts").collect()
    assert len(got) > 0
    # batch oracle: same agg on the same data
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    want = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .count()
    )
    assert len(got) == want
    assert sum(r["n_events"] for r in got) == ev.count()


def test_stream_into_collection(spark, sf_dir, events_dir, tmp_path):
    opts = CollectionOptions(name="stream", dimension_count=3)
    coll = Collection.create(spark, str(tmp_path / "coll"), opts)

    # stream the events fixture, turning each event into a document
    stream = read_events_stream(spark, events_dir)
    docs = stream.select(
        F.col("event_id").alias("id"),
        F.array(F.col("value"), F.col("user_id").cast("double"), F.lit(1.0)).alias("vector"),
        F.col("props").alias("metadata"),
    )
    q = stream_into_collection(
        docs, coll, checkpoint=str(tmp_path / "ckpt2"), available_now=True
    )
    q.awaitTermination(180)

    n_events = spark.read.format("parquet").schema(
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).load(f"{sf_dir}/events.parquet").count()
    assert coll.count() == n_events
    # searchable immediately
    res = coll.search([50.0, 75.0, 1.0], k=5, precision="exact").collect()
    assert len(res) == 5


def test_stream_seq_col_last_write_wins(spark, tmp_path):
    """In-batch duplicates resolve by the explicit sequence column
    (highest wins) — event order, not partition layout."""
    opts = CollectionOptions(name="seq", dimension_count=2)
    coll = Collection.create(spark, str(tmp_path / "seqcoll"), opts)
    src = str(tmp_path / "seqsrc")
    rows = [
        (1, [1.0, 0.0], '{"v": "old"}', 100),
        (1, [2.0, 0.0], '{"v": "new"}', 200),   # higher seq must win
        (2, [3.0, 0.0], '{"v": "only"}', 50),
    ]
    spark.createDataFrame(
        rows, "id BIGINT, vector ARRAY<DOUBLE>, metadata STRING, seq BIGINT"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "id BIGINT, vector ARRAY<DOUBLE>, metadata STRING, seq BIGINT"
    ).parquet(src)
    q = stream_into_collection(
        stream, coll, seq_col="seq",
        checkpoint=str(tmp_path / "ckpt3"), available_now=True,
    )
    q.awaitTermination(120)
    assert coll.count() == 2
    import json as _json

    assert _json.loads(coll.get(1)["metadata"]) == {"v": "new"}
    assert coll.get(1)["vector"] == [2.0, 0.0]


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Duplicate texts in later micro-batches are dropped; the first
    occurrence survives. Two files + maxFilesPerTrigger=1 → two
    batches, so the dedup state must carry across batches."""
    from syzgydb_spark.streaming.ingest import streaming_dedup

    d = tmp_path / "docs_stream"
    d.mkdir()
    b1 = spark.createDataFrame(
        [(1, "alpha text", 1_000_000), (2, "beta text", 2_000_000)],
        "doc_id LONG, text STRING, ts_us LONG",
    )
    b2 = spark.createDataFrame(
        [(3, "ALPHA   text", 3_000_000), (4, "gamma text", 4_000_000)],
        "doc_id LONG, text STRING, ts_us LONG",
    )
    b1.coalesce(1).write.parquet(str(d / "f1.parquet"))
    b2.coalesce(1).write.parquet(str(d / "f2.parquet"))

    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, ts_us LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = streaming_dedup(stream, text_col="text", ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_stream").collect())
    # docs 1 and 3 share a normalized fingerprint and land in DIFFERENT
    # micro-batches (one file each): exactly one of them survives —
    # whichever batch ran first — proving the dedup state carries
    # across batches. (File pickup order isn't guaranteed, so the test
    # accepts either winner.)
    assert len(got) == 3 and {2, 4} <= set(got)
    assert (1 in got) != (3 in got)
    assert "ts" in out.columns and "_fp" not in out.columns


def _mk_doc_batch(spark, rows, src_dir, name):
    """Write one real parquet FILE into the stream source dir (the file
    source lists files; a df.write directory would be invisible)."""
    import glob
    import os

    tmp = os.path.join(src_dir, "_tmp")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp)


def test_streaming_near_dedup(spark, tmp_path):
    """Cross-batch MinHash near-dup: batch 2's near-copy of a batch-1
    survivor is dropped via the persisted signature corpus; within-batch
    near-copies drop against the earlier (lower-id) member."""
    from syzgydb_spark.streaming.ingest import streaming_near_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pelicans watch from the old wooden pier near the harbor "
        "wall at dawn every single day of the long summer"
    )
    other = (
        "completely different material about distributed query engines "
        "partitioning shuffle exchange broadcast joins adaptive execution "
        "and columnar storage formats for analytical workloads at scale"
    )
    third = (
        "a third unrelated document describing mountain weather patterns "
        "snowfall accumulation wind speed measurements and avalanche risk "
        "assessment procedures for backcountry skiing expeditions"
    )
    near = lambda t: t.replace("seventeen", "nineteen", 1).replace(
        "snowfall", "rainfall", 1
    ).replace("broadcast", "shuffled", 1)

    src = tmp_path / "src"
    src.mkdir()
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _mk_doc_batch(
        spark, [(1, base), (2, near(base)), (3, other)], str(src), "b1.parquet"
    )
    _mk_doc_batch(
        spark, [(4, near(base)), (5, third), (6, near(third))], str(src), "b2.parquet"
    )

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir, state_dir = str(tmp_path / "out"), str(tmp_path / "state")
    q = streaming_near_dedup(
        stream,
        out_dir=out_dir,
        state_dir=state_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # 2 drops within batch 1 (near-dup of 1); 4 drops against the
    # corpus (near-dup of 1, accepted in batch 1); 6 drops within
    # batch 2 (near-dup of 5)
    assert got == {1, 3, 5}

    # the signature store holds exactly the survivors
    hs_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "state" / "hs")).collect()
    }
    assert hs_ids == {1, 3, 5}


def test_compact_near_dedup_state(spark, tmp_path):
    """Compaction folds the per-batch signature dirs into one; a
    subsequent stream run still drops near-dups against the
    consolidated corpus."""
    from syzgydb_spark.streaming.ingest import (
        compact_near_dedup_state,
        streaming_near_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pelicans watch from the old wooden pier near the harbor"
    )
    other = (
        "completely different material about distributed query engines "
        "partitioning shuffle exchange broadcast joins adaptive execution"
    )
    src = tmp_path / "src"
    src.mkdir()
    _mk_doc_batch(spark, [(1, base)], str(src), "b1.parquet")
    _mk_doc_batch(spark, [(2, other)], str(src), "b2.parquet")
    out_dir, state_dir = str(tmp_path / "out"), str(tmp_path / "state")

    def run():
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = streaming_near_dedup(
            stream, out_dir=out_dir, state_dir=state_dir,
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

    run()
    # the NEWEST batch is never folded (it may still replay after a
    # crash and must keep excluding its own signatures by batch id):
    # two batches → exactly one folds
    assert compact_near_dedup_state(spark, state_dir) == 1
    import os

    assert sorted(os.listdir(str(tmp_path / "state" / "hs"))) == [
        "batch=-1", "batch=1",
    ]

    # a near-copy arriving after compaction still drops; a new doc passes
    _mk_doc_batch(
        spark,
        [(3, base.replace("seventeen", "nineteen", 1)),
         (4, "entirely new text about mountain weather and snowfall "
             "accumulation measurements for backcountry avalanche work")],
        str(src), "b3.parquet",
    )
    run()
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 2, 4}
    # compacting a single partition is a no-op
    assert compact_near_dedup_state(spark, state_dir) in (0, 1, 2)


def test_streaming_session_stats_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """The streaming session_window partitioning agrees with the batch
    lag/cumsum sessionization: same number of sessions per user, same
    total events."""
    from syzgydb_spark.streaming.ingest import streaming_session_stats
    from syzgydb_spark.operators.temporal import sessionize

    stream = read_events_stream(spark, events_dir)
    agg = streaming_session_stats(stream, gap="6 hours", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").collect()
    assert len(got) > 0
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    batch = sessionize(ev, key="user_id", ts="ts", gap="6 hours")
    batch_sessions = batch.groupBy("user_id").agg(F.max("session_seq").alias("n"))
    stream_sessions = {}
    for r in got:
        stream_sessions[r["user_id"]] = stream_sessions.get(r["user_id"], 0) + 1
    for r in batch_sessions.collect():
        assert stream_sessions[r["user_id"]] == r["n"], r["user_id"]
    assert sum(r["n_events"] for r in got) == ev.count()


def test_streaming_line_dedup_across_batches(spark, tmp_path):
    """A boilerplate line reaching min_count across micro-batches is
    cut from the batch that crosses the threshold and all later ones;
    earlier batches keep their already-committed output (forward-only
    contract)."""
    from syzgydb_spark.streaming.ingest import streaming_line_dedup

    boiler = "subscribe to the newsletter for weekly updates"
    d = tmp_path / "line_src"
    d.mkdir()
    _mk_doc_batch(
        spark,
        [(1, f"first doc real content line\n{boiler}")],
        str(d), "b1.parquet",
    )
    _mk_doc_batch(
        spark,
        [(2, f"{boiler}\nsecond doc fresh content line"),
         (3, "third doc unrelated content")],
        str(d), "b2.parquet",
    )
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out_dir = str(tmp_path / "line_out")
    state_dir = str(tmp_path / "line_state")
    q = streaming_line_dedup(
        stream, out_dir=out_dir, state_dir=state_dir,
        min_count=2, min_line_chars=15,
        checkpoint=str(tmp_path / "ckpt_line"),
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(out_dir + "/batch=*").collect()
    }
    assert set(got) == {1, 2, 3}
    # batch order is file-pickup order; whichever doc (1 or 2) arrived
    # second had cumulative count 2 → its boiler line was cut; the
    # first keeps it (forward-only)
    kept_boiler = [i for i in (1, 2) if boiler in got[i]["clean_text"]]
    cut_boiler = [i for i in (1, 2) if boiler not in got[i]["clean_text"]]
    assert len(kept_boiler) == 1 and len(cut_boiler) == 1
    assert got[cut_boiler[0]]["n_removed_lines"] == 1
    assert got[3]["clean_text"] == "third doc unrelated content"


def test_streaming_near_dedup_replay_idempotent(spark, tmp_path):
    """Checkpoint-restart replay: re-running a micro-batch whose state
    delta was already committed must reproduce its original output —
    the batch's own persisted signatures must NOT make its docs
    self-match and vanish (regression: the corpus read now excludes
    the current batch id)."""
    from syzgydb_spark.streaming.ingest import streaming_near_dedup

    d = tmp_path / "replay_src"
    d.mkdir()
    _mk_doc_batch(
        spark,
        [(1, "some document text that is long enough to shingle well"),
         (2, "a completely different second document body here")],
        str(d), "b1.parquet",
    )
    out_dir = str(tmp_path / "replay_out")
    state_dir = str(tmp_path / "replay_state")

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .parquet(str(d) + "/*")
        )
        q = streaming_near_dedup(
            stream, out_dir=out_dir, state_dir=state_dir,
            shingle_n=2, threshold=0.5, checkpoint=ckpt,
        )
        q.awaitTermination(180)

    run(str(tmp_path / "ckpt1"))
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir + "/batch=*").collect()
    )
    assert first == [1, 2]
    # fresh checkpoint → the same single file replays as batch 0 with
    # batch 0's state already on disk
    run(str(tmp_path / "ckpt2"))
    again = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir + "/batch=*").collect()
    )
    assert again == first, "replayed batch dropped its own docs"


def test_streaming_near_dedup_signature_mode(spark, tmp_path):
    """state_mode='signature': same decisions as exact mode on clear
    near-dups, but the persisted state is the num_hashes-component
    signature — O(docs x num_hashes) constants, never the shingle
    sets (which grow with the text)."""
    from syzgydb_spark.streaming.ingest import (
        compact_near_dedup_state,
        streaming_near_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy pelicans watch from the old wooden pier near the harbor "
        "wall at dawn every single day of the long summer"
    )
    other = (
        "completely different material about distributed query engines "
        "partitioning shuffle exchange broadcast joins adaptive execution "
        "and columnar storage formats for analytical workloads at scale"
    )
    third = (
        "a third unrelated document describing mountain weather patterns "
        "snowfall accumulation wind speed measurements and avalanche risk "
        "assessment procedures for backcountry skiing expeditions"
    )
    near = lambda t: t.replace("seventeen", "nineteen", 1).replace(
        "snowfall", "rainfall", 1
    ).replace("broadcast", "shuffled", 1)

    src = tmp_path / "src"
    src.mkdir()
    _mk_doc_batch(
        spark, [(1, base), (2, near(base)), (3, other)], str(src), "b1.parquet"
    )
    _mk_doc_batch(
        spark, [(4, near(base)), (5, third), (6, near(third))], str(src), "b2.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir, state_dir = str(tmp_path / "out"), str(tmp_path / "state")
    q = streaming_near_dedup(
        stream,
        out_dir=out_dir,
        state_dir=state_dir,
        checkpoint=str(tmp_path / "ckpt"),
        state_mode="signature",
        num_hashes=64,
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 3, 5}  # same as exact mode on these clear dups

    # state bound: sig/ store only, num_hashes longs per doc, NO
    # shingle sets anywhere
    import os

    assert os.path.isdir(os.path.join(state_dir, "sig"))
    assert not os.path.isdir(os.path.join(state_dir, "hs"))
    st = spark.read.parquet(os.path.join(state_dir, "sig"))
    assert "hs" not in st.columns
    rows = st.collect()
    assert {r["doc_id"] for r in rows} == {1, 3, 5}
    assert all(len(r["sig"]) == 64 for r in rows)

    # compaction handles the signature layout too
    assert compact_near_dedup_state(spark, state_dir) >= 1

    with pytest.raises(ValueError, match="state_mode"):
        streaming_near_dedup(
            stream, out_dir=out_dir, state_dir=state_dir, state_mode="bogus"
        )


def test_signature_verify_recall_differential(spark):
    """Quantify the exact-vs-estimate trade on a planted similarity
    spectrum: pairs well above the threshold are caught by BOTH
    verifiers; every disagreement sits in the MinHash estimator's
    noise band around the threshold (|J - t| <~ 3*sqrt(t(1-t)/H))."""
    from syzgydb_spark.operators.dedup import (
        _dup_ids_against,
        _dup_ids_against_sig,
        _minhash_keyed,
        _minhash_sig_keyed,
    )

    words = [f"w{i}" for i in range(60)]
    docs = []
    # doc 2i = base doc, doc 2i+1 = copy with i words replaced
    # (overlap decays as i grows: a spectrum across the threshold)
    for i in range(25):
        base_words = [words[(i * 7 + j) % 60] for j in range(40)]
        mod = list(base_words)
        for k in range(i):
            mod[(k * 5) % 40] = f"x{i}_{k}"
        docs.append((2 * i, " ".join(base_words)))
        docs.append((2 * i + 1, " ".join(mod)))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")

    kw = dict(num_hashes=64, bands=16, shingle_n=3, seed=42,
              hash_fn="xxhash64", impl="arrow")
    t = 0.7
    hs, bd = _minhash_keyed(df, "text", "doc_id", **kw)
    exact = {
        r["doc_id"]
        for r in _dup_ids_against(hs, bd, hs, bd, "doc_id", t,
                                  earlier_only=True).collect()
    }
    sig, sbd = _minhash_sig_keyed(df, "text", "doc_id", **kw)
    est = {
        r["doc_id"]
        for r in _dup_ids_against_sig(sig, sbd, sig, sbd, "doc_id", t,
                                      earlier_only=True).collect()
    }
    # python oracle: true jaccard over 3-gram shingles for ALL pairs
    # (the generated bases overlap each other too, by construction of
    # the shared word pool — the oracle must see every pair, not just
    # the planted ones)
    def shingles(t_):
        ws = t_.split()
        return {" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)}

    sets = {d: shingles(txt) for d, txt in docs}
    max_j = {}  # doc -> max jaccard against any EARLIER doc
    for d in sets:
        js = [
            len(sets[d] & sets[e]) / len(sets[d] | sets[e])
            for e in sets
            if e < d
        ]
        max_j[d] = max(js) if js else 0.0

    clear = {d for d, j in max_j.items() if j >= 0.85}
    assert clear, "spectrum must contain clear dups"
    assert clear <= exact and clear <= est  # both catch clear dups
    # every disagreement sits in the estimator's noise band around the
    # threshold: its best earlier match is a borderline pair
    noise = 3 * (t * (1 - t) / 64) ** 0.5  # ±0.17 at H=64
    for d in exact.symmetric_difference(est):
        assert abs(max_j[d] - t) <= noise, (d, max_j[d])
    # the modes agree on the vast majority of the spectrum
    both, either = len(exact & est), len(exact | est)
    assert either == 0 or both / either >= 0.7, (exact, est)


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Streaming decontamination is the batch operator applied per
    micro-batch against the static eval relation: the union of cleaned
    batches equals the batch decontaminate of the union — and the
    contaminated doc is dropped in whichever batch it arrives."""
    from syzgydb_spark.operators.contamination import decontaminate
    from syzgydb_spark.streaming.ingest import streaming_decontaminate

    leak = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows_b1 = [
        (1, f"clean document about spark partitions and shuffles {('x ' * 8)}"),
        (2, f"benchmark leak here: {leak}"),
    ]
    rows_b2 = [
        (3, "another clean training document with enough words to tokenize fine"),
        (4, f"second leak, reformatted:   {leak.upper()}"),
    ]
    eval_rows = [(100, leak)]
    evald = spark.createDataFrame(eval_rows, "doc_id BIGINT, text STRING")

    d = tmp_path / "decon_src"
    d.mkdir()
    _mk_doc_batch(spark, rows_b1, str(d), "b1.parquet")
    _mk_doc_batch(spark, rows_b2, str(d), "b2.parquet")
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out_dir = str(tmp_path / "decon_out")
    q = streaming_decontaminate(
        stream, evald, out_dir=out_dir, n=8,
        checkpoint=str(tmp_path / "ckpt_decon"),
    )
    q.awaitTermination(180)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir + "/batch=*").collect()
    )
    # doc 2 shares 8-grams verbatim; doc 4's tokenization is case-
    # insensitive so the uppercase reformat is still caught
    assert got == [1, 3]
    batch_ids = sorted(
        r["doc_id"]
        for r in decontaminate(
            spark.createDataFrame(rows_b1 + rows_b2, "doc_id BIGINT, text STRING"),
            evald, n=8,
        ).collect()
    )
    assert got == batch_ids


def test_stream_domain_cap_matches_batch(spark, tmp_path):
    """stream_domain_cap with in-order arrival must accept exactly the
    batch per_domain_cap survivor set; cross-batch state holds the
    per-domain counters."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from syzgydb_spark.functions.url import per_domain_cap
    from syzgydb_spark.streaming.ingest import stream_domain_cap

    d = tmp_path / "in"
    d.mkdir()
    rows1 = [(i, f"https://{'hot' if i % 4 else 'cold'}.com/p{i}") for i in range(8)]
    rows2 = [(i, f"https://{'hot' if i % 4 else 'cold'}.com/p{i}") for i in range(8, 16)]

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "url": [r[1] for r in rows],
                }
            ),
            str(d / name),
        )

    write("f1.parquet", rows1)
    write("f2.parquet", rows2)
    now = time.time()
    os.utime(d / "f1.parquet", (now - 10, now - 10))
    os.utime(d / "f2.parquet", (now, now))

    stream = (
        spark.readStream.schema("doc_id BIGINT, url STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = stream_domain_cap(stream, 4)
    q = (
        out.writeStream.format("memory")
        .queryName("domcap_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["domain"])
        for r in spark.sql("SELECT * FROM domcap_out").collect()
    )
    batch = spark.createDataFrame(rows1 + rows2, ["doc_id", "url"])
    want = sorted(
        (r["doc_id"], r["domain"])
        for r in per_domain_cap(batch, 4, id_col="doc_id").collect()
    )
    assert got == want
    # the cap actually bound: hot.com has 12 docs, only 4 survive
    assert sum(1 for _, dom in got if dom == "hot.com") == 4
