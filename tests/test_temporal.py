"""Temporal operators (operators/temporal.py): as-of join semantics
(backward/forward, inclusive, left-join nulls, multi-key) against a
hand-computed fixture, plus the rollup's bucket alignment. The
end-to-end events-table forms are oracle-checked by the driver
(`events_asof_purchase`, `events_time_rollup` vs DuckDB ASOF JOIN /
time_bucket)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from syzgydb_spark.operators.temporal import asof_join, time_rollup


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01T10:00:05"), 100),
            (2, "A", ts("2024-01-01T10:00:10"), 200),
            (3, "B", ts("2024-01-01T10:00:03"), 300),
            (4, "C", ts("2024-01-01T10:00:07"), 400),  # no quotes at all
        ],
        "trade_id LONG, sym STRING, ts TIMESTAMP, qty LONG",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T10:00:01"), 10.0),
            ("A", ts("2024-01-01T10:00:05"), 11.0),  # exact-ts match
            ("A", ts("2024-01-01T10:00:09"), 12.0),
            ("B", ts("2024-01-01T10:00:04"), 20.0),  # after B's only trade
        ],
        "sym STRING, ts TIMESTAMP, px DOUBLE",
    )
    return trades, quotes


def test_asof_backward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["trade_id"]: r["px_r"]
        for r in asof_join(trades, quotes, on="sym", ts="ts").collect()
    }
    # trade 1 at :05 sees the :05 quote (inclusive), not :01
    assert out == {1: 11.0, 2: 12.0, 3: None, 4: None}


def test_asof_forward(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r["trade_id"]: r["px_r"]
        for r in asof_join(
            trades, quotes, on="sym", ts="ts", direction="forward"
        ).collect()
    }
    # forward: earliest quote at-or-after the trade
    assert out == {1: 11.0, 2: None, 3: 20.0, 4: None}


def test_asof_keeps_all_left_columns_and_rows(spark, quotes_trades):
    trades, quotes = quotes_trades
    res = asof_join(trades, quotes, on="sym", ts="ts")
    assert res.count() == trades.count()
    assert set(res.columns) == {"trade_id", "sym", "ts", "qty", "px_r"}


def test_asof_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "A", "x", ts("2024-01-01T00:00:10"))],
        "id LONG, k1 STRING, k2 STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("A", "x", ts("2024-01-01T00:00:05"), 1.0),
            ("A", "y", ts("2024-01-01T00:00:09"), 2.0),  # wrong k2
        ],
        "k1 STRING, k2 STRING, ts TIMESTAMP, v DOUBLE",
    )
    [row] = asof_join(left, right, on=["k1", "k2"], ts="ts").collect()
    assert row["v_r"] == 1.0


def test_asof_invalid_direction(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="sym", ts="ts", direction="sideways")


def test_time_rollup_alignment(spark):
    ev = spark.createDataFrame(
        [
            (ts("2024-01-01T00:30:00"), "a", 1.0),
            (ts("2024-01-01T23:59:59"), "a", 2.0),
            (ts("2024-01-02T00:00:00"), "a", 4.0),  # boundary → next day
            (ts("2024-01-02T12:00:00"), "b", 8.0),
        ],
        "ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    out = {
        (r["bucket_start"].isoformat(), r["event_type"]): (r["n"], r["s"])
        for r in time_rollup(
            ev,
            bucket="1 day",
            group_by=["event_type"],
            aggs={"n": F.count(F.lit(1)), "s": F.sum("value")},
        ).collect()
    }
    assert out == {
        ("2024-01-01T00:00:00", "a"): (2, 3.0),
        ("2024-01-02T00:00:00", "a"): (1, 4.0),
        ("2024-01-02T00:00:00", "b"): (1, 8.0),
    }


def test_asof_plan_single_shuffle_no_join(spark, quotes_trades):
    """The scale contract: no join operator at all (ergo no range
    explosion) — one Exchange on the key feeding a Window."""
    import io
    from contextlib import redirect_stdout

    trades, quotes = quotes_trades
    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(trades, quotes, on="sym", ts="ts").explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # union sides, same key
    assert "Window" in plan


def test_range_join_band_semantics(spark):
    from syzgydb_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, "A", ts("2024-01-01T00:10:00")), (2, "B", ts("2024-01-01T00:10:00"))],
        "id LONG, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T00:05:00"), 10),  # -5 min: in band
            ("A", ts("2024-01-01T00:15:00"), 11),  # +5 min: in band (inclusive)
            ("A", ts("2024-01-01T00:15:01"), 12),  # +5:01: out
            ("A", ts("2024-01-01T00:04:59"), 13),  # -5:01: out
            ("B", ts("2024-01-01T00:10:00"), 14),  # exact ts, key B
            ("A", ts("2024-01-01T00:10:00"), 15),  # exact ts, key A
        ],
        "k STRING, ts TIMESTAMP, v LONG",
    )
    five = 5 * 60 * 1_000_000
    out = range_join(
        left, right, on="k", ts="ts", lower_us=-five, upper_us=five
    ).collect()
    got = {(r["id"], r["v_r"]) for r in out}
    assert got == {(1, 10), (1, 11), (1, 15), (2, 14)}
    # every pair exactly once (bucket explode must not duplicate)
    assert len(out) == len(got)


def test_range_join_no_theta_join_in_plan(spark):
    """The scale contract: the join condition is pure equi (keys +
    bucket); the band bound is a post-join Filter, so no
    BroadcastNestedLoop/cartesian shape exists."""
    import io
    from contextlib import redirect_stdout

    from syzgydb_spark.operators.temporal import range_join

    left = spark.range(100).select(
        F.col("id"), F.lit("k").alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    right = spark.range(100).select(
        F.lit("k").alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").alias("v"),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        range_join(
            left, right, on="k", ts="ts", lower_us=-5_000_000, upper_us=5_000_000
        ).explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_invalid_band(spark):
    from syzgydb_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, "A", ts("2024-01-01T00:00:00"))],
                                 "id LONG, k STRING, ts TIMESTAMP")
    with pytest.raises(ValueError, match="upper_us"):
        range_join(left, left, on="k", ts="ts", lower_us=5, upper_us=5)


def test_asof_differential_vs_pandas(spark):
    """Randomized differential: asof_join(backward) must agree with
    pandas.merge_asof (the industry-reference semantics: per-key,
    backward, inclusive) on seeded random inputs with unique right
    (key, ts) pairs."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1234)
    for trial in range(5):
        n_l, n_r = rng.integers(1, 40), rng.integers(1, 40)
        lpd = pd.DataFrame(
            {
                "k": rng.integers(0, 4, n_l).astype(str),
                "t": rng.integers(0, 1000, n_l) * 1_000_000,
                "lid": np.arange(n_l),
            }
        )
        rpd = (
            pd.DataFrame(
                {
                    "k": rng.integers(0, 4, n_r).astype(str),
                    "t": rng.integers(0, 1000, n_r) * 1_000_000,
                    "v": rng.normal(size=n_r).round(6),
                }
            )
            .drop_duplicates(["k", "t"])
        )
        want_df = pd.merge_asof(
            lpd.assign(ts=pd.to_datetime(lpd.t, unit="us")).sort_values("ts"),
            rpd.assign(ts=pd.to_datetime(rpd.t, unit="us")).sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.v) else float(r.v))
            for r in want_df.itertuples()
        }

        left = spark.createDataFrame(
            lpd.assign(ts=pd.to_datetime(lpd.t, unit="us"))[["lid", "k", "ts"]]
        )
        right = spark.createDataFrame(
            rpd.assign(ts=pd.to_datetime(rpd.t, unit="us"))[["k", "ts", "v"]]
        )
        got = {
            r["lid"]: r["v_r"]
            for r in asof_join(left, right, on="k", ts="ts").collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_asof_null_payload_field_does_not_mix_rows(spark):
    """A matched right row with a NULL field must yield NULL for that
    field — never an older row's value (merge_asof semantics: all
    payload columns come from the same matched row)."""
    left = spark.createDataFrame(
        [(1, "A", ts("2024-01-01T00:00:10"))], "id LONG, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            ("A", ts("2024-01-01T00:00:01"), 1.0, "old"),
            ("A", ts("2024-01-01T00:00:05"), None, "new"),  # latest match
        ],
        "k STRING, ts TIMESTAMP, px DOUBLE, tag STRING",
    )
    [row] = asof_join(left, right, on="k", ts="ts").collect()
    assert row["tag_r"] == "new"
    assert row["px_r"] is None  # NOT 1.0 from the older row


def test_asof_bucketed_matches_plain(spark):
    """The hot-key bucketed form (bucket_us) must produce IDENTICAL
    results to the single-window form on random data, both directions —
    including matches that lie many buckets back."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(77)
    n_l, n_r = 120, 60
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_l).astype(str),  # few hot keys
            "ts": pd.to_datetime(rng.integers(0, 10_000, n_l) * 1_000_000, unit="us"),
            "lid": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_r).astype(str),
            # right rows clustered early so many left rows match across
            # bucket boundaries
            "ts": pd.to_datetime(rng.integers(0, 2_000, n_r) * 1_000_000, unit="us"),
            "v": rng.normal(size=n_r).round(6),
        }
    ).drop_duplicates(["k", "ts"])
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)

    for direction in ("backward", "forward"):
        plain = {
            r["lid"]: r["v_r"]
            for r in asof_join(
                left, right, on="k", ts="ts", direction=direction
            ).collect()
        }
        bucketed = {
            r["lid"]: r["v_r"]
            for r in asof_join(
                left, right, on="k", ts="ts", direction=direction,
                bucket_us=500_000_000,  # 500 s → ~20 buckets
            ).collect()
        }
        assert bucketed == plain, direction


def test_time_rollup_sliding(spark):
    """slide='30 minutes' over 1-hour buckets: each event counts in
    two overlapping windows."""
    ev = spark.createDataFrame(
        [(ts("2024-01-01T00:40:00"), 1.0), (ts("2024-01-01T00:50:00"), 2.0)],
        "ts TIMESTAMP, value DOUBLE",
    )
    out = {
        r["bucket_start"].isoformat(): r["n"]
        for r in time_rollup(ev, bucket="1 hour", slide="30 minutes").collect()
    }
    # both events fall in [00:00,01:00) and [00:30,01:30)
    assert out == {"2024-01-01T00:00:00": 2, "2024-01-01T00:30:00": 2}


def test_sessionize_planted_gaps(spark):
    from syzgydb_spark.operators.temporal import sessionize

    rows = [
        (1, 1, "2024-01-01 10:00:00"),
        (1, 2, "2024-01-01 10:10:00"),   # same session (10 min)
        (1, 3, "2024-01-01 11:00:00"),   # 50 min gap -> new session
        (1, 4, "2024-01-01 11:20:00"),   # same
        (2, 5, "2024-01-01 10:00:00"),   # other user: own counter
    ]
    df = spark.createDataFrame(rows, "user_id LONG, event_id LONG, ts STRING")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    res = sessionize(df, key="user_id", ts="ts", gap="30 minutes",
                     tie_break=["event_id"])
    seq = {r["event_id"]: r["session_seq"] for r in res.collect()}
    assert seq == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_boundary_exactly_gap(spark):
    """An interval of exactly the gap does NOT start a new session
    (strictly-greater comparison)."""
    from syzgydb_spark.operators.temporal import sessionize

    rows = [(1, 1, "2024-01-01 00:00:00"), (1, 2, "2024-01-01 00:30:00")]
    df = spark.createDataFrame(rows, "user_id LONG, event_id LONG, ts STRING")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    res = sessionize(df, key="user_id", ts="ts", gap="30 minutes")
    assert {r["session_seq"] for r in res.collect()} == {1}


def test_session_stats_rollup(spark):
    from syzgydb_spark.operators.temporal import session_stats
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 10:00:00", 5.0),
        (1, 2, "2024-01-01 10:10:00", 7.0),
        (1, 3, "2024-01-01 12:00:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    res = session_stats(
        df, key="user_id", ts="ts", gap="30 minutes",
        aggs=[F.sum("value").alias("sum_value")],
    ).orderBy("session_seq").collect()
    assert len(res) == 2
    first, second = res
    assert first["n_events"] == 2 and first["sum_value"] == 12.0
    assert first["duration_us"] == 600 * 1_000_000
    assert second["n_events"] == 1 and second["duration_us"] == 0


def test_sessionize_agrees_with_session_window(spark):
    """Differential: our lag/cumsum session count per user equals the
    count of Spark's own F.session_window groups on the same gap."""
    from pyspark.sql import functions as F
    from syzgydb_spark.operators.temporal import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ours = (
        sessionize(ev, key="user_id", ts="ts", gap="2 hours")
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("n"))
    )
    theirs = (
        ev.groupBy("user_id", F.session_window("ts", "2 hours"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    diff = (
        ours.alias("a").join(theirs.alias("b"), "user_id")
        .where(F.col("a.n") != F.col("b.n"))
    )
    assert diff.count() == 0


def test_sessionize_differential_vs_python(spark):
    """Randomized differential: the distributed lag/cumsum assignment
    equals a single-threaded Python reference on clumpy random data."""
    import random
    from datetime import datetime, timedelta

    rng = random.Random(1234)
    rows = []
    eid = 0
    for user in range(20):
        t = datetime(2024, 1, 1)
        for _ in range(rng.randint(0, 60)):
            # mixture of short intra-session steps and long gaps
            step = rng.choice([30, 90, 600, 1_900, 7_200, 90_000])
            t = t + timedelta(seconds=step)
            rows.append((user, eid, t))
            eid += 1
    df = spark.createDataFrame(rows, "user_id LONG, event_id LONG, ts TIMESTAMP")

    from syzgydb_spark.operators.temporal import sessionize

    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(
            df, key="user_id", ts="ts", gap="30 minutes", tie_break=["event_id"]
        ).collect()
    }

    want = {}
    by_user = {}
    for user, eid_, t in rows:
        by_user.setdefault(user, []).append((t, eid_))
    for user, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for t, eid_ in evs:
            if prev is None or (t - prev).total_seconds() > 1800:
                seq += 1
            want[eid_] = seq
            prev = t
    assert got == want
