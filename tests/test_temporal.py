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
