"""Batch sessionization: gap splits, ordering, exact microsecond math."""

from datetime import datetime

import pyspark.sql.functions as F

from ditto_spark.operators.sessions import (
    conversation_stats,
    session_stats,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, e, datetime.fromtimestamp(t), ty) for (u, e, t, ty) in rows],
        "user_id long, event_id long, ts timestamp, event_type string",
    )


def test_sessionize_splits_on_gap(spark):
    base = 1_700_000_000
    df = _events(
        spark,
        [
            (1, 1, base, "a"),
            (1, 2, base + 100, "b"),
            (1, 3, base + 100 + 1801, "a"),  # > 1800s after prev -> new session
            (1, 4, base + 100 + 1801 + 5, "c"),
            (2, 5, base, "a"),
        ],
    )
    out = {r["event_id"]: r for r in sessionize(df, gap_sec=1800).collect()}
    assert [out[i]["session_idx"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert out[5]["session_idx"] == 0
    assert out[2]["gap_us_prev"] == 100 * 1_000_000
    assert out[1]["gap_us_prev"] is None


def test_sessionize_boundary_gap_not_split(spark):
    base = 1_700_000_000
    df = _events(spark, [(1, 1, base, "a"), (1, 2, base + 1800, "a")])
    out = sessionize(df, gap_sec=1800).collect()
    assert {r["session_idx"] for r in out} == {0}  # strict >, not >=


def test_session_stats_duration(spark):
    base = 1_700_000_000
    df = _events(
        spark,
        [(1, 1, base, "a"), (1, 2, base + 60, "b"), (1, 3, base + 5000, "a")],
    )
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, gap_sec=1800).collect()
    }
    assert out[(1, 0)]["n_events"] == 2
    assert out[(1, 0)]["duration_us"] == 60 * 1_000_000
    assert out[(1, 1)]["n_events"] == 1 and out[(1, 1)]["duration_us"] == 0


def test_conversation_stats(spark):
    base = 1_700_000_000
    df = _events(
        spark,
        [(1, 1, base, "a"), (1, 2, base + 10, "b"), (1, 3, base + 15, "a"), (2, 4, base, "z")],
    )
    out = {r["user_id"]: r for r in conversation_stats(df, conv_col="user_id").collect()}
    assert out[1]["n_turns"] == 3 and out[1]["n_types"] == 2
    assert out[1]["span_us"] == 15 * 1_000_000
    assert out[1]["max_gap_us"] == 10 * 1_000_000
    assert out[2]["n_turns"] == 1 and out[2]["max_gap_us"] is None


def test_sessionize_single_exchange_plan(spark):
    base = 1_700_000_000
    df = _events(spark, [(1, 1, base, "a"), (1, 2, base + 1, "b")])
    plan = (
        session_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    # one actor-keyed shuffle serves lag window, running sum, and group-by
    assert plan.count("Exchange") <= 1, plan
