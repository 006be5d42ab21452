"""Batch sessionization + conversation/transcript profiling.

The streaming path (`streaming/incremental.py`) sessionizes with
`applyInPandasWithState`; this is the batch counterpart for backfill over
historical event logs: split each actor's event stream into sessions at
inactivity gaps > `gap_sec`, the standard web/agent-analytics segmentation.

All time arithmetic is exact integer MICROSECONDS (`unix_micros`; DuckDB
`epoch_us`) — never float epoch seconds, whose floor/round behavior differs
across engines at microsecond precision.

Shape: ONE shuffle keyed by the actor id serves both the lag window (gap
detection) and the session-index running sum (a second window over the same
partitioning — Spark reuses the exchange, the sort extends it); per-session
aggregation then groups by (actor, session_idx), a superset key clustered
by the same exchange. No Python anywhere.

At 10^12 events the skew risk is a hyperactive actor (bot) whose single
partition holds its whole history; sessions of one actor are inherently
sequential (each session index depends on every prior gap), so the window
cannot split — cap actor history upstream (`sampling.quota_sample` by
actor) or bucket actors by (actor, day) if day boundaries may cut sessions.
That trade is documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _us(ts_col: str) -> F.Column:
    """Exact epoch microseconds. Parquet timestamps load as TIMESTAMP_NTZ;
    the NTZ->instant cast interprets wall time in the session timezone,
    which get_spark pins to UTC — matching DuckDB's epoch_us on the same
    naive value, DST-free."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_sec: int = 1800,
) -> DataFrame:
    """Add `session_idx` (0-based per actor) splitting at inactivity gaps
    > gap_sec, and `gap_us_prev` (microseconds since the previous event,
    null for the actor's first). Deterministic total order:
    (ts, *order_cols)."""
    w = Window.partitionBy(actor_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    gap = _us(ts_col) - F.lag(_us(ts_col)).over(w)
    is_new = F.when(gap > gap_sec * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    return (
        events.withColumn("gap_us_prev", gap)
        .withColumn(
            "session_idx",
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )


def session_stats(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_sec: int = 1800,
) -> DataFrame:
    """Per-session aggregates: n_events, start/end ts, duration_us."""
    s = sessionize(events, actor_col, ts_col, order_cols, gap_sec)
    us = _us(ts_col)
    return s.groupBy(actor_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def conversation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-conversation profile: n_turns, n_types (distinct), span_us,
    max_gap_us between consecutive turns (null for 1-turn convs) — the
    health/shape stats a transcript-corpus triage starts from. Same
    single-exchange shape as sessionize."""
    w = Window.partitionBy(conv_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    us = _us(ts_col)
    gap = us - F.lag(us).over(w)
    return (
        turns.withColumn("__gap", gap)
        .groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct(type_col).alias("n_types"),
            (F.max(_us(ts_col)) - F.min(_us(ts_col))).alias(
                "span_us"
            ),
            F.max("__gap").alias("max_gap_us"),
        )
    )
