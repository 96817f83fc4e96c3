"""Sessionization: split a per-key event stream into sessions at inactivity
gaps — the classic stateful window operator a transcript/event pipeline
needs (no counterpart in the reference, which validates static files; this
is a north-star training-data op).

Plan shape: ONE window partition per key — ``lag`` marks session starts
(gap > timeout), a running sum over the same window numbers them, then one
groupBy rolls sessions up. Two shuffles total (both on the key), no Python.
The same SQL runs on any engine, so the entry query is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    timeout_sec: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Tag every event with its session number (0-based per key).

    ``order_tiebreak`` (e.g. an event id) makes the ordering total when
    timestamps tie — required for cross-engine-stable session numbering.
    """
    # TIMESTAMP_NTZ won't cast straight to long; go through timestamp
    # (session TZ is UTC everywhere in this engine)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > timeout_sec), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(is_new).over(run) - 1)


def session_rollup(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    timeout_sec: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """(key, session_id, n_events, session_start, session_end,
    duration_sec) — one row per session."""
    s = sessionize(df, key_col, ts_col, timeout_sec, order_tiebreak)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("long"))
            - F.min(F.col(ts_col).cast("timestamp").cast("long"))
        ).alias("duration_sec"),
    )
