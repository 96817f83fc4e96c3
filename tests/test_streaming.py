"""Streaming validation: file-source micro-batches through foreachBatch must
produce the same aggregate report as one batch run over the union."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.rules.model import ColumnAssignment
from ndap_data_validator_spark.streaming.validate_stream import validate_stream

ASSIGNS = [
    ColumnAssignment("loc", "Location"),
    ColumnAssignment("t", "Time"),
    ColumnAssignment("m", "Measures", "integer"),
]


def _batch(i: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "loc": [f"s{i}-{j}" if j != 1 else None for j in range(10)],
            "t": ["2021" if j != 2 else "Q1 bad" for j in range(10)],
            "m": [str(j) if j != 3 else "x" for j in range(10)],
        }
    )


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i in range(3):
        pdf = _batch(i)
        spark.createDataFrame(
            pdf.astype(object).where(pd.notna(pdf), None)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("loc string, t string, m string")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = validate_stream(
        stream,
        ASSIGNS,
        report_path=str(tmp_path / "rep"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    per_col = spark.read.parquet(str(tmp_path / "rep/per_column"))
    assert per_col.select("batch_id").distinct().count() == 3

    # fold per-batch counts and compare to one batch run over everything
    folded = {
        r["column"]: (r["nulls"], r["errs"])
        for r in per_col.groupBy("column")
        .agg(
            F.sum("nulls").alias("nulls"),
            F.sum("conversion_errors").alias("errs"),
        )
        .collect()
    }
    all_df = spark.read.parquet(src)
    batch = ValidationEngine().validate(all_df, ASSIGNS)
    expected = {
        r["column"]: (r["nulls"], r["conversion_errors"])
        for r in batch.per_column_report.collect()
    }
    assert folded == expected

    summary = spark.read.parquet(str(tmp_path / "rep/summary"))
    assert summary.count() == 3
    assert all(not r["passed"] for r in summary.collect())


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    """Watermarked tumbling windows over a file stream == batch windowing
    (no late data in the fixture, so nothing is dropped)."""
    from ndap_data_validator_spark.streaming.stateful import windowed_event_counts

    src = str(tmp_path / "wsrc")
    rows = [
        (i, ["click", "view"][i % 2], f"2026-01-01 00:{i:02d}:30")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts string").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("event_id long, event_type string, ts timestamp").parquet(src)
    out = windowed_event_counts(stream, window_duration="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (str(r["ws"]), r["event_type"]): r["n"]
        for r in df.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    # append mode only finalizes windows below the final watermark; every
    # emitted window must match the batch result exactly
    assert got and all(expected[k] == v for k, v in got.items())


def test_sessionize_stream_state_spans_batches(spark, tmp_path):
    """applyInPandasWithState sessions: state carries across micro-batches —
    events of one session split over two files still fold into ONE session."""
    from ndap_data_validator_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "ssrc")
    # user 1: one session split across files (gap 60s < timeout)
    # user 2: two sessions (gap 7200s > timeout), split across files
    f1 = [(1, "2026-01-01 00:00:00"), (1, "2026-01-01 00:01:00"),
          (2, "2026-01-01 00:00:00")]
    f2 = [(1, "2026-01-01 00:02:00"), (2, "2026-01-01 02:00:00")]
    for i, rows in enumerate([f1, f2]):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, timeout_sec=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_start, closed"
    ).collect()
    # user 1: the last open-session snapshot must span all 3 events
    u1 = [r for r in rows if r["user_id"] == 1 and not r["closed"]]
    assert u1[-1]["n_events"] == 3
    # user 2: first session closed with 1 event, second open with 1 event
    u2_closed = [r for r in rows if r["user_id"] == 2 and r["closed"]]
    assert len(u2_closed) == 1 and u2_closed[0]["n_events"] == 1
    u2_open = [r for r in rows if r["user_id"] == 2 and not r["closed"]]
    assert u2_open[-1]["n_events"] == 1
