"""Streaming validation: file-source micro-batches through foreachBatch must
produce the same aggregate report as one batch run over the union."""

from __future__ import annotations

import pandas as pd
import pytest
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


def test_sessionize_stream_timeout_closes_and_evicts(spark, tmp_path):
    """ADVICE r02: a key that goes quiet must emit closed=true via the
    event-time timeout (watermark passes last_event + gap) and its state row
    must be evicted — no later event is needed to close the final session."""
    from ndap_data_validator_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "tosrc")
    # file 1: user 5 at t0; user 6 far enough ahead that the watermark
    # (max_ts - delay) passes user 5's last_event + timeout
    f1 = [(5, "2026-01-01 00:00:00"), (5, "2026-01-01 00:05:00"),
          (6, "2026-01-01 02:00:00")]
    # file 2: only user 6 — the batch where user 5's timeout fires
    f2 = [(6, "2026-01-01 02:01:00")]
    for rows in (f1, f2):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, timeout_sec=1800, watermark_delay="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("to_sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "tockpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM to_sessions").collect()
    u5_closed = [r for r in rows if r["user_id"] == 5 and r["closed"]]
    assert len(u5_closed) == 1
    assert u5_closed[0]["n_events"] == 2
    assert str(u5_closed[0]["session_end"]) == "2026-01-01 00:05:00"


def test_sessionize_stream_equals_batch_rollup(spark, tmp_path):
    """VERDICT r02 #6: folding the stream's session snapshots (closed +
    latest open per session) equals the oracle-checked batch session_rollup
    on the same events — the streaming operator inherits the batch oracle."""
    from ndap_data_validator_spark.operators.sessions import session_rollup
    from ndap_data_validator_spark.streaming.stateful import sessionize_stream

    # deterministic fixture: 12 users, bursty gaps, whole-second timestamps,
    # globally time-ordered so micro-batch order == event-time order
    base = 1_767_225_600  # 2026-01-01 00:00:00 UTC
    events = []
    for i in range(240):
        user = i % 12
        step = i // 12
        burst = (i * 7919) % 5
        # every 5th step jumps by >timeout ⇒ ~4 sessions per user
        ts = base + step * 400 + (step // 5) * 5000 + burst * 17 + user * 3
        events.append((user, ts))
    events.sort(key=lambda e: e[1])

    src = str(tmp_path / "eqsrc")
    chunk = len(events) // 3
    for k in range(3):
        part = events[k * chunk : (k + 1) * chunk if k < 2 else len(events)]
        spark.createDataFrame(part, "user_id long, sec long").select(
            "user_id", F.col("sec").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    df = spark.read.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, timeout_sec=900, watermark_delay="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("eq_sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "eqckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    folded = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n"])
        for r in spark.sql(
            """SELECT user_id, session_start,
                      max(session_end) AS session_end, max(n_events) AS n
               FROM eq_sessions GROUP BY user_id, session_start"""
        ).collect()
    }
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in session_rollup(df, timeout_sec=900).collect()
    }
    assert folded == expected and len(expected) > 12


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark twin of batch dedup_exact: duplicates
    split across micro-batches (within the watermark) emit exactly once."""
    from ndap_data_validator_spark.streaming.stateful import dedup_stream

    src = str(tmp_path / "dsrc")
    f1 = [("c1", 0, "2026-01-01 00:00:00"), ("c1", 1, "2026-01-01 00:00:30"),
          ("c2", 0, "2026-01-01 00:00:10")]
    f2 = [("c1", 0, "2026-01-01 00:01:00"),   # dup of batch-1 key
          ("c2", 0, "2026-01-01 00:00:10"),   # exact dup row
          ("c3", 0, "2026-01-01 00:02:00")]   # new key
    for rows in [f1, f2]:
        spark.createDataFrame(rows, "conv_id string, turn_idx int, ts string").select(
            "conv_id", "turn_idx", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream(stream, key_cols=("conv_id", "turn_idx"))
    q = (
        out.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT conv_id, turn_idx FROM deduped").collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert keys == [("c1", 0), ("c1", 1), ("c2", 0), ("c3", 0)]


def test_check_rules_stream_equals_batch(spark, tmp_path):
    """CHECK constraints are a stateless scan-level projection, so the SAME
    check_violations call runs unchanged on a streaming frame (no
    watermark, no state) — micro-batched violations must equal the batch
    run over the full input."""
    from ndap_data_validator_spark.operators.checks import check_violations
    from ndap_data_validator_spark.rules.model import CheckRule

    rules = [
        CheckRule("end_ge_start", "e >= s"),
        CheckRule("tool_named", "role <> 'tool' OR tool IS NOT NULL"),
    ]
    src = str(tmp_path / "csrc")
    f1 = [(1, 0, 5, "user", None), (2, 9, 3, "user", None)]   # range viol
    f2 = [(3, 1, 2, "tool", None), (4, None, 2, "tool", "t")]  # tool viol;
    # row 4's NULL s must PASS end_ge_start (SQL CHECK admits unknown)
    for rows in [f1, f2]:
        spark.createDataFrame(
            rows, "id int, s int, e int, role string, tool string"
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "id int, s int, e int, role string, tool string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        check_violations(stream, rules, key_cols=("id",))
        .writeStream.format("memory")
        .queryName("chk_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["id"], r["check"])
        for r in spark.sql("SELECT * FROM chk_stream").collect()
    )
    expected = sorted(
        (r["id"], r["check"])
        for r in check_violations(
            spark.read.parquet(src), rules, key_cols=("id",)
        ).collect()
    )
    assert got == expected == [(2, "end_ge_start"), (3, "tool_named")]


def test_bloom_decontamination_stream_equals_batch(spark, tmp_path):
    """The inline Bloom gate is a stateless projection (bitset rides the
    plan as an array literal), so decontaminate_bloom_stream runs
    unchanged on a streaming frame — per-micro-batch flags must equal
    the batch run over the full input, and both must equal the
    broadcast-join path."""
    from ndap_data_validator_spark.operators.decontaminate import (
        benchmark_ngram_hashes,
        bloom_bitset,
        bloom_words,
        decontaminate_bloom,
        decontaminate_bloom_stream,
    )

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    m = 1 << 16
    bh = benchmark_ngram_hashes(bench, n=8, seed=1)
    bs = bloom_bitset(bh, m_bits=m, k=3)
    words = bloom_words(bs, m_bits=m)
    kw = dict(n=8, m_bits=m, k=3, seed=1)

    src = str(tmp_path / "bsrc")
    f1 = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated content about spark query planning"),
    ]
    f2 = [
        (3, "prefix words then the quick brown fox jumps over the lazy "
            "dog tonight and more trailing text"),
        (4, None),
    ]
    for rows in [f1, f2]:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        decontaminate_bloom_stream(stream, words, **kw)
        .writeStream.format("memory")
        .queryName("bloom_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = spark.read.parquet(src)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM bloom_stream").collect()
    )
    inline_batch = sorted(
        tuple(r)
        for r in decontaminate_bloom_stream(batch, words, **kw).collect()
    )
    join_batch = sorted(
        tuple(r) for r in decontaminate_bloom(batch, bs, **kw).collect()
    )
    assert got == inline_batch == join_batch
    flags = {t[0]: t[4] for t in got}
    assert flags == {1: True, 2: False, 3: True}


def test_sequence_check_stream_equals_batch(spark, tmp_path):
    """Streaming sequence checks == the batch window operator when turns
    arrive in order: same five rules, state (the previous-turn snapshot)
    carries across micro-batches at the file boundary."""
    from ndap_data_validator_spark.operators.convchecks import sequence_checks
    from ndap_data_validator_spark.streaming.stateful import (
        sequence_check_stream,
    )

    fsm = frozenset(
        [("user", "assistant"), ("assistant", "tool"), ("tool", "user")]
    )
    base = "2026-01-01 00:{m:02d}:00"
    rows = [
        # conv A: clean cycle, then a skipped turn (order_gap+bad_transition
        # at 4), a ts regression at 5, a role repeat at 6
        ("A", 0, "user", base.format(m=0)),
        ("A", 1, "assistant", base.format(m=1)),
        ("A", 2, "tool", base.format(m=2)),
        ("A", 4, "assistant", base.format(m=3)),   # gap: tool->assistant ok? NO (tool->user only)
        ("A", 5, "tool", "2026-01-01 00:01:30"),   # regression
        ("A", 6, "tool", base.format(m=5)),        # repeat + bad transition
        # conv B: NULL role in the middle — its two transitions pass
        ("B", 0, "user", base.format(m=0)),
        ("B", 1, None, base.format(m=1)),
        ("B", 2, "tool", base.format(m=2)),
        # conv C: long silence between 0 and 1
        ("C", 0, "user", base.format(m=0)),
        ("C", 1, "assistant", "2026-01-01 03:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).select(
        "conv_id", "turn_idx", "role", F.col("ts").cast("timestamp").alias("ts")
    )
    kwargs = dict(
        expected_step=1, max_gap_sec=3600.0, allowed_transitions=fsm
    )
    batch = {
        (r.conv_id, r.turn_idx, r.check)
        for r in sequence_checks(
            df, key_col="conv_id", order_col="turn_idx",
            ts_col="ts", role_col="role", **kwargs
        ).collect()
    }

    # split each conversation MID-STREAM: turns <= 2 in file 1, rest in
    # file 2 — the boundary comparison (A: 2->4) only works if state
    # carried the turn-2 snapshot into batch 2
    src = str(tmp_path / "seqsrc")
    for pred in [F.col("turn_idx") <= 2, F.col("turn_idx") > 2]:
        df.where(pred).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sequence_check_stream(stream, **kwargs)
        .writeStream.format("memory")
        .queryName("seqviol")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "seqckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx, r.check)
        for r in spark.sql("SELECT * FROM seqviol").collect()
    }
    assert got == batch
    # sanity: the planted defects are all present
    assert ("A", 4, "order_gap") in got
    assert ("A", 4, "bad_transition") in got
    assert ("A", 5, "ts_regression") in got
    assert ("A", 6, "role_repeat") in got
    assert ("C", 1, "long_gap") in got
    assert not any(c == "B" for c, _, _ in got)


@pytest.mark.parametrize("seed", [7, 19])
def test_sequence_check_stream_fuzz_equals_batch(spark, tmp_path, seed):
    """Seeded fuzz fold: random conversations with random planted defects,
    split into 3 micro-batches at random TURN boundaries (in-order arrival
    per conv) — the stream twin must equal the batch window operator
    exactly, whatever the defects and wherever the batch cuts land."""
    import random as _random

    from ndap_data_validator_spark.operators.convchecks import sequence_checks
    from ndap_data_validator_spark.streaming.stateful import (
        sequence_check_stream,
    )

    rng = _random.Random(seed)
    roles = ["user", "assistant", "tool"]
    fsm = frozenset(
        [("user", "assistant"), ("assistant", "tool"), ("tool", "user")]
    )
    rows = []
    for c in range(8):
        conv = f"c{c:02d}"
        turn, sec = 0, 0
        for _ in range(rng.randint(5, 25)):
            role = roles[turn % 3]
            r = rng.random()
            if r < 0.15:
                turn += rng.randint(2, 4)          # order gap
            if r >= 0.15 and r < 0.25:
                sec -= rng.randint(1, 500)         # ts regression
            elif r < 0.35:
                sec += rng.randint(4000, 9000)     # long gap
            else:
                sec += rng.randint(1, 120)
            if rng.random() < 0.1:
                role = rng.choice(roles + [None, "sys?"])  # FSM breaks
            rows.append((conv, turn, role,
                         f"2026-01-01 00:00:00.{0:03d}", sec))
            turn += 1
    # ts = base + sec seconds, built in Spark to stay timestamp-typed
    df = (
        spark.createDataFrame(
            [(c, t, r, s) for c, t, r, _, s in rows],
            "conv_id string, turn_idx int, role string, sec long",
        )
        .select(
            "conv_id", "turn_idx", "role",
            (F.lit("2026-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("sec"))).alias("ts"),
        )
    )
    kwargs = dict(expected_step=1, max_gap_sec=3600.0,
                  allowed_transitions=fsm)
    batch = {
        (r.conv_id, r.turn_idx, r.check)
        for r in sequence_checks(
            df, key_col="conv_id", order_col="turn_idx",
            ts_col="ts", role_col="role", **kwargs
        ).collect()
    }
    assert batch, "fuzz frame must plant at least one violation"

    max_turn = max(t for _, t, _, _, _ in rows)
    cut1 = rng.randint(1, max_turn - 1)
    cut2 = rng.randint(cut1 + 1, max_turn)
    src = str(tmp_path / f"fuzzsrc{seed}")
    for pred in [
        F.col("turn_idx") < cut1,
        (F.col("turn_idx") >= cut1) & (F.col("turn_idx") < cut2),
        F.col("turn_idx") >= cut2,
    ]:
        part = df.where(pred)
        if part.take(1):
            part.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sequence_check_stream(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(f"fuzzviol{seed}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"fckpt{seed}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.conv_id, r.turn_idx, r.check)
        for r in spark.sql(f"SELECT * FROM fuzzviol{seed}").collect()
    }
    assert got == batch


def test_drift_windowed_stream_equals_batch(spark, tmp_path):
    """Per-window drift at ingest: the streaming run must emit the SAME
    windows with the SAME KS/PSI/JS/W1 as (a) the identical call on the
    batch frame and (b) the interactive drift_check() on each window's
    slice — three-way fold. The fixture plants one in-distribution window
    and one hard-shifted window, so the drifted verdict splits."""
    import math

    from ndap_data_validator_spark.operators.drift import (
        drift_check,
        drift_windowed,
        snapshot,
    )

    src = str(tmp_path / "dwsrc")
    # baseline: value cycles 0..49; window 1 mirrors it, window 2 is
    # shifted way past the grid (overflow-bucket drift)
    rows = []
    for i in range(200):
        rows.append((i, float(i % 50), f"2026-01-01 00:{i % 10:02d}:15"))
    for i in range(200):
        rows.append(
            (1000 + i, 500.0 + (i % 10), f"2026-01-01 01:{i % 10:02d}:15")
        )
    df = spark.createDataFrame(
        rows, "event_id long, amount double, ts string"
    ).select("event_id", "amount", F.col("ts").cast("timestamp").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(src)

    base = spark.createDataFrame(
        [(float(i % 50),) for i in range(500)], "amount double"
    )
    snap = snapshot(base, ["amount"], n_bins=16)

    batch = {
        str(r["window_start"]): r
        for r in drift_windowed(
            df, "ts", "amount", snap, window_duration="1 hour"
        ).collect()
    }
    assert len(batch) == 2

    stream = spark.readStream.schema(
        "event_id long, amount double, ts timestamp"
    ).parquet(src)
    q = (
        drift_windowed(
            stream, "ts", "amount", snap, window_duration="1 hour",
            watermark_delay="1 minute",
        )
        .writeStream.format("memory")
        .queryName("drift_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dwckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): r
        for r in spark.sql("SELECT * FROM drift_win").collect()
    }
    # append mode emits only watermark-finalized windows; every emitted
    # window must equal the batch row bit-for-bit (same plan, same input)
    assert got
    for k, s in got.items():
        b = batch[k]
        for f in ("ks", "psi", "js", "w1"):
            assert s[f] == b[f], (k, f)
        assert s["drifted"] == b["drifted"]
        assert s["current_total"] == b["current_total"]

    # three-way: each batch window row equals drift_check() on its slice
    for k, b in batch.items():
        lo, hi = b["window_start"], b["window_end"]
        (exp,) = drift_check(
            df.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))),
            snap,
        )
        assert math.isclose(b["ks"], exp.ks, abs_tol=1e-9), k
        assert math.isclose(b["psi"], exp.psi, abs_tol=1e-9), k
        assert math.isclose(b["js"], exp.js, abs_tol=1e-9), k
        assert math.isclose(b["w1"], exp.w1, abs_tol=1e-9), k
        assert b["drifted"] == exp.drifted()
    # the mirrored window passes, the shifted one drifts
    verdicts = sorted(
        (str(r["window_start"]), r["drifted"]) for r in batch.values()
    )
    assert [v for _, v in verdicts] == [False, True]


def test_flag_rows_stream_equals_batch(spark, tmp_path):
    """Row-level rule verdicts (ValidationEngine.flag_rows) are one
    stateless scan-level projection, so the SAME call runs unchanged on a
    readStream frame — the at-ingest half of the quarantine routing
    policy. Per-micro-batch verdicts must equal the batch run over the
    full input."""
    from ndap_data_validator_spark.operators.validate import ValidationEngine
    from ndap_data_validator_spark.rules.model import CheckRule, ColumnAssignment

    assigns = [
        ColumnAssignment("loc", "Location"),
        ColumnAssignment("fy", "Time"),
        ColumnAssignment("m", "Measures", "integer"),
    ]
    checks = [CheckRule("m_cap", "TRY_CAST(m AS INT) < 100")]
    schema = "rid long, loc string, fy string, m string"

    src = str(tmp_path / "fsrc")
    f1 = [(1, "a", "2021", "7"), (2, None, "2021", "8")]
    f2 = [(3, "c", "2021", "oops"), (4, "d", "2021", "150")]
    for rows in [f1, f2]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    eng = ValidationEngine()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        eng.flag_rows(stream, assigns, check_rules=checks)
        .writeStream.format("memory")
        .queryName("flag_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def _norm(rows):
        return sorted(
            (r["rid"], tuple(r["row_reasons"]), r["row_passed"]) for r in rows
        )

    got = _norm(spark.sql("SELECT * FROM flag_stream").collect())
    batch = _norm(
        eng.flag_rows(
            spark.read.parquet(src), assigns, check_rules=checks
        ).collect()
    )
    assert got == batch
    verdicts = {rid: (reasons, ok) for rid, reasons, ok in got}
    assert verdicts[1] == ((), True)
    assert verdicts[2] == (("loc: No Nulls allowed",), False)
    assert verdicts[3] == (("m: Non-numeric values detected",), False)
    assert verdicts[4] == (("check: m_cap",), False)
