"""plans.anomaly: cross-run metrics z-score anomalies over the checkpoint
history — planted stable history + one jumping partition."""

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.plans.anomaly import (
    metrics_anomalies,
    metrics_history,
)
from ndap_data_validator_spark.plans.checkpoint import CheckpointStore


def _store_with_history(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    # 4 prior runs: p1 rows hover 100±2 (stddev>0), p2 constant 50;
    # current run r5: p1 jumps to 200 (huge z), p2 stays 50
    hist = {"r1": (98, 50), "r2": (100, 50), "r3": (102, 50), "r4": (100, 50)}
    for run, (p1_rows, p2_rows) in hist.items():
        store.mark_done_bulk(
            run,
            "digest",
            {
                "p1": {"rows": p1_rows, "failed_count": 0},
                "p2": {"rows": p2_rows, "failed_count": 0},
            },
        )
    store.mark_done_bulk(
        "r5",
        "digest",
        {
            "p1": {"rows": 200, "failed_count": 0},
            "p2": {"rows": 50, "failed_count": 0},
        },
    )
    return store


def test_history_long_form(spark, tmp_path):
    store = _store_with_history(spark, tmp_path)
    h = metrics_history(store, ["$.rows", "$.failed_count"])
    assert h.count() == 5 * 2 * 2  # runs × partitions × metrics
    assert set(r["metric"] for r in h.select("metric").distinct().collect()) == {
        "rows",
        "failed_count",
    }
    # unresolvable path → no rows, not an error
    assert metrics_history(store, ["$.does.not.exist"]).count() == 0


def test_jump_is_flagged_stable_is_not(spark, tmp_path):
    store = _store_with_history(spark, tmp_path)
    out = {
        (r["partition_id"], r["metric"]): r
    for r in metrics_anomalies(
            store, "r5", ["$.rows", "$.failed_count"], z_threshold=3.0
        ).collect()
    }
    jump = out[("p1", "rows")]
    assert jump["anomalous"] and abs(jump["z"]) > 3
    assert jump["hist_runs"] == 4 and jump["hist_mean"] == 100.0
    # constant-history partition, unchanged value → not anomalous (z NULL)
    stable = out[("p2", "rows")]
    assert not stable["anomalous"] and stable["z"] is None
    assert not out[("p1", "failed_count")]["anomalous"]


def test_constant_history_changed_value_flags_without_z(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "c2"))
    for run in ("a", "b", "c"):
        store.mark_done_bulk(run, "d", {"p": {"rows": 10}})
    store.mark_done_bulk("cur", "d", {"p": {"rows": 11}})
    (row,) = metrics_anomalies(store, "cur", ["$.rows"]).collect()
    assert row["z"] is None and row["anomalous"]


def test_min_history_gate(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "c3"))
    store.mark_done_bulk("only", "d", {"p": {"rows": 10}})
    store.mark_done_bulk("cur", "d", {"p": {"rows": 999}})
    # 1 prior run < min_history=2 → no baseline, no alert row at all
    assert metrics_anomalies(store, "cur", ["$.rows"]).count() == 0


def test_current_run_not_in_its_own_baseline(spark, tmp_path):
    store = _store_with_history(spark, tmp_path)
    (row,) = (
        metrics_anomalies(store, "r5", ["$.rows"])
        .where(F.col("partition_id") == "p1")
        .collect()
    )
    # baseline mean must be the PRIOR mean (100), not dragged by 200
    assert row["hist_mean"] == 100.0


def test_retry_keeps_latest_record(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "c4"))
    for run in ("a", "b"):
        store.mark_done_bulk(run, "d", {"p": {"rows": 10}})
    store.mark_done_bulk("cur", "d", {"p": {"rows": 10}})
    store.mark_done_bulk("cur", "d", {"p": {"rows": 12}})  # retry overwrote
    h = metrics_history(store, ["$.rows"]).where(
        F.col("run_id") == "cur"
    ).collect()
    assert len(h) == 1 and h[0]["value"] == 12.0
