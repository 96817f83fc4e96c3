"""Run-over-run metrics anomaly detection over the checkpoint history.

Every checkpointed run records per-partition metrics (rows, failure
counts, per-column null/error counts — `pipeline.run_validation`'s
metrics_json). That history is the natural baseline for the alert a
production validation engine fires BEFORE drift statistics are even
computed: "this partition's row count / null rate just jumped versus every
prior run". The reference keeps per-run validation snapshots in DuckDB for
exactly this kind of inspection (utils/db.py:344-379) but never compares
across runs — the cross-run z-score is engine scope.

Scale shape: the input is the CHECKPOINT table, O(runs × partitions) tiny
rows — never the data. Metric extraction is `get_json_object` (Catalyst,
no Python); history baselines are one groupBy(partition_id, metric)
aggregate; the current run joins the baseline on the same key. Everything
stays a few small shuffles of metadata-sized frames regardless of corpus
size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.plans.checkpoint import CheckpointStore

__all__ = ["metrics_history", "metrics_anomalies"]


def _metric_name(path: str) -> str:
    # "$.columns.conv_id.nulls" → "columns.conv_id.nulls"
    return path[2:] if path.startswith("$.") else path


def metrics_history(
    store: CheckpointStore, metric_paths: Sequence[str]
) -> DataFrame:
    """Long-form metric values from every 'done' checkpoint record:
    ``(run_id, partition_id, committed_at, metric, value)``. One row per
    (record, path); paths that don't resolve in a record yield NULL values
    and are dropped (a schema-evolved column simply has no history yet).
    The LATEST record per (run_id, partition_id) wins, matching the
    store's replace-on-retry semantics."""
    if not metric_paths:
        raise ValueError("no metric paths given")
    base = (
        store.run_log_all()
        .where(F.col("status") == "done")
        .where(F.col("metrics_json").isNotNull())
    )
    # latest record per (run, partition): retries/compaction may leave
    # several rows; max_by keeps the newest without a window shuffle
    latest = base.groupBy("run_id", "partition_id").agg(
        F.max("committed_at").alias("committed_at"),
        F.max_by("metrics_json", "committed_at").alias("metrics_json"),
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(_metric_name(p)).alias("metric"),
                F.get_json_object("metrics_json", p)
                .cast("double")
                .alias("value"),
            )
            for p in metric_paths
        ]
    )
    return (
        latest.select(
            "run_id", "partition_id", "committed_at", F.explode(pairs).alias("m")
        )
        .select("run_id", "partition_id", "committed_at", "m.metric", "m.value")
        .where(F.col("value").isNotNull())
    )


def metrics_anomalies(
    store: CheckpointStore,
    current_run_id: str,
    metric_paths: Sequence[str],
    z_threshold: float = 3.0,
    min_history: int = 2,
) -> DataFrame:
    """Flag (partition, metric) pairs whose CURRENT-run value deviates from
    the history of all PRIOR runs:
    ``(partition_id, metric, value, hist_runs, hist_mean, hist_stddev, z,
    anomalous)``.

    ``z`` is the usual (x − mean)/stddev against prior runs only (the
    current run never contaminates its own baseline). A zero/NULL-stddev
    history (constant so far, or exactly ``min_history`` == 1 runs) makes
    z NULL — then ``anomalous`` falls back to "value differs from the
    constant history at all", the strictest honest rule when no variance
    estimate exists. Partitions with fewer than ``min_history`` prior runs
    are omitted: no baseline, no alert."""
    hist = metrics_history(store, metric_paths)
    prior = hist.where(F.col("run_id") != current_run_id)
    cur = hist.where(F.col("run_id") == current_run_id).select(
        "partition_id", "metric", "value"
    )
    base = prior.groupBy("partition_id", "metric").agg(
        F.count(F.lit(1)).alias("hist_runs"),
        F.avg("value").alias("hist_mean"),
        F.stddev_samp("value").alias("hist_stddev"),
    ).where(F.col("hist_runs") >= int(min_history))
    # try_divide: a zero/NULL-stddev history yields z NULL (ANSI mode makes
    # bare division raise DIVIDE_BY_ZERO), which the anomalous coalesce
    # then resolves with the constant-history fallback rule
    z = F.try_divide(
        F.col("value") - F.col("hist_mean"), F.col("hist_stddev")
    )
    return (
        cur.join(base, ["partition_id", "metric"])
        .select(
            "partition_id",
            "metric",
            "value",
            "hist_runs",
            F.round("hist_mean", 6).alias("hist_mean"),
            F.round("hist_stddev", 6).alias("hist_stddev"),
            F.round(z, 4).alias("z"),
            F.coalesce(
                F.abs(z) > F.lit(float(z_threshold)),
                F.col("value") != F.col("hist_mean"),
            ).alias("anomalous"),
        )
    )
