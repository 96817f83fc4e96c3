"""End-to-end validation run: checkpointed, resumable, skew-aware.

The reference's EP2 lifecycle (``/root/reference/main.py:835-1130``) loops
files sequentially, validating each and logging per-file results. Here the
"files" are table partitions and the whole remaining set is validated in ONE
Spark job (partition parallelism replaces the loop); completion is recorded
per partition so a killed run resumes by skipping 'done' partitions —
SURVEY.md §7.7.

Resume filter: ``partition_key NOT IN (done)`` — expressed with
``~isin(...)`` over the derived key (null-safe via coalesce to a sentinel).
On a partitioned Iceberg/parquet source this predicate reaches the source as
partition pruning, so skipped partitions are never even read.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import ValidationEngine, ValidationResult
from ndap_data_validator_spark.plans.checkpoint import NULL_PARTITION, CheckpointStore
from ndap_data_validator_spark.rules.model import (
    ColumnAssignment,
    RuleCatalog,
    assignment_digest,
)


def new_run_id() -> str:
    """RUN-XXXXXXXX, like the reference's run ids (main.py:103-104)."""
    return f"RUN-{uuid.uuid4().hex[:8].upper()}"


@dataclass
class RunOutcome:
    run_id: str
    rule_digest: str
    processed_partitions: list[str]
    skipped_partitions: list[str]
    passed_all: bool  # fold over ALL partitions of this run (main.py:926-936)
    result: ValidationResult | None  # plans for the processed remainder


def partition_key(partition_by: str | Column) -> Column:
    col = F.col(partition_by) if isinstance(partition_by, str) else partition_by
    return F.coalesce(col.cast("string"), F.lit(NULL_PARTITION))


def run_validation(
    spark: SparkSession,
    df: DataFrame,
    assignments: list[ColumnAssignment],
    partition_by: str | Column,
    checkpoint_path: str,
    run_id: str | None = None,
    order_by: list[str] | None = None,
    report_path: str | None = None,
    publish_path: str | None = None,
    catalog: RuleCatalog | None = None,
    schema_name: str | None = None,
) -> RunOutcome:
    engine = ValidationEngine(catalog=catalog, schema_name=schema_name)
    run_id = run_id or new_run_id()
    digest = assignment_digest(assignments, engine.catalog, engine.schema_name)
    store = CheckpointStore(spark, checkpoint_path)

    key = partition_key(partition_by)
    done = store.completed_partitions(run_id, digest)

    remaining = df.where(~key.isin(sorted(done))) if done else df

    result = engine.validate(
        remaining, assignments, partition_by=key, order_by=order_by
    )

    if report_path is not None:
        # Dynamic partition overwrite → re-validating a partition replaces
        # its rows; a re-run after crash is idempotent. The mode is pinned on
        # the WRITER (not session config) so the contract holds even with a
        # caller-supplied vanilla SparkSession — static overwrite would wipe
        # already-done partitions' reports on resume.
        (
            result.per_column_report.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(f"{report_path}/per_column")
        )
        (
            result.violations.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(f"{report_path}/violations")
        )

    summaries = result.summary.collect()  # one row per partition — tiny
    # per-partition per-column stats accumulators ride in the checkpoint
    # metrics (north_star: "per-partition lineage, rule digests, and stats
    # accumulators") — both frames are partition-count-sized, not data-sized.
    per_col = result.per_column_report.collect()
    col_stats: dict[str, dict[str, dict]] = {}
    for r in per_col:
        col_stats.setdefault(r["partition_id"], {})[r["column"]] = {
            "nulls": r["nulls"],
            "conversion_errors": r["conversion_errors"],
            "passed": r["passed"],
        }
    metrics = {
        r["partition_id"]: {
            "rows": r["rows"],
            "failed_count": r["failed_count"],
            "failed_columns": list(r["failed_columns"]),
            "passed": r["passed"],
            "columns": col_stats.get(r["partition_id"], {}),
        }
        for r in summaries
    }
    store.mark_done_bulk(run_id, digest, metrics)

    if publish_path is not None:
        # "validation gates publishing; the published object is the ORIGINAL
        # bytes, not the coerced frame" (main.py:1206-1249, 1396, 1414-1415):
        # passed partitions' source rows are appended unmodified, keyed by
        # partition_id (dynamic overwrite → idempotent on resume).
        passed_parts = sorted(p for p, m in metrics.items() if m["passed"])
        if passed_parts:
            (
                remaining.withColumn("partition_id", key)
                .where(F.col("partition_id").isin(passed_parts))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("partition_id")
                .parquet(publish_path)
            )

    # passed_all folds over every partition recorded for this run — the
    # resumed half plus previously-done ones (main.py:926-936 semantics).
    import json as _json

    log = store.run_log(run_id).where(F.col("rule_digest") == digest).collect()
    passed_all = all(
        _json.loads(r["metrics_json"]).get("passed", False) for r in log
    ) and len(log) > 0

    return RunOutcome(
        run_id=run_id,
        rule_digest=digest,
        processed_partitions=sorted(metrics),
        skipped_partitions=sorted(done),
        passed_all=passed_all,
        result=result,
    )


def salt_repartition(
    df: DataFrame,
    key: str,
    num_partitions: int,
    salt_buckets: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew mitigation for heavy groupBy keys (SURVEY.md §4.1):
    spread one hot key (e.g. the skewed conv_id) over ``salt_buckets``
    shuffle partitions. Aggregations over (key, salt) then re-aggregate by
    key — callers compose this; for the validation aggregates AQE's
    skew handling usually suffices, so this is opt-in.

    The salt is derived from STABLE row content (``salt_cols``, defaulting to
    every column), never from ``monotonically_increasing_id`` — a task retry
    recomputes the same salt for the same row, so a failed stage cannot
    re-partition rows differently mid-job."""
    cols = salt_cols if salt_cols is not None else list(df.columns)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col(key), salt)
