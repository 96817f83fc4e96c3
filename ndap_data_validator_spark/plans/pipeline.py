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


LOAD_MODES = ("new", "full_reload", "delta", "structure_change")


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
    load_mode: str = "new",
    watermark_col: str | None = None,
) -> RunOutcome:
    """Checkpointed validation run.

    ``load_mode`` re-expresses the reference's four load modes
    (main.py:180-187, 539-549):
      * ``new``             — resume semantics: skip partitions already done
                              for (run_id, rule_digest).
      * ``full_reload``     — ignore completions; validate everything.
      * ``delta``           — incremental: only rows with ``watermark_col``
                              ABOVE the stored high-watermark are validated;
                              their partitions' report rows overwrite (dynamic
                              partition overwrite), so the report directory
                              folds prior + new partitions; the new max is
                              recorded after the run.
      * ``structure_change``— full re-validate after a schema change (read
                              the source with mergeSchema; the rule digest
                              already invalidates completions when
                              assignments change).
    """
    if load_mode not in LOAD_MODES:
        raise ValueError(f"load_mode must be one of {LOAD_MODES}")
    engine = ValidationEngine(catalog=catalog, schema_name=schema_name)
    run_id = run_id or new_run_id()
    digest = assignment_digest(assignments, engine.catalog, engine.schema_name)
    store = CheckpointStore(spark, checkpoint_path)

    key = partition_key(partition_by)

    if load_mode == "delta":
        if watermark_col is None:
            raise ValueError("delta load_mode requires watermark_col")
        last_wm = store.last_watermark(watermark_col)
        if last_wm is not None:
            wm_type = dict(df.dtypes)[watermark_col]
            df = df.where(F.col(watermark_col) > F.lit(last_wm).cast(wm_type))

    if load_mode in ("full_reload", "structure_change"):
        done: set[str] = set()
    else:
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

    # Checkpoint metrics are assembled DISTRIBUTED: per-column stats fold to
    # a map per partition, join the summary, and to_json builds the record —
    # no per-column collect() in the run path (the old driver fold was a
    # bottleneck at 10^5 partitions × wide schemas). The only collect is the
    # partition-id list for the outcome (one short string per partition).
    processed = sorted(
        r["partition_id"] for r in result.summary.select("partition_id").collect()
    )
    if processed:
        per_col_map = result.per_column_report.groupBy("partition_id").agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("column"),
                        F.struct("nulls", "conversion_errors", "passed"),
                    )
                )
            ).alias("columns")
        )
        metrics_frame = (
            result.summary.join(per_col_map, "partition_id", "left")
            .select(
                F.lit(run_id).alias("run_id"),
                F.col("partition_id"),
                F.lit(digest).alias("rule_digest"),
                F.lit("done").alias("status"),
                F.to_json(
                    F.struct(
                        F.col("rows"),
                        F.col("failed_count"),
                        F.col("failed_columns"),
                        F.col("passed"),
                        F.col("columns"),
                    )
                ).alias("metrics_json"),
            )
        )
        store.mark_done_frame(metrics_frame)

    if publish_path is not None and processed:
        # "validation gates publishing; the published object is the ORIGINAL
        # bytes, not the coerced frame" (main.py:1206-1249, 1396, 1414-1415):
        # passed partitions' source rows are appended unmodified, keyed by
        # partition_id (dynamic overwrite → idempotent on resume). The gate
        # is a semi-join against the (tiny, AQE-broadcast) passed-summary
        # frame — no driver-side partition list.
        passed_parts = result.summary.where(F.col("passed")).select(
            "partition_id"
        )
        (
            remaining.withColumn("partition_id", key)
            .join(passed_parts, "partition_id", "left_semi")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(publish_path)
        )

    if load_mode == "delta" and watermark_col is not None:
        new_wm = remaining.agg(
            F.max(F.col(watermark_col)).cast("string").alias("wm")
        ).first()["wm"]
        if new_wm is not None:
            store.record_watermark(watermark_col, new_wm)

    # passed_all folds over every partition recorded for this run — the
    # resumed half plus previously-done ones (main.py:926-936 semantics).
    log = (
        store.run_log(run_id)
        .where(F.col("rule_digest") == digest)
        .where(F.col("status") == "done")
    )
    fold = log.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.get_json_object("metrics_json", "$.passed") == F.lit("true")
        ).alias("all_passed"),
    ).first()
    passed_all = bool(fold["n"] > 0 and fold["all_passed"])

    return RunOutcome(
        run_id=run_id,
        rule_digest=digest,
        processed_partitions=processed,
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
