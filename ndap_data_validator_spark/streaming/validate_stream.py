"""Structured Streaming front-end: incremental validation of arriving data.

The reference has NO streaming operators (SURVEY.md §2.10) — its "delta"
load mode is an orchestration flag. This module is therefore an engine
extension, not parity: it lets the same compiled rule catalog run over a
stream (new Iceberg snapshots / arriving files) without a second rule
implementation.

Design: ``foreachBatch``. Each micro-batch is a plain DataFrame, so the
batch engine's single-shared-scan aggregate runs unchanged per batch and the
per-batch report rows append to a report sink keyed by (batch_id,
partition_id). Checkpointing comes from Structured Streaming itself
(exactly-once foreachBatch under the stream checkpoint), composing with the
engine's own rule-digest lineage. Continuous stateful operators (watermarked
windows, applyInPandasWithState) are intentionally NOT used: validation
reports are per-batch aggregates, not cross-batch sessions, so the stateless
foreachBatch shape is both simpler and cheaper at scale.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.rules.model import ColumnAssignment


def validate_stream(
    stream_df: DataFrame,
    assignments: list[ColumnAssignment],
    report_path: str,
    checkpoint_path: str,
    partition_by: str | None = None,
    engine: ValidationEngine | None = None,
    trigger_available_now: bool = True,
    on_batch: Callable[[int, DataFrame], None] | None = None,
) -> StreamingQuery:
    """Start the validation stream; per-batch per-column reports append to
    ``{report_path}/per_column`` and summaries to ``{report_path}/summary``,
    each row stamped with ``batch_id``.

    ``trigger_available_now=True`` processes everything currently available
    then stops — the incremental-batch shape (≙ validating each new Iceberg
    snapshot); pass False for a continuously running query.
    """
    eng = engine or ValidationEngine()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # cache_aggregates=False: each batch's report is written exactly once
        # per sink, and a long-running stream must not accumulate one persisted
        # aggregate frame per micro-batch.
        res = eng.validate(
            batch_df, assignments, partition_by=partition_by,
            cache_aggregates=False,
        )
        (
            res.per_column_report.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{report_path}/per_column")
        )
        (
            res.summary.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{report_path}/summary")
        )
        if on_batch is not None:
            on_batch(batch_id, batch_df)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
