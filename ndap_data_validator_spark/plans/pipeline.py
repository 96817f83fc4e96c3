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
    REASON_INCONSISTENT_TIME,
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
    # dataset-level expectation report (one row per partition × MetricRule)
    # when metric_rules were given; None otherwise
    expectations: DataFrame | None = None
    # per-(partition, column) drift report vs the DriftRule baseline when
    # drift_rule was given; None otherwise
    drift: DataFrame | None = None
    # expected-partition census (one row per expected-or-observed key)
    # when expected_partitions was given; None otherwise
    completeness: DataFrame | None = None


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
    compact_max_files: int | None = 256,
    sequence_rule=None,
    check_rules: list | None = None,
    max_violations_per_rule: int | None = None,
    metric_rules: list | None = None,
    metric_now: str | None = None,
    drift_rule=None,
    expected_partitions: list | None = None,
    expected_min_rows: int = 1,
    row_policy: str = "partition",
    quarantine_path: str | None = None,
    preflight: bool = False,
) -> RunOutcome:
    """Checkpointed validation run.

    ``load_mode`` re-expresses the reference's four load modes
    (main.py:180-187, 539-549):
      * ``new``             — resume semantics: skip partitions already done
                              for (run_id, rule_digest).
      * ``full_reload``     — ignore completions; validate everything.
      * ``delta``           — incremental: only rows with ``watermark_col``
                              ABOVE the stored high-watermark are validated.
                              Report/publish rows are keyed by (partition_id,
                              delta_batch) where delta_batch is a DETERMINISTIC
                              hash of the watermark interval's lower bound:
                              prior batches' rows are never touched (the r02
                              ADVICE clobber — a second intra-day batch landing
                              in an already-published partition used to replace
                              the whole partition with just the delta slice),
                              while a RETRY of the same interval gets the same
                              batch key and dynamically overwrites only its own
                              rows — idempotent across crashes. The watermark
                              only advances when EVERY partition of the batch
                              passed; a failed batch keeps the old watermark, so
                              the next delta run re-picks the same rows (plus
                              newer arrivals — same lower bound ⇒ same batch
                              key ⇒ clean replace) and failed rows are never
                              silently skipped.
      * ``structure_change``— full re-validate after a schema change (read
                              the source with mergeSchema; the rule digest
                              already invalidates completions when
                              assignments change).

    ``sequence_rule`` (optional ``rules.model.SequenceRule``) additionally
    writes conversation-order violation rows to
    ``{report_path}/sequence_violations`` under the same dynamic-overwrite
    partition contract. CAVEAT: sequence semantics are per conversation —
    ``partition_by`` should be derived from the rule's key column (as the
    north_rule's per-conversation layout is); partitioning that splits a
    conversation across resume slices would make lag() see a truncated
    history for the boundary turn.

    ``check_rules`` (optional list of ``rules.model.CheckRule``) writes
    row-level CHECK-constraint violations to
    ``{report_path}/check_violations`` — one scan-level projection, no
    shuffle; ``order_by`` columns identify the violating rows. CHECK
    rules are the row-REPORTING (and, under ``row_policy="quarantine"``,
    row-ROUTING) family; they do not by themselves gate the partition
    verdict. To make a CHECK failure fail the partition, withhold publish,
    and freeze the delta watermark, pair it with
    ``MetricRule(name, "compliance", expression="(<expr>) IS NOT FALSE",
    min_bound=1.0)`` — the same expression under CHECK's NULL-passes
    semantics (compliance alone counts NULL as non-compliant), evaluated
    in the expectations aggregate with full severity/digest/anomaly
    wiring. One mechanism for verdicts, one for rows; both compile from
    the same SQL string.

    ``max_violations_per_rule`` caps the per-row violation OUTPUT at the
    first K rows per (partition, column, reason) by the ``order_by`` key —
    the report-sink guard for 10^12-turn runs where one broken rule would
    otherwise write billions of example rows; counts stay exact.

    ``metric_rules`` (optional list of
    ``operators.expectations.MetricRule``) evaluates dataset-level metric
    expectations per partition (ONE extra shared aggregate over the same
    resume slice) and folds them into the run contract end to end: the
    report lands at ``{report_path}/metric_expectations``; a partition
    whose error-severity expectation fails is withheld from the publish
    gate and freezes the delta watermark (warn-severity rules report
    only); the failed rule names ride ``metrics_json`` for the cross-run
    anomaly history; and the rules enter the run digest, so changing them
    invalidates 'done' partitions exactly like every other rule family.
    ``metric_now`` (ISO-8601 UTC string) is the explicit reference instant
    any ``freshness`` rule measures lag against — required with one, the
    scheduler's batch timestamp in production; it is an EVALUATION input
    like the data itself, so it does not enter the run digest.

    ``expected_partitions`` (optional manifest of partition keys, with
    ``expected_min_rows`` as the volume floor) runs the
    ``operators.completeness.partition_completeness`` census over the FULL
    batch slice: the report lands at ``{report_path}/completeness`` and a
    ``missing`` / ``undersized`` expected partition fails ``passed_all`` —
    the one failure mode no row-level or dataset-level rule can see,
    because the rows never arrived. Like ``metric_now`` it is an
    evaluation input (the manifest changes every scheduled batch), so it
    stays out of the run digest.

    ``drift_rule`` (optional ``operators.drift.DriftRule``) runs the
    KS/PSI distribution-drift check against the rule's baseline snapshot
    PER PARTITION over the same resume slice — one groupBy((partition,
    bin)) per baseline column, the baseline entering as broadcast-grade
    literals (operators/drift.drift_report_partitioned; no driver
    collect). The per-(partition, column) report lands at
    ``{report_path}/drift_report``; with ``severity="error"`` a drifted
    partition is withheld from publish and freezes the delta watermark
    (``"warn"`` reports only); the drifted column names ride
    ``metrics_json``; and the baseline digest + thresholds enter the run
    digest, so re-baselining invalidates 'done' partitions.

    ``row_policy`` selects the publish granularity.
      * ``"partition"`` (default) — the reference's contract: a partition
        publishes ONLY when every rule passed; the published object is the
        original rows, unmodified.
      * ``"quarantine"`` — row-granular routing (the dlt-expectations /
        dead-letter pattern; requires ``publish_path``): rows that pass
        every error-severity per-column rule and CHECK rule publish even
        from partitions with failures, while each failing row lands at
        ``quarantine_path`` (default ``{publish_path}_quarantine``)
        carrying a ``row_reasons`` array naming every fired rule — one
        extra scan-level projection (``ValidationEngine.flag_rows``), no
        joins against the violations report. Verdicts that can't be
        pinned on rows keep partition granularity and withhold the whole
        partition from BOTH sinks: a missing mandatory role (the rule set
        never compiled — skips routing for the run), an aggregate-granular
        column failure (time-format consistency: the minority-format rows
        are only identifiable relative to the aggregate majority), an
        error-severity expectation failure, or error-severity drift.
        Withheld rows are neither published nor quarantined; a
        ``full_reload`` run, a new ``run_id``, or a later delta batch
        re-routes them (a same-run_id resume skips partitions already
        checkpointed 'done', as always). ``severity="warn"`` rules report
        but never route (diverting their rows would block the publish
        their contract guarantees); ``tolerance`` moves only the
        partition verdict — a within-tolerance violating row still
        dead-letters, because the tolerance accepts the PARTITION, not
        the row. Sequence-rule violations report but do not route (a
        lag() verdict depends on neighbors; quarantining the turn would
        silently change the neighbors' verdicts on re-run).
        ``passed_all``, reports, and the checkpoint are
        policy-independent. The delta watermark keeps its contract ("a
        failed batch stays re-pickable") re-read under routing: ROUTED
        failures don't freeze it (their rows already landed — re-picking
        them would grow the slice forever on one persistently-bad row);
        only the non-routable withheld failures do. The policy routes
        output rows without changing any verdict, so (like the report
        paths) it stays out of the rule digest.
    """
    if row_policy not in ("partition", "quarantine"):
        raise ValueError("row_policy must be 'partition' or 'quarantine'")
    if quarantine_path is not None and row_policy != "quarantine":
        raise ValueError("quarantine_path requires row_policy='quarantine'")
    if row_policy == "quarantine" and publish_path is None:
        # without a publish path the whole routing block is skipped — fail
        # fast instead of silently writing no dead-letter output anywhere
        raise ValueError("row_policy='quarantine' requires publish_path")
    if preflight:
        # opt-in fail-in-seconds gate (rules/preflight.py): analysis-check
        # every rule family against the input schema on a zero-row frame —
        # no job — and refuse the run with the COMPLETE fix list instead
        # of dying mid-cluster on the first unresolved expression (or
        # silently ignoring an assignment that names an absent column)
        from ndap_data_validator_spark.rules.preflight import preflight_rules

        pf_errors = preflight_rules(
            spark,
            df,
            assignments=assignments,
            check_rules=check_rules,
            metric_rules=metric_rules,
            sequence_rule=sequence_rule,
            catalog=catalog,
            schema_name=schema_name,
        )
        if pf_errors:
            raise ValueError(
                "rule pre-flight failed:\n"
                + "\n".join(str(e) for e in pf_errors)
            )
    if load_mode not in LOAD_MODES:
        raise ValueError(f"load_mode must be one of {LOAD_MODES}")
    engine = ValidationEngine(catalog=catalog, schema_name=schema_name)
    run_id = run_id or new_run_id()
    digest = assignment_digest(assignments, engine.catalog, engine.schema_name)
    # compose in the run's sequence/CHECK rules (identity when absent):
    # changing ANY rule family must invalidate 'done' partitions, or a
    # resume would mix rule versions within one report
    from ndap_data_validator_spark.rules.model import run_rule_digest

    digest = run_rule_digest(
        digest, sequence_rule, check_rules, metric_rules, drift_rule
    )
    store = CheckpointStore(spark, checkpoint_path)

    key = partition_key(partition_by)

    delta_batch: str | None = None
    if load_mode == "delta":
        if watermark_col is None:
            raise ValueError("delta load_mode requires watermark_col")
        last_wm = store.last_watermark(watermark_col)
        if last_wm is not None:
            wm_type = dict(df.dtypes)[watermark_col]
            df = df.where(F.col(watermark_col) > F.lit(last_wm).cast(wm_type))
        # batch identity = the interval's LOWER bound: a retry of the same
        # interval (watermark unchanged after a failure) reuses the key and
        # replaces only its own output rows; an advanced watermark mints a
        # new key, so prior batches' published rows are never overwritten
        import hashlib as _hashlib

        delta_batch = "b" + _hashlib.md5(
            str(last_wm).encode("utf-8")
        ).hexdigest()[:12]

    if load_mode in ("full_reload", "structure_change"):
        done: set[str] = set()
    else:
        done = store.completed_partitions(run_id, digest)

    remaining = df.where(~key.isin(sorted(done))) if done else df

    result = engine.validate(
        remaining,
        assignments,
        partition_by=key,
        order_by=order_by,
        max_violations_per_rule=max_violations_per_rule,
    )

    # Dataset-level expectations over the SAME resume slice: one extra
    # shared aggregate (operators/expectations.py). The tiny per-partition
    # summary is persisted because it feeds up to three actions below
    # (metrics_json, publish gate, watermark fold) — without the persist
    # each action would rescan the source for the expectations agg.
    exp_report = None
    exp_summary = None
    if metric_rules:
        from ndap_data_validator_spark.operators.expectations import (
            expectations_summary,
            metric_expectations,
        )

        exp_report = metric_expectations(
            remaining, metric_rules, partition_by=key, now=metric_now
        )
        exp_summary = (
            expectations_summary(exp_report)
            .select(
                "partition_id",
                F.col("failed_rules").alias("exp_failed_rules"),
                F.col("warned_rules").alias("exp_warned_rules"),
                F.col("passed").alias("exp_passed"),
            )
            .persist()
        )

    # Expected-partition completeness census (operators/completeness.py)
    # over the FULL batch slice, NOT the resume remainder — whether a
    # partition arrived is a property of the table, and a resumed run must
    # not re-report completed partitions as missing. One extra shared scan
    # (map-side-combined groupBy on the key) only when the manifest is
    # given; the census frame is |manifest|-sized and persisted because it
    # feeds two actions (report write + run-verdict fold).
    comp_report = None
    if expected_partitions:
        from ndap_data_validator_spark.operators.completeness import (
            partition_completeness,
        )

        comp_report = (
            partition_completeness(
                df.withColumn("__part_id", key),
                "__part_id",
                expected_partitions,
                min_rows=expected_min_rows,
            )
            .withColumnRenamed("key", "partition_id")
            .persist()
        )

    # Per-partition drift vs the rule's baseline snapshot, over the SAME
    # resume slice. The tiny (partitions × columns) summary is persisted
    # because, like exp_summary, it can feed three actions (metrics_json,
    # publish gate, watermark fold).
    drift_rep = None
    drift_summary = None
    if drift_rule is not None:
        from ndap_data_validator_spark.operators.drift import (
            drift_report_partitioned,
        )

        drift_rep = drift_report_partitioned(
            remaining,
            key,
            drift_rule.baseline,
            ks_threshold=drift_rule.ks_threshold,
            psi_threshold=drift_rule.psi_threshold,
        )
        drift_summary = (
            drift_rep.groupBy("partition_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.when(F.col("drifted"), F.col("column")))
                ).alias("drifted_columns")
            )
            .withColumn("drift_passed", F.size("drifted_columns") == 0)
            .persist()
        )

    # In delta mode every output dir gains a delta_batch partition level:
    # incremental batches ACCUMULATE (append semantics) while any retry of
    # the same batch still gets overwrite-grade idempotency.
    part_cols = (
        ["partition_id"] if delta_batch is None else ["partition_id", "delta_batch"]
    )

    def _assert_layout_depth(path: str) -> None:
        # Delta mode writes an extra delta_batch partition level; Spark
        # rejects a directory holding BOTH depths as conflicting partition
        # structures — but only at READ time, after the second write already
        # corrupted the layout. Fail fast BEFORE writing when the existing
        # directory's depth doesn't match this run's mode, so a pipeline
        # that flips modes on the same report/publish path gets an
        # actionable error instead of an unreadable directory.
        jvm = spark._jvm
        HPath = jvm.org.apache.hadoop.fs.Path
        fs = HPath(path).getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(HPath(path)):
            return
        for st in fs.globStatus(HPath(path.rstrip("/") + "/partition_id=*/*")):
            name = st.getPath().getName()
            if name.startswith(".") or name.startswith("_"):
                continue  # checksum/_SUCCESS metadata, not layout evidence
            existing_delta = st.isDirectory() and name.startswith("delta_batch=")
            want_delta = delta_batch is not None
            if existing_delta != want_delta:
                raise ValueError(
                    f"partition layout mismatch at {path}: existing data was "
                    f"written {'with' if existing_delta else 'without'} a "
                    f"delta_batch level but this run ({load_mode=}) writes "
                    f"{'with' if want_delta else 'without'} it — Spark cannot "
                    "read mixed depths. Use a fresh output path when "
                    "switching between delta and non-delta load modes."
                )
            return  # one partition dir is representative; all share a depth

    def _write_partitioned(frame: DataFrame, path: str) -> None:
        # Dynamic partition overwrite → re-validating a partition replaces
        # its rows; a re-run after crash is idempotent. The mode is pinned on
        # the WRITER (not session config) so the contract holds even with a
        # caller-supplied vanilla SparkSession — static overwrite would wipe
        # already-done partitions' reports on resume.
        _assert_layout_depth(path)
        if delta_batch is not None:
            frame = frame.withColumn("delta_batch", F.lit(delta_batch))
        (
            frame.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(path)
        )

    if report_path is not None:
        _write_partitioned(result.per_column_report, f"{report_path}/per_column")
        _write_partitioned(result.violations, f"{report_path}/violations")
        if sequence_rule is not None:
            # conversation-order rules (rules.model.SequenceRule): one
            # window shuffle on the conversation key over the SAME resume
            # slice; violation rows land next to the per-row violations
            # with identical partition/overwrite semantics, so resume and
            # delta retries replace only their own rows here too
            from ndap_data_validator_spark.operators.convchecks import (
                check_sequence_rule,
            )

            seq_v = check_sequence_rule(
                remaining.withColumn("__part_id", key),
                sequence_rule,
                carry_cols=("__part_id",),
            ).withColumnRenamed("__part_id", "partition_id")
            _write_partitioned(seq_v, f"{report_path}/sequence_violations")
        if check_rules:
            # row-level CHECK constraints (rules.model.CheckRule): pure
            # scan-level projection over the SAME resume slice — no
            # shuffle; rows land with the identical partition/overwrite
            # semantics so resume and delta retries replace only their own
            from ndap_data_validator_spark.operators.checks import (
                check_violations,
            )

            key_cols = order_by or []
            chk_v = check_violations(
                remaining.withColumn("__part_id", key),
                check_rules,
                key_cols=key_cols,
                carry_cols=("__part_id",),
            ).withColumnRenamed("__part_id", "partition_id")
            _write_partitioned(chk_v, f"{report_path}/check_violations")
        if exp_report is not None:
            # dataset-level expectation verdicts: one row per (partition,
            # rule) with value/bounds/passed, same overwrite contract
            _write_partitioned(exp_report, f"{report_path}/metric_expectations")
        if comp_report is not None:
            # expected-partition census: one row per expected-or-observed
            # key, same idempotent per-partition overwrite contract
            _write_partitioned(comp_report, f"{report_path}/completeness")
        if drift_rep is not None:
            # per-(partition, column) KS/PSI/JS/W1 vs the baseline grid,
            # same overwrite contract
            _write_partitioned(drift_rep, f"{report_path}/drift_report")

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
        summary_for_metrics = result.summary.join(per_col_map, "partition_id", "left")
        passed_expr = F.col("passed")
        extra_fields = []
        if exp_summary is not None:
            # a partition's recorded verdict folds in its error-severity
            # expectation failures; the rule names ride along for the
            # cross-run anomaly history (plans/anomaly.py reads these paths)
            summary_for_metrics = summary_for_metrics.join(
                exp_summary, "partition_id", "left"
            )
            passed_expr = passed_expr & F.coalesce(
                F.col("exp_passed"), F.lit(True)
            )
            extra_fields += [
                F.coalesce(
                    F.col("exp_failed_rules"), F.array().cast("array<string>")
                ).alias("expectation_failed_rules"),
                F.coalesce(
                    F.col("exp_warned_rules"), F.array().cast("array<string>")
                ).alias("expectation_warned_rules"),
            ]
        if drift_summary is not None:
            # drifted column names ride along for the anomaly history; only
            # error severity folds into the recorded verdict
            summary_for_metrics = summary_for_metrics.join(
                drift_summary, "partition_id", "left"
            )
            if drift_rule.severity == "error":
                passed_expr = passed_expr & F.coalesce(
                    F.col("drift_passed"), F.lit(True)
                )
            extra_fields.append(
                F.coalesce(
                    F.col("drifted_columns"), F.array().cast("array<string>")
                ).alias("drifted_columns")
            )
        json_fields = [
            F.col("rows"),
            F.col("failed_count"),
            F.col("failed_columns"),
            passed_expr.alias("passed"),
            *extra_fields,
            F.col("columns"),
        ]
        metrics_frame = summary_for_metrics.select(
            F.lit(run_id).alias("run_id"),
            F.col("partition_id"),
            F.lit(digest).alias("rule_digest"),
            F.lit("done").alias("status"),
            F.to_json(F.struct(*json_fields)).alias("metrics_json"),
        )
        store.mark_done_frame(metrics_frame)

    # Partitions failing an AGGREGATE-granular column verdict — today only
    # the time-format-consistency rule, whose minority-format rows no
    # row-local predicate can identify (the majority format is an aggregate
    # property) — cannot be row-routed; under the quarantine policy they
    # stay withheld wholesale, exactly like the default policy. Warn
    # severity keeps its contract: a warn column's reasons never withhold.
    agg_only_parts = None
    if row_policy == "quarantine" and not result.missing_roles:
        err_cols = [a.column for a in assignments if a.severity != "warn"]
        agg_only_parts = (
            result.per_column_report.where(F.col("column").isin(err_cols))
            .where(F.array_contains("reasons", REASON_INCONSISTENT_TIME))
            .select("partition_id")
            .distinct()
        )

    if publish_path is not None and processed:
        # "validation gates publishing; the published object is the ORIGINAL
        # bytes, not the coerced frame" (main.py:1206-1249, 1396, 1414-1415):
        # passed partitions' source rows are appended unmodified, keyed by
        # partition_id (dynamic overwrite → idempotent on resume). The gate
        # is a semi-join against the (tiny, AQE-broadcast) passed-summary
        # frame — no driver-side partition list.
        if row_policy == "quarantine":
            # row-granular routing. missing_roles is a run-level CONFIG
            # verdict (the rule set never compiled for those columns, so
            # row verdicts would be vacuous) and a driver-side constant —
            # skip both sinks outright rather than launching two write
            # jobs guaranteed empty. Aggregate-granular failures withhold
            # their partition (see agg_only_parts above); everything else
            # routes row by row below.
            publish_gated = not result.missing_roles
            passed_parts = result.summary.select("partition_id")
            if agg_only_parts is not None:
                passed_parts = passed_parts.join(
                    agg_only_parts, "partition_id", "left_anti"
                )
        else:
            publish_gated = True
            passed_parts = result.summary.where(F.col("passed")).select(
                "partition_id"
            )
        if exp_summary is not None:
            # error-severity expectation failures withhold the partition
            # from publish exactly like column-rule failures do
            passed_parts = passed_parts.join(
                exp_summary.where(F.col("exp_passed")).select("partition_id"),
                "partition_id",
                "left_semi",
            )
        if drift_summary is not None and drift_rule.severity == "error":
            # anti-join against FAILURES (not semi against passes): a
            # partition where every baseline column is null carries no
            # drift rows at all and must still publish
            passed_parts = passed_parts.join(
                drift_summary.where(~F.col("drift_passed")).select(
                    "partition_id"
                ),
                "partition_id",
                "left_anti",
            )
        if row_policy == "quarantine" and publish_gated:
            # one scan-level projection computes every row's verdict; the
            # dataset-granular gate (passed_parts) then bounds BOTH sinks.
            # Two filtered writes of the same flagged plan — each a clean
            # scan→filter→write with no cached corpus in between.
            flagged = engine.flag_rows(
                remaining, assignments, check_rules=check_rules
            ).withColumn("partition_id", key)
            gated = flagged.join(passed_parts, "partition_id", "left_semi")
            _write_partitioned(
                gated.where(F.col("row_passed")).drop(
                    "row_reasons", "row_passed"
                ),
                publish_path,
            )
            _write_partitioned(
                gated.where(~F.col("row_passed")).drop("row_passed"),
                quarantine_path
                or (publish_path.rstrip("/") + "_quarantine"),
            )
        elif row_policy != "quarantine":
            _write_partitioned(
                remaining.withColumn("partition_id", key).join(
                    passed_parts, "partition_id", "left_semi"
                ),
                publish_path,
            )

    if load_mode == "delta" and watermark_col is not None:
        # Advance the watermark ONLY when no partition of this batch had
        # DATA failures (r02 ADVICE: unconditional advance permanently
        # skipped failed-and-unpublished rows). A failed batch keeps the old
        # watermark: the next delta run re-picks the same rows under the
        # SAME batch key, so the retry replaces this batch's partial output
        # instead of duplicating it. The gate is failed_count (per-column
        # data failures), NOT summary.passed: a missing mandatory ROLE is a
        # catalog-configuration condition that is identical on every retry —
        # freezing the watermark on it would wedge delta mode forever while
        # the publish gate already withholds those rows. The max is computed
        # over the full batch slice (`df` after the watermark filter), not
        # the resume remainder.
        if row_policy == "quarantine" and agg_only_parts is not None:
            # Under the quarantine policy, row-attributable failures were
            # ROUTED (published clean + dead-lettered bad) — freezing on
            # them would re-pick rows already safely landed, growing the
            # batch slice forever on one persistently-bad row. Only the
            # non-routable aggregate-granular failures (withheld wholesale,
            # genuinely re-pickable) freeze the watermark. With missing
            # mandatory roles (agg_only_parts is None) routing was skipped
            # entirely, so the conservative summary gate below applies.
            fail_fold = agg_only_parts.agg(
                F.count(F.lit(1)).alias("n_failed")
            )
        else:
            fail_fold = result.summary.agg(
                F.coalesce(
                    F.sum((F.col("failed_count") > 0).cast("int")),
                    F.lit(0),
                ).alias("n_failed")
            )
        wm_fold = df.agg(
            F.max(F.col(watermark_col)).cast("string").alias("wm")
        ).crossJoin(fail_fold)
        if exp_summary is not None:
            # expectation failures are DATA failures for watermark purposes:
            # a retry re-picks the same rows (plus arrivals) and may pass
            wm_fold = wm_fold.crossJoin(
                exp_summary.agg(
                    F.coalesce(
                        F.sum((~F.col("exp_passed")).cast("int")), F.lit(0)
                    ).alias("n_exp_failed")
                )
            )
        drift_gates_wm = (
            drift_summary is not None and drift_rule.severity == "error"
        )
        if drift_gates_wm:
            # so is error-severity drift: the batch stays re-pickable until
            # a later batch (or re-baseline) clears it
            wm_fold = wm_fold.crossJoin(
                drift_summary.agg(
                    F.coalesce(
                        F.sum((~F.col("drift_passed")).cast("int")), F.lit(0)
                    ).alias("n_drift_failed")
                )
            )
        fold = wm_fold.first()
        n_exp_failed = fold["n_exp_failed"] if exp_summary is not None else 0
        n_drift_failed = fold["n_drift_failed"] if drift_gates_wm else 0
        if (
            fold["n_failed"] == 0
            and n_exp_failed == 0
            and n_drift_failed == 0
            and fold["wm"] is not None
        ):
            store.record_watermark(watermark_col, fold["wm"])

    # Both tiny persisted summaries have fed their last action by here —
    # release the cached blocks so a long-lived driver looping
    # run_validation once per batch doesn't accumulate dead per-run caches
    # in executor storage memory.
    if exp_summary is not None:
        exp_summary.unpersist()
    if drift_summary is not None:
        drift_summary.unpersist()
    # ... and the validator's shared per-partition aggregate, which the
    # report writes / metrics collect / verdict fold above materialized.
    # RunOutcome.result stays usable — later actions recompute the tiny
    # aggregate instead of reading a stranded cache.
    result.release()

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

    if comp_report is not None:
        # a partition that never arrived (or arrived under-sized) fails the
        # RUN verdict even though no row-level rule could see it — there is
        # nothing to withhold from publish, so the verdict is the only
        # lever. 'unexpected' keys are reported but don't fail here: their
        # rows went through validation like any other partition's.
        incomplete = (
            comp_report.where(
                F.col("status").isin("missing", "undersized")
            ).count()
            > 0
        )
        passed_all = passed_all and not incomplete
        comp_report.unpersist()

    # keep the store's file count O(1) across 10^4 runs (each run appends
    # ~2 small files); single-writer at end-of-run, so the non-atomic swap
    # window documented on compact() cannot race a concurrent committer
    if compact_max_files is not None:
        store.maybe_compact(compact_max_files)

    return RunOutcome(
        run_id=run_id,
        rule_digest=digest,
        processed_partitions=processed,
        skipped_partitions=sorted(done),
        passed_all=passed_all,
        result=result,
        expectations=exp_report,
        drift=drift_rep,
        completeness=comp_report,
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
