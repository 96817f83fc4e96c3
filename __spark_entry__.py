"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data ops (dedup, similarity, text analysis);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only for
genuinely non-SQL-expressible ops, which get rows-only checks).

Parity notes baked into every query pair:
  * aggregates/computed columns aliased identically on both sides;
  * DuckDB SUM(int) returns HUGEINT → always CAST(... AS BIGINT);
  * double reductions that feed ROUND go through exact DECIMAL sums or are
    rounded far from representable boundaries;
  * float embeddings are cast to array<double>/DOUBLE[] BEFORE any math so
    both engines do the same IEEE ops in the same order;
  * the shared "derived transcripts" frame is built from ``events`` with the
    same integer-keyed CASE logic in both dialects.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators import drift as drift_mod
from ndap_data_validator_spark.operators import multimodal
from ndap_data_validator_spark.operators.dedup import (
    dedup_incremental_batch,
    exact_duplicate_groups,
    minhash_index,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from ndap_data_validator_spark.operators.referential import ri_violation_counts
from ndap_data_validator_spark.operators.similarity import cosine, hyperplanes, lsh_signature
from ndap_data_validator_spark.operators.stats import column_stats, merge_hll_to_global
from ndap_data_validator_spark.operators.uniqueness import duplicate_keys
from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.functions import textstats as T
from ndap_data_validator_spark.functions.coercion import compile_role_coercion
from ndap_data_validator_spark.functions.timeformat import time_format_label
from ndap_data_validator_spark.rules.model import ColumnAssignment

# --------------------------------------------------------------------- io

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to defaultParallelism ahead of a CPU-heavy
    per-row transform. The bench parquet files are single-row-group, so
    the scan plans ONE input split no matter what
    ``files.maxPartitionBytes``/``minPartitionNum`` say (parquet splits
    round down to row-group boundaries) and a heavy projection runs
    single-threaded — bpe_encode measured 4.0s in 1 task vs 0.4s spread.
    This is the standard remedy for any low-parallelism source feeding
    expensive narrow work (few large gzip files, giant row groups); the
    extra exchange carries the raw text once and is linear at any scale.
    Cheap scan-level entries skip it: the exchange costs more than it
    saves there.

    CONDITIONAL: when the source already plans enough splits (any real
    multi-file dataset — 100 TB scans have thousands), this is a no-op and
    adds NO exchange to the plan; the repartition fires only when planned
    input partitions sit under half the executor parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)


def _literal_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Tiny driver-side literal frame in ONE slice (VERDICT r04 #1/#6):
    bare ``spark.createDataFrame(list, schema)`` plans as a
    defaultParallelism-slice Python-RDD scan (``applySchemaToPythonRDD``,
    32 empty-ish tasks), and two of those joined on a constant key fold
    into a 1024-task CartesianProduct — 13s of pure harness overhead in
    r4's drift_report. One slice keeps every literal-frame stage at one
    task and makes the cartesian impossible to hit."""
    from ndap_data_validator_spark.session import literal_frame

    return literal_frame(spark, rows, schema)


# ------------------------------------------------- shared derived transcripts
# A transcript-shaped frame derived from `events` with injected coercion /
# time-format / null edge cases — the SAME integer-keyed CASE logic in the
# Spark build (below) and the DuckDB CTE (DERIVED_SQL), so the validation
# engine's counts are oracle-checkable.

_SPARK_DERIVED_EXPRS = [
    "concat('conv-', CAST(user_id % 20 AS STRING)) AS conv_id",
    "CAST(event_id % 100 AS INT) AS turn_idx",
    "event_type AS role",
    """CASE CAST(event_id % 6 AS INT)
         WHEN 0 THEN CAST(year(ts) AS STRING)
         WHEN 1 THEN concat('Mar-', CAST(year(ts) AS STRING))
         WHEN 2 THEN concat(CAST(year(ts) AS STRING), '-12')
         WHEN 3 THEN concat('Q1 ', CAST(year(ts) AS STRING))
         WHEN 4 THEN ''
         ELSE NULL END AS year_str""",
    """CASE CAST(event_id % 8 AS INT)
         WHEN 5 THEN CAST(value AS STRING)
         WHEN 6 THEN 'N/A'
         WHEN 7 THEN NULL
         ELSE CAST(CAST(value * 100 AS BIGINT) AS STRING) END AS int_m""",
    """CASE CAST(event_id % 5 AS INT)
         WHEN 3 THEN 'junk'
         WHEN 4 THEN NULL
         ELSE CAST(value AS STRING) END AS float_m""",
    "props AS tag",
]

DERIVED_SQL = """
  SELECT
    'conv-' || CAST(user_id % 20 AS VARCHAR) AS conv_id,
    CAST(event_id % 100 AS INT) AS turn_idx,
    event_type AS role,
    CASE CAST(event_id % 6 AS INT)
      WHEN 0 THEN CAST(year(ts) AS VARCHAR)
      WHEN 1 THEN 'Mar-' || CAST(year(ts) AS VARCHAR)
      WHEN 2 THEN CAST(year(ts) AS VARCHAR) || '-12'
      WHEN 3 THEN 'Q1 ' || CAST(year(ts) AS VARCHAR)
      WHEN 4 THEN ''
      ELSE NULL END AS year_str,
    CASE CAST(event_id % 8 AS INT)
      WHEN 5 THEN CAST(value AS VARCHAR)
      WHEN 6 THEN 'N/A'
      WHEN 7 THEN NULL
      ELSE CAST(CAST(value * 100 AS BIGINT) AS VARCHAR) END AS int_m,
    CASE CAST(event_id % 5 AS INT)
      WHEN 3 THEN 'junk'
      WHEN 4 THEN NULL
      ELSE CAST(value AS VARCHAR) END AS float_m,
    props AS tag
  FROM events
"""

# DuckDB version of the 6-pattern time-format labeler (functions/timeformat.py)
_M = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
LABEL_SQL = rf"""
    CASE
      WHEN trim(s) = '' THEN NULL
      WHEN regexp_matches(trim(s), '^\d{{4}}$') THEN 'YYYY'
      WHEN regexp_matches(trim(s), '^\d{{4}}-\d{{2}}$') THEN 'YYYY-YY'
      WHEN regexp_matches(trim(s), '(?i)^(?:{_M})-\d{{4}}$') THEN 'MMM-YYYY'
      WHEN regexp_matches(trim(s), '(?i)^(?:{_M})-(?:{_M}),\s*\d{{4}}$') THEN 'MMM-MMM, YYYY'
      WHEN regexp_matches(trim(s), '(?i)^(?:{_M}) - (?:{_M}),\s*\d{{4}}$') THEN 'MMM - MMM, YYYY'
      WHEN regexp_matches(trim(s), '(?i)^(0?[1-9]|[12][0-9]|3[01])-(?:{_M})-\d{{4}}$') THEN 'DD-MMM-YYYY'
      ELSE NULL END
"""

REASON_INVALID_TIME = (
    "Invalid time format; allowed: 'YYYY', 'YYYY-YY', 'MMM-YYYY', "
    "'MMM-MMM, YYYY', 'MMM - MMM, YYYY' "
)

_DERIVED_ASSIGNMENTS = [
    ColumnAssignment("conv_id", "Location"),
    ColumnAssignment("turn_idx", "Measures", "integer"),
    ColumnAssignment("role", "Others"),
    ColumnAssignment("year_str", "Time"),
    ColumnAssignment("int_m", "Measures", "integer"),
    ColumnAssignment("float_m", "Measures", "float"),
    ColumnAssignment("tag", "Others"),
]


def _derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (r06 measured both ways): the derived-frame consumers
    # partial-aggregate map-side to partition-count-sized rows, and their
    # per-row CASE/label work is cheap enough that a round-robin exchange
    # of the full 6-column events rows costs more than it parallelizes
    # (validation_report 0.68→1.0 s, key_skew 0.55→1.6 s with the spread).
    # Entries whose per-row work IS heavy (the try_cast/try_to_timestamp
    # chains) spread a PROJECTED frame instead — see q_coercion_report /
    # q_dtype_coercion_report / q_scalar_coercion.
    return _t(spark, sf_dir, "events").selectExpr(*_SPARK_DERIVED_EXPRS)


# ------------------------------------------------------------------ queries

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full rule-catalog validation report (EP2 lifecycle —
    coerce + count + rule evaluation in one shared scan) on the derived
    transcripts frame at sf0.001."""
    return q_validation_report(spark, "/root/testdata/sf0.001")


def q_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: per-column null counts in ONE agg over one scan (the reference
    re-parses per column; main.py:677, validation.py:127)."""
    e = _t(spark, sf_dir, "events")
    agg = e.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in e.columns]
    )
    structs = F.array(
        *[
            F.struct(F.lit(c).alias("column"), F.col(c).alias("nulls"))
            for c in e.columns
        ]
    )
    return agg.select(F.explode(structs).alias("s")).select("s.column", "s.nulls")


def q_coercion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3 conversion-error counting (errors = src non-null & coerced null,
    fractional→integer errors) as a long-form report."""
    # r06: project events to the 2 source columns the numeric exprs need,
    # then spread — the try_cast parse chains are the heavy part here
    # (same remedy as dtype_coercion_report; the exchange carries 16 bytes
    # per row instead of the full 6-column events rows)
    d = _spread(
        _t(spark, sf_dir, "events").select("event_id", "value")
    ).selectExpr(
        *[
            x
            for x in _SPARK_DERIVED_EXPRS
            if x.split()[-1] in ("int_m", "float_m")
        ]
    )
    cols = [("int_m", "integer"), ("float_m", "float")]
    aggs = []
    for name, mtype in cols:
        cc = compile_role_coercion(name, "Measures", mtype)
        aggs.append(F.sum(cc.error_pred.cast("long")).alias(name))
    agg = d.agg(*aggs)
    structs = F.array(
        *[
            F.struct(F.lit(n).alias("column"), F.col(n).alias("conversion_errors"))
            for n, _ in cols
        ]
    )
    return agg.select(F.explode(structs).alias("s")).select(
        "s.column", "s.conversion_errors"
    )


def q_time_format_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/A4: label census over the 6-pattern chain; invalid non-nulls
    bucketed as '<invalid>'."""
    d = _derived(spark, sf_dir)
    lbl = time_format_label(F.col("year_str"))
    return (
        d.where(F.col("year_str").isNotNull())
        .groupBy(F.coalesce(lbl, F.lit("<invalid>")).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 core: full per-column validation report from one shared scan."""
    res = ValidationEngine().validate(_derived(spark, sf_dir), _DERIVED_ASSIGNMENTS)
    return res.per_column_report.select(
        "partition_id",
        "column",
        "role",
        "nulls",
        "conversion_errors",
        "passed",
        F.concat_ws("; ", "reasons").alias("reasons"),
    )


_EXPECTED_ROLES = ["click", "error", "purchase", "signup", "view", "refund"]


def q_partition_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition verdicts, BOTH directions in one method-tagged entry
    (consolidated r05):

    * 'validate' — per-partition summaries ≙ the reference's per-file
      report rows (main.py:913-920), partitioned by the role column;
      detail carries the failed column list;
    * 'completeness' — operators/completeness.py census of the SAME
      partition key against an expected manifest (the domain plus a
      never-arriving 'refund' → one guaranteed 'missing' row; min_rows
      200 so small scale factors also exercise 'undersized'); detail
      carries the status, passed = (status == 'ok'). The gate row-level
      validation cannot express: rows that never arrived."""
    from ndap_data_validator_spark.operators.completeness import (
        partition_completeness,
    )

    res = ValidationEngine().validate(
        _derived(spark, sf_dir), _DERIVED_ASSIGNMENTS, partition_by="role"
    )
    validate_leg = res.summary.select(
        F.lit("validate").alias("method"),
        "partition_id",
        F.col("rows").alias("n_rows"),
        "failed_count",
        "passed",
        F.concat_ws(",", "failed_columns").alias("detail"),
    )
    comp_leg = partition_completeness(
        _derived(spark, sf_dir), "role", _EXPECTED_ROLES, min_rows=200
    ).select(
        F.lit("completeness").alias("method"),
        F.col("key").alias("partition_id"),
        "n_rows",
        F.lit(None).cast("long").alias("failed_count"),
        (F.col("status") == "ok").alias("passed"),
        F.col("status").alias("detail"),
    )
    return validate_leg.unionByName(comp_leg)


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: latest-per-key dedup (ROW_NUMBER over desc ordering,
    utils/db.py:493-501), deterministic tie-break on event_id."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_join_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left equi-join facts↔dim + per-group rollup; DECIMAL sums so both
    engines aggregate exactly."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def q_union_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION-distinct of key sets from three tables (utils/db.py:503-509)."""
    e = _t(spark, sf_dir, "events").select(F.col("user_id").alias("token"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("token"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("token"))
    return e.union(o).union(c).distinct()


def q_uniqueness_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule uniqueness, BOTH report shapes in one method-tagged entry
    (consolidated r05, cap — funds the sequence_checks slot):

    * 'key_census' — composite-key dup census via groupBy count>1 (map-side
      partial agg, cheapest violation count; uniqueness.duplicate_keys);
    * 'dup_rows' — every row participating in a duplicated key, tagged with
      its occurrence number under a stable order (uniqueness.duplicate_rows,
      one shuffle on the key, both windows share the partitioning) — the
      byte-comparable violation-report shape.

    Columns aligned as (method, o_custkey, detail, occurrence, dup_count);
    census rows carry detail=o_orderpriority and NULL occurrence, dup-row
    rows carry detail=str(o_orderkey)."""
    from ndap_data_validator_spark.operators.uniqueness import duplicate_rows

    o = _t(spark, sf_dir, "orders")
    census = duplicate_keys(o, ["o_custkey", "o_orderpriority"]).select(
        F.lit("key_census").alias("method"),
        "o_custkey",
        F.col("o_orderpriority").alias("detail"),
        F.lit(None).cast("int").alias("occurrence"),
        "dup_count",
    )
    rows = duplicate_rows(
        o.where(F.col("o_custkey") < 100), ["o_custkey"], order_by=["o_orderkey"]
    ).select(
        F.lit("dup_rows").alias("method"),
        "o_custkey",
        F.col("o_orderkey").cast("string").alias("detail"),
        "occurrence",
        "dup_count",
    )
    return census.unionByName(rows)


def q_ri_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/north_rule RI: dangling references via broadcast left-anti join
    (dimension restricted to even keys so violations exist)."""
    e = _t(spark, sf_dir, "events")
    ref = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 2 == 0)
    return ri_violation_counts(e, "user_id", ref, "c_custkey").select(
        F.col("value").alias("user_id"), "violation_count"
    )


_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

# dataset-level metric expectations riding the column_stats entry
# (operators/expectations.py — ONE aggregate evaluates every rule; the
# qty_max_strict rule is deliberately failing so both verdict polarities
# are oracle-checked). Values chosen order-independent (no float SUM) so
# the cross-engine hash is stable at 6 dp.
def _stats_expectation_rules():
    from ndap_data_validator_spark.operators.expectations import MetricRule

    return [
        MetricRule("rows_ok", "row_count", min_bound=1, max_bound=1e12),
        MetricRule(
            "qty_null_free", "null_fraction", column="l_quantity",
            max_bound=0.001,
        ),
        MetricRule(
            "qty_mean", "mean", column="l_quantity", min_bound=20, max_bound=30
        ),
        MetricRule("disc_min", "min", column="l_discount", min_bound=0.0),
        MetricRule("disc_max", "max", column="l_discount", max_bound=0.2),
        MetricRule(
            "orderkey_ratio", "distinct_ratio", column="l_orderkey",
            min_bound=0.05, max_bound=0.6,
        ),
        MetricRule(
            "positive_price", "compliance",
            expression="l_extendedprice > 0 AND l_quantity > 0",
            min_bound=1.0,
        ),
        MetricRule("qty_max_strict", "max", column="l_quantity", max_bound=10),
        # freshness vs the pinned reference instant _STATS_NOW (r05): lag
        # of max(l_shipdate) in seconds — the "did the latest data land?"
        # gate; bound generous because the TPC-H-ish dates are decades old
        MetricRule(
            "shipdate_fresh", "freshness", column="l_shipdate",
            min_bound=0, max_bound=2e9,
        ),
    ]


# explicit reference instant for the freshness rule — evaluation input,
# pinned so both engines (and every re-run) measure the same lag
_STATS_NOW = "2026-01-01T00:00:00"


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_star per-column stats block + dataset-level metric
    EXPECTATIONS, method-tagged in one long-form entry (consolidated r05 —
    the wide stats block reshaped to (name, metric, value) rows so the new
    expectations leg shares the schema):

    * 'stats' — min/max/mean/stddev/exact-distinct per measure column
      (exact distinct so the oracle can verify; the engine's approx/HLL
      variant is q_hll_distinct);
    * 'expect' — operators/expectations.py MetricRule verdicts (row_count,
      null_fraction, mean, min/max bounds, distinct_ratio, compliance)
      with lo/hi bounds and passed — incl. one deliberately failing rule.

    Both legs are single shared-scan aggregates (map-side partials, one
    tiny exchange); the union is two independent jobs over the same
    parquet, never a join."""
    from ndap_data_validator_spark.operators.expectations import (
        metric_expectations,
    )

    li = _spread(_t(spark, sf_dir, "lineitem"))
    aggs = []
    for c in _STATS_COLS:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
            F.round(F.stddev_samp(c), 2).alias(f"{c}__stddev"),
            F.count_distinct(F.col(c)).cast("double").alias(f"{c}__distinct"),
        ]
    agg = li.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("name"),
                F.lit(metric).alias("metric"),
                F.col(f"{c}__{suffix}").alias("value"),
            )
            for c in _STATS_COLS
            for metric, suffix in [
                ("min", "min"),
                ("max", "max"),
                ("mean", "mean"),
                ("stddev", "stddev"),
                ("distinct", "distinct"),
            ]
        ]
    )
    stats_leg = agg.select(F.explode(structs).alias("s")).select(
        F.lit("stats").alias("method"),
        "s.name",
        "s.metric",
        F.col("s.value").cast("double").alias("value"),
        F.lit(None).cast("double").alias("lo"),
        F.lit(None).cast("double").alias("hi"),
        F.lit(None).cast("boolean").alias("passed"),
    )
    expect_leg = metric_expectations(
        li, _stats_expectation_rules(), approx_distinct=False, now=_STATS_NOW
    ).select(
        F.lit("expect").alias("method"),
        F.col("rule").alias("name"),
        "metric",
        F.round("value", 6).alias("value"),
        F.col("min_bound").alias("lo"),
        F.col("max_bound").alias("hi"),
        "passed",
    )
    return stats_leg.unionByName(expect_leg)


_DRIFT_LO, _DRIFT_HI, _DRIFT_BINS = 0.0, 500_000.0, 20


def q_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift between two halves of orders (orderdate ≤1997 vs >1997), BOTH
    flavors in one row (consolidated r04, cap): binned KS/PSI (plus
    Jensen-Shannon and grid-Wasserstein-1 from the same bins, r05) and the
    fully distributed exact two-sample KS (per-value counts → range-sliced
    prefix-sum CDFs, no data-sized single task), all derived from ONE
    shared scan's per-value counts (r05), PLUS the categorical drift block
    (smoothed PSI + two-sample chi-square over o_orderpriority category
    counts — NEW r05), PLUS the PER-PARTITION leg (late r05): the ≤1997
    histogram (already on the driver from the shared reduction) becomes
    the baseline snapshot for operators/drift.drift_report_partitioned
    over the >1997 half keyed by o_orderpriority — the checkpointed-run
    drift operator (baseline grid as struct literals, one
    groupBy((partition, bin)) shuffle, window cumsum over ≤ n_bins+2 rows
    per partition, no driver collect) as long-form scope='<priority>'
    rows next to the scope='dataset' row."""
    from ndap_data_validator_spark.operators.drift import (
        categorical_drift,
        ks_exact_from_counts,
        two_sample_value_counts,
    )

    o = _t(spark, sf_dir, "orders")
    # ONE scan of orders: the per-value two-sample counts are the shared
    # reduction — both histograms derive from a width_bucket rollup of the
    # (cached, |distinct values|-sized) counts frame and the exact KS runs
    # its range-slice plan over the same cache (r05; the r4 entry scanned
    # orders three times). r06: the scan is projected + spread first — the
    # per-(priority, value) hash aggregate barely reduces near-unique
    # prices, so its map side is the bulk of the job and the
    # single-row-group bench parquet otherwise runs it in 2 tasks.
    counts_pg = two_sample_value_counts(
        _spread(o.select("o_totalprice", "o_orderdate", "o_orderpriority")),
        "o_totalprice",
        F.year("o_orderdate") <= 1997,
        group_cols=["o_orderpriority"],
    ).persist()
    # the ungrouped per-value counts the exact KS consumes are a cheap
    # re-aggregate of the cached per-(priority, value) reduction — the
    # priority dimension rides the SAME single scan for free
    counts = (
        counts_pg.groupBy("v")
        .agg(F.sum("a_cnt").alias("a_cnt"), F.sum("b_cnt").alias("b_cnt"))
        .persist()  # the KS plan references it twice (grid + CDF chains)
    )
    # The categorical block is an independent reduction (different column,
    # own scan) with no data dependency on the numeric legs — submit its
    # job from a worker thread so its wall time overlaps the two serial
    # numeric actions instead of adding to them (the entry is otherwise
    # four back-to-back driver round-trips of pure fixed cost at sf0.1).
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    cat_future = pool.submit(
        lambda: categorical_drift(
            o, "o_orderpriority", F.year("o_orderdate") <= 1997
        ).first()
    )
    try:
        # PER-PRIORITY histograms FIRST (one bin rollup over the cached
        # per-(priority, value) reduction materializes both caches; 110
        # rows to the driver), then the exact KS runs while categorical is
        # still in flight. The dataset histograms are the integer sums of
        # the per-priority ones — zero extra passes. (r06 measured the
        # tempting alternative — folding the histograms into the KS
        # aggregate as 44 sum(when(bin=i)) columns — at +4.8s: each
        # conditional aggregate re-evaluates width_bucket per row, and the
        # merge also serializes the KS behind work the pool overlaps.)
        b = F.width_bucket(
            F.col("v"), F.lit(_DRIFT_LO), F.lit(_DRIFT_HI), F.lit(_DRIFT_BINS)
        )
        hrows = counts_pg.groupBy(
            F.col("o_orderpriority").alias("prio"), b.alias("bin_id")
        ).agg(
            F.sum("a_cnt").alias("a"), F.sum("b_cnt").alias("b")
        ).collect()
        ha: dict[int, int] = {}
        hb: dict[int, int] = {}
        for row_ in hrows:
            i = int(row_["bin_id"])
            ha[i] = ha.get(i, 0) + int(row_["a"])
            hb[i] = hb.get(i, 0) + int(row_["b"])

        def grid(d):
            return {
                "o_totalprice": {
                    "lo": _DRIFT_LO,
                    "hi": _DRIFT_HI,
                    "n_bins": _DRIFT_BINS,
                    # zero-count bins stay ABSENT, exactly like the
                    # per-side histogram() aggregates they replace
                    "counts": {i: c for i, c in d.items() if c},
                }
            }

        (r,) = drift_mod.compare(grid(ha), grid(hb))
        # per-partition leg (late r05, r06 driver-side): every per-priority
        # histogram is ALREADY on the driver from the shared bin rollup, so
        # each priority's KS/PSI/JS/W1 comes from the same pure-Python
        # drift_mod.compare() the dataset row uses — zero extra jobs (the
        # former drift_report_partitioned run over even a 110-row literal
        # cost ~1.7 s of pure multi-stage fixed overhead). compare() and
        # the partitioned SQL fold are the same math: ks/psi/w1 verified
        # bit-identical on the bench fixtures; js agrees to 1 ulp (~1e-18
        # relative — 11 orders of magnitude below the 6-dp rounding), and
        # the oracle MATCH was re-proven at sf0.001/0.01/0.1 after the
        # switch. drift_report_partitioned remains the operator for real
        # 10^5-partition tables, where histograms must NOT collect.
        per_prio: dict[str, dict[int, int]] = {}
        for row_ in hrows:
            if row_["b"]:
                per_prio.setdefault(row_["prio"], {})[
                    int(row_["bin_id"])
                ] = int(row_["b"])
        part_rows = []
        for prio in sorted(per_prio):
            (pres,) = drift_mod.compare(
                grid(ha),
                {
                    "o_totalprice": {
                        "lo": _DRIFT_LO,
                        "hi": _DRIFT_HI,
                        "n_bins": _DRIFT_BINS,
                        "counts": per_prio[prio],
                    }
                },
            )
            part_rows.append(
                {
                    "partition_id": prio,
                    "ks": pres.ks,
                    "psi": pres.psi,
                    "js": pres.js,
                    "w1": pres.w1,
                }
            )
        # the exact KS reads the already-materialized cache (r06: its
        # offsets window now also carries the grand totals, one broadcast
        # stage fewer per call); categorical is still in flight on the
        # pool, so the tail is max(KS, categorical)
        ks_exact = ks_exact_from_counts(counts).first()["ks"]
        # categorical drift (NEW r05) on the same split, over the
        # categorical column: per-category two-sample counts → smoothed PSI
        # + two-sample chi-square, all Catalyst arithmetic on the
        # category-sized frame (job already running on the worker thread)
        cat = cat_future.result()
    finally:
        counts.unpersist()
        counts_pg.unpersist()
        pool.shutdown(wait=False)
    # Every output value is a driver-side scalar at this point — assemble
    # ONE single-slice literal row instead of joining two RDD-backed 1-row
    # frames on a constant key, which Catalyst folds into a condition-less
    # 32×32-task CartesianProduct (VERDICT r04 #1: 13-14s of the 15.8s
    # entry was that join).
    return _literal_df(
        spark,
        [(
            "dataset",
            r.column,
            round(r.ks, 6),
            round(r.psi, 4),
            round(r.js, 6),
            round(r.w1, 3),
            round(ks_exact, 6),
            "o_orderpriority",
            round(cat["psi_cat"], 6),
            round(cat["chi2_cat"], 4),
            int(cat["n_categories"]),
        )] + [(
            p["partition_id"],
            "o_totalprice",
            round(p["ks"], 6),
            round(p["psi"], 4),
            round(p["js"], 6),
            round(p["w1"], 3),
            None,
            None,
            None,
            None,
            None,
        ) for p in part_rows],
        "scope string, column string, ks_binned double, psi double, "
        "js double, w1 double, ks_exact double, "
        "cat_column string, psi_cat double, chi2_cat double, n_categories int",
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup groups over documents: (fingerprint, keeper_id, dup_count)
    for ALL groups (synthetic docs may have no dups; the grouping itself is
    the operator under test)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.col("doc_id"), T.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dup pairs on a bounded slice (the VERIFY
    stage of the dedup pipeline). broadcast_tokens=True is the verified-small
    opt-in: the 120-doc token side broadcasts instead of shuffle-joining on
    the (hot) token key."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return ngram_jaccard_pairs(
        d, n=1, threshold=0.9, broadcast_tokens=True
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality signal block — one codegen'd projection; carries the
    regex-pretokenizer token count (consolidated r04, cap — the real
    merge-table BPE count has its own bpe_encode entry) and the n-gram
    language guess (lang_id folded in r05, cap: same per-doc row shape,
    one more scan-level column — the slot funds bpe_train)."""
    d = _spread(_t(spark, sf_dir, "documents"))
    c = F.col("text")
    return d.select(
        "doc_id",
        T.token_count_ws(c).alias("n_tokens_ws"),
        T.token_count_bpe(c).alias("n_tokens_bpe"),
        F.round(T.alpha_ratio(c), 4).alias("alpha_ratio"),
        F.round(T.stopword_ratio(c), 4).alias("stopword_ratio"),
        F.round(T.repetition_ratio(c, n=3), 4).alias("repetition_ratio"),
        T.fingerprint(c).alias("fingerprint"),
        T.lang_id(c).alias("lang_guess"),
    )


_BPE_TRAIN_DOCS = 160  # doc_id bound: fixed-cost training slice at any SF
_BPE_TRAIN_MERGES = 10


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE vocabulary training (VERDICT r04 #3): learn the
    merge table from the corpus itself — per round ONE explode+groupBy
    pair-count shuffle (output is vocabulary-sized), a top-1 TakeOrdered,
    one literal replace, lineage cut per round via localCheckpoint. The
    DuckDB oracle replays the full greedy loop as unrolled CTE steps with
    the identical state/tie-break expressions, so the learned sequence is
    checked rank-for-rank, counts included."""
    from ndap_data_validator_spark.functions.bpe import bpe_train_merges

    docs = _t(spark, sf_dir, "documents").where(
        F.col("doc_id") < _BPE_TRAIN_DOCS
    )
    merges = bpe_train_merges(docs, "text", num_merges=_BPE_TRAIN_MERGES)
    return _literal_df(
        spark,
        [(k, a, b, a + b, cnt) for k, (a, b, cnt) in enumerate(merges)],
        "rank int, lhs string, rhs string, merged string, pair_count long",
    )


_ANN_PLANES = 8
_ANN_DIM = 64


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucket assignment (the
    precomputable index column)."""
    planes = hyperplanes(_ANN_DIM, _ANN_PLANES, seed=42)
    # r06: spread — the 8×64-dim dot products per row otherwise run in the
    # single-row-group scan's ONE task at bench SFs (guide §2.5)
    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    return emb.select("vec_id", lsh_signature(F.col("v"), planes).alias("bucket"))


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-family sorts/limits (SURVEY §2.7): top-k with a deterministic
    tie-break so the result SET is stable across engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_SEQ_ROLES = ("click", "error", "purchase", "signup", "view")
_SEQ_TRANSITIONS = frozenset(
    (a, b) for a in _SEQ_ROLES for b in _SEQ_ROLES if b != "signup"
)


def q_sequence_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r05 — conversation-order sequence checks (operators/convchecks.py),
    the transcript-shaped window rules the north_rule's payload needs beyond
    per-row checks: order gaps, ts regressions, role repeats, long
    silences, and the role-transition FSM ('bad_transition': 'signup' may
    only open a conversation — the "a tool turn must follow an assistant
    turn" rule class).

    Events is deterministically reshaped into a transcript frame (conv_id=
    user_id, turn_idx=row_number per user by event_id, role=event_type),
    then violations are INJECTED the replayable way: every 7th event_id row
    is dropped (punches turn-contiguity holes) and every 11th has its ts
    pulled back 720h (creates regressions, and 500h+ recovery gaps after
    them). ONE window shuffle on the conversation key computes all four
    checks in the same projection (lag ts/role), unpivoted via
    array_compact+explode — no per-check pass.

    PLUS (late r05) the row-level CHECK-constraint family
    (rules.model.CheckRule → operators/checks.py): two cross-column rules
    over the same frame — 'value_cap' (value <= 400) and 'error_low_value'
    (role <> 'error' OR value < 100) — standard-SQL CHECK semantics (only
    definite FALSE violates; NULL passes), evaluated in one scan-level
    projection with ZERO shuffles; rows union under the same
    (conv_id, turn_idx, check) contract.

    PLUS (late r05) JSON payload conformance (operators/jsonschema.py) —
    the tool-call-arguments check a transcript validator needs: each turn
    carries a synthesized JSON payload with replayable planted defects
    (event_id%13: malformed / required-field-absent / wrong-typed field),
    classified malformed vs missing vs type-error via the
    get_json_object-probe + from_json pairing, unpivoted to long rows
    ('json_malformed', 'json_missing_<f>', 'json_type_<f>') — also a
    zero-shuffle scan-level projection; DuckDB replays it with
    json_valid/json_extract/TRY_CAST."""
    from ndap_data_validator_spark.operators.checks import check_violations
    from ndap_data_validator_spark.operators.convchecks import sequence_checks
    from ndap_data_validator_spark.rules.model import CheckRule

    e = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & (F.col("user_id") < 75)
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = e.select(
        F.col("user_id").alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.when(
            F.col("event_id") % 11 == 0,
            F.col("ts") - F.expr("INTERVAL 720 HOURS"),
        )
        .otherwise(F.col("ts"))
        .alias("ts"),
        "event_id",
        "value",
    ).where(F.col("event_id") % 7 != 0)
    seq = sequence_checks(
        t,
        key_col="conv_id",
        order_col="turn_idx",
        ts_col="ts",
        role_col="role",
        expected_step=1,
        max_gap_sec=500 * 3600,
        # role-transition FSM (late r05): 'signup' may only OPEN a
        # conversation — any transition INTO it violates. The whitelist is
        # every (prev, cur) pair over the five event roles with
        # cur != 'signup'; compiled to a codegen disjunction in Spark and
        # rendered as row-value IN in the oracle (identical NULL
        # semantics: UNKNOWN membership passes).
        allowed_transitions=_SEQ_TRANSITIONS,
    )
    chk = check_violations(
        t,
        [
            CheckRule("value_cap", "value <= 400"),
            CheckRule("error_low_value", "role <> 'error' OR value < 100"),
        ],
        key_cols=("conv_id", "turn_idx"),
    )
    from ndap_data_validator_spark.operators.jsonschema import (
        json_schema_report,
    )

    # PLUS (late r05) JSON payload conformance (operators/jsonschema.py):
    # every turn carries a synthesized tool-call arguments payload with
    # replayable planted defects — event_id%13==0 malformed JSON, ==1 the
    # required 'tool' field absent, ==2 'retries' present as a non-numeric
    # string (type error). Long-form rows under the same contract;
    # 'tool' can never type-error on this data, so the oracle only
    # mirrors the retries type leg.
    _eid = F.col("event_id")
    pay = (
        F.when(_eid % 13 == 0, F.lit('{"tool": broken'))
        .when(
            _eid % 13 == 1,
            F.concat(
                F.lit('{"retries":'), (_eid % 5).cast("string"), F.lit("}")
            ),
        )
        .when(
            _eid % 13 == 2,
            F.concat(
                F.lit('{"tool":"t-'),
                _eid.cast("string"),
                F.lit('","retries":"lots"}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"tool":"t-'),
                _eid.cast("string"),
                F.lit('","retries":'),
                (_eid % 5).cast("string"),
                F.lit("}"),
            )
        )
    )
    rep = json_schema_report(
        t.select("conv_id", "turn_idx", pay.alias("payload")),
        "payload",
        "tool string, retries int",
        required=("tool", "retries"),
        id_cols=("conv_id", "turn_idx"),
    )
    _empty = F.array().cast("array<string>")
    jv = rep.select(
        "conv_id",
        "turn_idx",
        F.explode(
            F.concat(
                F.when(
                    ~F.col("parse_ok"), F.array(F.lit("json_malformed"))
                ).otherwise(_empty),
                F.when(
                    F.col("parse_ok"),
                    F.transform(
                        "missing",
                        lambda m: F.concat(F.lit("json_missing_"), m),
                    ),
                ).otherwise(_empty),
                F.transform(
                    "type_errors",
                    lambda m: F.concat(F.lit("json_type_"), m),
                ),
            )
        ).alias("check"),
    )
    return seq.unionByName(chk).unionByName(jv)


def q_dtype_coercion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 dtype-selection driver (coerce_dataframe_to_selected_types parity):
    whole-frame coercion report in one agg."""
    from ndap_data_validator_spark.operators.coerce import coerce_by_dtypes

    # r06: project events to the 3 source columns the derived exprs need,
    # then spread — the single-row-group bench parquet plans 1-2 scan
    # splits, so the regex-heavy coercion aggregate otherwise runs nearly
    # single-threaded (guide §2.5 input skew; same remedy as bpe_encode).
    e = _spread(_t(spark, sf_dir, "events").select("event_id", "ts", "value"))
    d = e.selectExpr(
        *[
            x
            for x in _SPARK_DERIVED_EXPRS
            if x.split()[-1] in ("year_str", "int_m", "float_m")
        ]
    )
    _, report = coerce_by_dtypes(
        d, {"year_str": "integer", "int_m": "integer", "float_m": "float"}
    )
    return report


# Separate derived frame for boolean/datetime coercion (kept out of the main
# derived transcripts so the validation_report oracle is unchanged): the SAME
# integer-keyed CASE logic in both dialects.
_SPARK_BOOL_TS_EXPRS = [
    """CASE CAST(event_id % 9 AS INT)
         WHEN 0 THEN 'true'
         WHEN 1 THEN 'T'
         WHEN 2 THEN ' yes '
         WHEN 3 THEN 'Y'
         WHEN 4 THEN '0'
         WHEN 5 THEN 'No'
         WHEN 6 THEN '2'
         WHEN 7 THEN ''
         ELSE NULL END AS bool_m""",
    """CASE CAST(event_id % 7 AS INT)
         WHEN 0 THEN date_format(ts, 'yyyy-MM-dd HH:mm:ss')
         WHEN 1 THEN date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
         WHEN 2 THEN date_format(ts, 'yyyy-MM-dd')
         WHEN 3 THEN date_format(ts, 'yyyy/MM/dd')
         WHEN 4 THEN date_format(ts, 'dd-MM-yyyy')
         WHEN 5 THEN 'not-a-date'
         ELSE NULL END AS ts_str""",
]

BOOL_TS_SQL = """
  SELECT
    CASE CAST(event_id % 9 AS INT)
      WHEN 0 THEN 'true'
      WHEN 1 THEN 'T'
      WHEN 2 THEN ' yes '
      WHEN 3 THEN 'Y'
      WHEN 4 THEN '0'
      WHEN 5 THEN 'No'
      WHEN 6 THEN '2'
      WHEN 7 THEN ''
      ELSE NULL END AS bool_m,
    CASE CAST(event_id % 7 AS INT)
      WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      WHEN 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
      WHEN 2 THEN strftime(ts, '%Y-%m-%d')
      WHEN 3 THEN strftime(ts, '%Y/%m/%d')
      WHEN 4 THEN strftime(ts, '%d-%m-%Y')
      WHEN 5 THEN 'not-a-date'
      ELSE NULL END AS ts_str
  FROM events
"""


def q_scalar_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/P8 + C5 in one entry (consolidated r04 to stay under the
    driver's 50-query cap — VERDICT r03 #1): boolean token coercion census
    (reference token sets, utils/validation.py:60-76) and datetime coercion
    over the pinned ISO-variant grammar (utils/validation.py:79-85 as
    try_to_timestamp fallbacks), unioned into a superset-schema row per
    column — true/false/null/error counts for bool_m, parsed/error counts
    plus min/max for ts_str."""
    from ndap_data_validator_spark.functions.coercion import (
        coerce_to_boolean,
        coerce_to_datetime,
    )

    # ONE pass (r06): the former two-agg union scanned events twice; both
    # rows now come from a single shared aggregate (guide §2.4), and the
    # scan is projected to (event_id, ts) then spread so the
    # try_to_timestamp/boolean-token chains run on every core instead of
    # the source's one-or-two parquet splits (guide §2.5 input skew).
    d = _spread(
        _t(spark, sf_dir, "events").select("event_id", "ts")
    ).selectExpr(*_SPARK_BOOL_TS_EXPRS)
    bval, berr = coerce_to_boolean(F.col("bool_m"))
    tval, terr = coerce_to_datetime(F.col("ts_str"))
    agg = d.agg(
        F.sum((bval == True).cast("long")).alias("__n_true"),  # noqa: E712
        F.sum((bval == False).cast("long")).alias("__n_false"),  # noqa: E712
        F.sum(bval.isNull().cast("long")).alias("__b_nulls"),
        F.sum(berr.cast("long")).alias("__b_errs"),
        F.sum(tval.isNotNull().cast("long")).alias("__n_parsed"),
        F.sum(terr.cast("long")).alias("__t_errs"),
        F.date_format(F.min(tval), "yyyy-MM-dd HH:mm:ss").alias("__min_ts"),
        F.date_format(F.max(tval), "yyyy-MM-dd HH:mm:ss").alias("__max_ts"),
    )
    rows = F.array(
        F.struct(
            F.lit("bool_m").alias("column"),
            F.col("__n_true").alias("n_true"),
            F.col("__n_false").alias("n_false"),
            F.col("__b_nulls").alias("nulls"),
            F.lit(None).cast("long").alias("n_parsed"),
            F.col("__b_errs").alias("conversion_errors"),
            F.lit(None).cast("string").alias("min_ts"),
            F.lit(None).cast("string").alias("max_ts"),
        ),
        F.struct(
            F.lit("ts_str").alias("column"),
            F.lit(None).cast("long").alias("n_true"),
            F.lit(None).cast("long").alias("n_false"),
            F.lit(None).cast("long").alias("nulls"),
            F.col("__n_parsed").alias("n_parsed"),
            F.col("__t_errs").alias("conversion_errors"),
            F.col("__min_ts").alias("min_ts"),
            F.col("__max_ts").alias("max_ts"),
        ),
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS + KEEPERS in one entry (consolidated r04, cap):
    exact-jaccard pairs → iterative min-label connected components, joined
    back to every doc — (doc_id, comp, is_keeper) where comp is NULL for
    unpaired docs and the keeper is the min-id member of each cluster (the
    dedup pipeline's final select, dedup.py dedup_keepers semantics).
    Oracle = recursive-CTE transitive closure + the same keeper rule."""
    from ndap_data_validator_spark.operators.dedup import connected_components

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    pairs = ngram_jaccard_pairs(d, n=1, threshold=0.9, broadcast_tokens=True)
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "comp"
    )
    return d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        "comp",
        (F.col("comp").isNull() | (F.col("doc_id") == F.col("comp"))).alias(
            "is_keeper"
        ),
    )


def q_text_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH scan-level text gates, long form (consolidated r05 #2 to fund
    the key_skew slot, cap; was ``pii_scrub`` + ``url_domain_filter``),
    columns aligned as (gate, doc_id, n_matches, detail):

    * 'pii_email' / 'pii_ipv4' / 'pii_phone' — per-kind match counts over
      documents with injected spans (planted by doc_id so both engines see
      identical inputs); 'pii_redact' carries the total match count and the
      md5 of the redacted text (the REWRITE is what's verified). Java∩RE2
      patterns, ordered redaction — one projection, zero shuffles.
    * 'url_keep' — domain-blocklist survivors (URLs planted on every 5th
      document, two domains blocked): n_matches = n_urls, detail = sorted
      extracted domains. Extraction and the gate are one scan-level
      projection+filter, no shuffle."""
    from ndap_data_validator_spark.functions.pii import pii_count, redact_pii
    from ndap_data_validator_spark.functions.urls import (
        domain_blocklist_filter,
        extract_domains,
        extract_urls,
    )

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr(
                """CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN ' contact a.b@example.com now'
                     WHEN 1 THEN ' from 10.1.2.3 logged'
                     WHEN 2 THEN ' call +1 (415) 555-0199 today'
                     ELSE '' END"""
            ),
        ).alias("text"),
    )
    t = F.col("text")
    counted = injected.select(
        "doc_id",
        pii_count(t, "email").alias("n_emails"),
        pii_count(t, "ipv4").alias("n_ipv4"),
        pii_count(t, "phone").alias("n_phones"),
        F.md5(redact_pii(t)).alias("redacted_md5"),
    )
    gates = F.array(
        F.struct(
            F.lit("pii_email").alias("gate"),
            F.col("n_emails").alias("n_matches"),
            F.lit(None).cast("string").alias("detail"),
        ),
        F.struct(
            F.lit("pii_ipv4").alias("gate"),
            F.col("n_ipv4").alias("n_matches"),
            F.lit(None).cast("string").alias("detail"),
        ),
        F.struct(
            F.lit("pii_phone").alias("gate"),
            F.col("n_phones").alias("n_matches"),
            F.lit(None).cast("string").alias("detail"),
        ),
        F.struct(
            F.lit("pii_redact").alias("gate"),
            (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")).alias(
                "n_matches"
            ),
            F.col("redacted_md5").alias("detail"),
        ),
    )
    pii_rows = counted.select(
        "doc_id", F.explode(gates).alias("g")
    ).select("g.gate", "doc_id", "g.n_matches", "g.detail")

    du = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    with_urls = du.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" see http://site-"),
                (F.col("doc_id") % 13).cast("string"),
                F.lit(".example.com/page?x=1 ok"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    kept = domain_blocklist_filter(
        with_urls, ["site-3.example.com", "site-7.example.com"]
    )
    url_rows = kept.select(
        F.lit("url_keep").alias("gate"),
        "doc_id",
        F.size(extract_urls(F.col("text"))).alias("n_matches"),
        F.concat_ws(",", F.array_sort(extract_domains(F.col("text")))).alias(
            "detail"
        ),
    )
    return pii_rows.unionByName(url_rows)


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew / heavy-hitter report (NEW r05) over the derived transcript
    frame's conversation key — the diagnostic that feeds
    ``plans.pipeline.salt_repartition`` and AQE skew handling (the
    north-star brief's skewed-conversations clause). Top-10 heaviest
    conv_ids with share-of-corpus and the distribution's max/mean skew
    factor; counts = ONE map-side-combined shuffle, top-N =
    TakeOrderedAndProject (never a global sort)."""
    from ndap_data_validator_spark.operators.skew import key_skew_report

    return key_skew_report(_derived(spark, sf_dir), "conv_id", top_n=10)


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful window op: inactivity-gap sessionization of events per user
    (lag → run-sum session ids → rollup); tie-break on event_id makes the
    numbering total and cross-engine stable."""
    from ndap_data_validator_spark.operators.sessions import session_rollup

    e = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    s = session_rollup(
        e, key_col="user_id", ts_col="ts", timeout_sec=3600,
        order_tiebreak="event_id",
    )
    return s.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "duration_sec",
    )


def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL THREE deterministic sampling shapes in one method-tagged entry
    (consolidated r04/r05, cap), columns aligned as
    (method, row_key, value, keep):

    * 'uniform' — hash-gate sample (pure function of the key — stable
      under any partitioning/engine, predicate pushdown applies, no
      shuffle); value = o_totalprice, rows are the kept sample;
    * 'stratified' — the training-mix variant (per-stratum
      integer-threshold keep-rates: 10% F / 2% O / all P orders);
    * 'dsir' (NEW r05) — DSIR importance resampling (operators/dsir.py):
      raw documents < 300 scored against the doc_id%5==0 target slice in
      hashed unigram+bigram space, Gumbel-top-25% selection via the exact
      distributed (1−0.25)-percentile threshold; value = priority
      (log importance weight + hash-Gumbel), keep = selected. DuckDB
      replays fit → score → Gumbel → quantile threshold end to end."""
    from ndap_data_validator_spark.operators.dsir import dsir_select
    from ndap_data_validator_spark.operators.sample import (
        deterministic_sample,
        stratified_sample,
    )

    o = _t(spark, sf_dir, "orders")
    uni = deterministic_sample(o, "o_orderkey", 0.1, seed=7).select(
        F.lit("uniform").alias("method"),
        F.col("o_orderkey").alias("row_key"),
        F.col("o_totalprice").alias("value"),
        F.lit(True).alias("keep"),
    )
    strat = stratified_sample(
        o, "o_orderstatus", _STRATA_RATES, "o_orderkey", seed=11
    ).select(
        F.lit("stratified").alias("method"),
        F.col("o_orderkey").alias("row_key"),
        F.col("o_totalprice").alias("value"),
        F.lit(True).alias("keep"),
    )
    # r06: filter BEFORE the spread — the former _spread(documents) put the
    # whole corpus through the round-robin exchange to feed a ≤300-doc DSIR
    # leg (guide §2.3: shuffle only what the operator consumes); the filter
    # also pushes down to the parquet scan now.
    d = _t(spark, sf_dir, "documents")
    raw = _spread(
        d.where(F.col("doc_id") < 300).select("doc_id", "text")
    )
    tgt = _spread(
        d.where(
            (F.pmod(F.col("doc_id"), F.lit(5)) == 0) & (F.col("doc_id") < 400)
        ).select("text")
    )
    dsir = dsir_select(raw, tgt, keep_fraction=0.25, n_buckets=4096).select(
        F.lit("dsir").alias("method"),
        F.col("doc_id").alias("row_key"),
        F.col("priority").alias("value"),
        "keep",
    )
    return uni.unionByName(strat).unionByName(dsir)


_STRATA_RATES = {"F": 0.1, "O": 0.02, "P": 1.0}


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH benchmark-decontamination flavors, method-tagged (consolidated
    r05 to fund the repeated_ngrams slot; columns aligned as
    (method, doc_id, n_matches, score, contaminated)):

    * 'exact' — GPT-3/Dolma-style n-gram collision: every 7th document
      plays the 'evaluation suite'; its distinct 8-gram hash set is
      broadcast and each document reports its overlap (score =
      hit_ratio; benchmark members flag themselves at 1.0);
    * 'fuzzy' — benchmark items are corpus docs with an appended suffix
      (the exact check's worst case, an easy fuzzy catch): cross-corpus
      MinHash-LSH band join against the broadcast benchmark index, exact
      Jaccard verify, per-doc rollup (score = max_jaccard, NULL when no
      candidate survives). md5-portable end to end;
    * 'bloom' (NEW r05) — the MEMORY-BOUNDED variant: the same benchmark
      n-gram set packed into a fixed 2^20-bit Bloom bitset (32-bit words,
      k=3 re-hashes), probed with 3 broadcast joins — the Dolma-scale
      index whose size is constant in the benchmark suite. A 'hit' is
      maybe-in (over-flag only, never miss); DuckDB replays the exact
      bit arithmetic."""
    from ndap_data_validator_spark.operators.decontaminate import (
        benchmark_ngram_hashes,
        bloom_bitset,
        decontaminate,
        decontaminate_bloom,
        decontaminate_fuzzy,
    )

    docs = _spread(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 400))
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(7)) == 0)
    bh = benchmark_ngram_hashes(bench, n=8, seed=42, hash_fn="md5")
    exact = decontaminate(docs, bh, n=8, seed=42, hash_fn="md5").select(
        F.lit("exact").alias("method"),
        "doc_id",
        F.col("n_hits").alias("n_matches"),
        F.col("hit_ratio").alias("score"),
        "contaminated",
    )
    bs = bloom_bitset(bh, m_bits=1 << 20, k=3, seed=101, hash_fn="md5")
    bloom = decontaminate_bloom(
        docs, bs, n=8, m_bits=1 << 20, k=3, seed=42, bloom_seed=101,
        hash_fn="md5",
    ).select(
        F.lit("bloom").alias("method"),
        "doc_id",
        F.col("n_hits").alias("n_matches"),
        F.col("hit_ratio").alias("score"),
        "contaminated",
    )

    fdocs = _spread(
        _t(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
    )
    fbench = fdocs.where(F.pmod(F.col("doc_id"), F.lit(11)) == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" eval suite suffix")).alias("text"),
    )
    fuzzy = decontaminate_fuzzy(
        fdocs, fbench, threshold=0.5, num_hashes=16, bands=8, shingle_n=3,
        seed=42, hash_fn="md5",
    ).select(
        F.lit("fuzzy").alias("method"),
        "doc_id",
        F.col("n_bench_matches").alias("n_matches"),
        F.round("max_jaccard", 4).alias("score"),
        "contaminated",
    )
    return exact.unionByName(fuzzy).unionByName(bloom)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TF-IDF top-3 terms per document (postings groupBy →
    vocabulary-df join → broadcast N → per-doc window). Rank on the rounded
    score + term tie-break = cross-engine-stable ordering. r05: the same
    rows also carry the Lucene-form Okapi BM25 score (saturated tf,
    length-normalized against avgdl) — zero extra corpus shuffles."""
    from ndap_data_validator_spark.operators.tfidf import tfidf_top_terms

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return tfidf_top_terms(d, k=3, min_df=2, bm25=True)


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end curation pass (operators/curate.py): quality
    gate → language gate → exact-dedup keepers → decontamination, with a
    planted duplicate (clone of doc 1) and every 31st doc as the
    'benchmark'. Returns the per-stage survivor funnel — the data-card
    table; DuckDB replays all four gates."""
    from ndap_data_validator_spark.operators.curate import curate_corpus

    base = _spread(
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 600)
        .select("doc_id", "text")
    )
    clone = base.where(F.col("doc_id") == 1).withColumn(
        "doc_id", F.lit(700_000).cast("long")
    )
    docs = base.unionByName(clone)
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(31)) == 0)
    _, funnel = curate_corpus(
        docs, bench, min_quality=0.5, languages=("en",),
        decontaminate_n=8, seed=42, hash_fn="md5",
    )
    return funnel


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates via LSH self-buckets + a planted
    clone — oracle-checked: DuckDB replays the hyperplane signatures
    (seeded literals), the bucket self-join, and the cosine threshold."""
    from ndap_data_validator_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    # r06: spread — signature dot products and bucket pairing otherwise
    # hang off the single-row-group scan's ONE task at bench SFs
    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    clone = emb.where(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(100_000).cast("long")
    )
    # r06: the operator references its input 3× (bucket signatures + both
    # vector-attach sides) and each reference replicated the scan+spread
    # subtree — 16 scans / 27 exchanges in the initial plan. One lazy
    # localCheckpoint materializes the (vector-sized) input once; every
    # branch reads the cached blocks.
    data = emb.unionByName(clone).localCheckpoint(eager=False)
    pairs = embedding_near_duplicates(
        data, dim=_ANN_DIM, threshold=0.95,
        n_planes=_ANN_PLANES, n_tables=1, seed=42,
        # verified-small fixture: the ~1M candidate pairs would otherwise
        # shuffle with their attached 512-byte vector payloads (guide §8)
        broadcast_vectors=True,
    )
    return pairs.select("id_a", "id_b", F.round("cos", 4).alias("cos"))


def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing (pure Catalyst, oracle-checked):
    (media_id, frame_ts_ms) explode that precedes a video decode kernel —
    durations derived deterministically from doc_id."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    media = d.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("video").alias("kind"),
        ((F.col("doc_id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return multimodal.frame_sample_plan(media, every_ms=400).select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same linear
    interpolation on sorted values), computed DISTRIBUTED: per-value counts
    → range-sliced window CDF → order-statistic lookup — no single
    aggregation buffer ever holds all values (the r02 weak spot; single-group
    ``percentile()`` is OOM territory at 100×)."""
    from ndap_data_validator_spark.operators.stats import (
        exact_percentiles_plan,
    )

    # r06: spread the projected value column (the per-value-counts hash
    # aggregate barely reduces near-unique doubles, so its map side is the
    # whole cost — 6 effective scan tasks otherwise); then the LAZY plan
    # twin — interpolation in-plan, so the whole entry is ONE action
    # instead of an eager multi-broadcast prefix plus a literal-frame
    # write (same arithmetic op-for-op, bit-identical).
    li = _spread(_t(spark, sf_dir, "lineitem").select("l_extendedprice"))
    res = exact_percentiles_plan(
        li, "l_extendedprice", ps=(0.5, 0.95, 0.99)
    )
    return res.select(
        "column",
        F.round("p50", 4).alias("p50"),
        F.round("p95", 4).alias("p95"),
        F.round("p99", 4).alias("p99"),
    )


def q_csv_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 raw-file form (the reference's entire ingestion is CSV,
    main.py:120-125): events round-tripped through a CSV copy, read back via
    the csv: source scheme WITH an explicit schema (no inferSchema pass),
    then rolled up — the oracle runs the same rollup on the parquet
    original, so the round-trip itself is what's verified."""
    import os as _os

    from ndap_data_validator_spark.sources.tables import load_table

    base = _os.path.join(
        "/root/repo/.cache/csv", _os.path.basename(_os.path.normpath(sf_dir))
    )
    marker = _os.path.join(base, "events.csv", "_SUCCESS")
    if not _os.path.exists(marker):
        (
            _t(spark, sf_dir, "events")
            .select("event_id", "user_id", "event_type", "value")
            .coalesce(4)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(_os.path.join(base, "events.csv"))
        )
    e = load_table(
        spark,
        f"csv:{base}",
        "events",
        schema="event_id bigint, user_id bigint, event_type string, value double",
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


def q_three_way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: chained key joins (lineage report shape, utils/db.py:548-551) —
    orders→customer→nation rollup; small dims broadcast."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def q_except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diffing, BOTH granularities in one method-tagged entry
    (consolidated r05):

    * 'except' — U-family extension (SURVEY §2.8 note): exceptAll for
      violation diffing — event types present in the first half of the
      data but missing (per occurrence) from the second half;
    * 'reconcile' — operators/reconcile.py keyed cell-level diff
      (datacompy-style): orders vs a deterministically perturbed second
      snapshot (every 29th key dropped, every 13th totalprice bumped,
      every 17th priority case-flipped, every 41st key re-inserted under
      a negative id) → the long-form summary (row statuses + per-column
      mismatch counts) from ONE full-outer sort-merge join.

    Columns aligned as (method, dim, detail, value); except rows carry
    dim=event_type / detail=bucket, reconcile rows dim=metric /
    detail=column."""
    # r06: project + spread — events is ONE effective scan task at bench
    # SFs, and the median's per-value counts plus both exceptAll legs all
    # hash-aggregate over it (the spread exchange is shared by every leg
    # inside the single job)
    e = _spread(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    )
    # split point = exact median via the DISTRIBUTED order-statistic plan
    # (stats.py:118) — NOT single-group percentile(), whose aggregation
    # buffer accumulates every event_id in one task (the anti-pattern
    # exact_percentiles eliminated; an OOM-shaped stage at 100×). The
    # .first() here collects ONE precomputed row, not data.
    from ndap_data_validator_spark.operators.reconcile import (
        reconcile_summary,
    )
    from ndap_data_validator_spark.operators.stats import (
        exact_percentiles_plan,
    )

    # r06: the split median stays IN-PLAN as a broadcast scalar (the LAZY
    # percentile twin) instead of an eager multi-broadcast prefix — the
    # entry is now ONE action and the reconcile leg's stages overlap the
    # median chain inside the same job (guide §2.6).
    half_df = exact_percentiles_plan(e, "event_id", (0.5,)).select(
        F.col("p50").alias("__half")
    )
    eh = e.crossJoin(F.broadcast(half_df))
    a = eh.where(F.col("event_id") <= F.col("__half")).select("event_type", (F.col("user_id") % 5).alias("bucket"))
    b = eh.where(F.col("event_id") > F.col("__half")).select("event_type", (F.col("user_id") % 5).alias("bucket"))
    except_leg = (
        a.exceptAll(b)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("excess"))
        .select(
            F.lit("except").alias("method"),
            F.col("event_type").alias("dim"),
            F.col("bucket").cast("string").alias("detail"),
            F.col("excess").alias("value"),
        )
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    perturbed = (
        o.where(F.col("o_orderkey") % 29 != 3)
        .select(
            "o_orderkey",
            (
                F.col("o_totalprice")
                + F.when(F.col("o_orderkey") % 13 == 0, F.lit(1.0)).otherwise(
                    F.lit(0.0)
                )
            ).alias("o_totalprice"),
            F.when(
                F.col("o_orderkey") % 17 == 0, F.lower("o_orderpriority")
            )
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 41 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )
    reconcile_leg = reconcile_summary(o, perturbed, "o_orderkey").select(
        F.lit("reconcile").alias("method"),
        F.col("metric").alias("dim"),
        F.col("column").alias("detail"),
        "value",
    )
    return except_leg.unionByName(reconcile_leg)


# ---- multi-stage / composed-pipeline queries (every entry below, like
# every entry above, has a full DuckDB oracle in oracle_sql(): the former
# rows-only category is empty as of r04 — even hll_distinct is bound-checked)


_RPT_SLOGAN = " standard boilerplate footer text all rights reserved worldwide"
_RPT_N = 6
_LINE_BOILER = "cookie consent accept all essential functional and analytics"


def q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-text removal, all three granularities in
    one method-tagged union (operators/repeated.py):

    * ``ngram`` — repeated n-gram spans (the n-gram-granularity
      approximation of suffix-array substring dedup, Lee et al. 2022):
      every 10th document gets an appended boilerplate slogan, so those
      docs share a run of consecutive repeated 6-gram positions; each doc
      reports its repeated fraction and longest run (cleaned_md5 NULL —
      this op flags, it does not rewrite);
    * ``line`` — RefinedWeb/C4-style line dedup: documents are recast as
      3-line pages (first 12 words / every 5th doc a planted cookie-banner
      line / the rest), lines shared by ≥2 docs are removed, and each doc
      reports the same rollup plus ``cleaned_md5`` — the md5 of the
      reassembled cleaned text, so the oracle verifies the REWRITE, not
      just the counts;
    * ``substring`` (r05) — the actual Lee et al. CUT: repeated 6-gram
      windows are removed from every doc except each gram's canonical
      (min-id) owner, overlapping windows union, and the doc survives as
      its kept tokens re-joined — so the planted slogan survives ONLY in
      doc 0 and ``cleaned_md5`` receipts every rewrite.

    md5-portable hashing lets DuckDB replay positions, the repeated-hash
    sets, canonical owners, window coverage, the run-length grouping, and
    both reassemblies exactly."""
    from ndap_data_validator_spark.operators.repeated import (
        line_dedup,
        repeated_ngram_report,
        substring_dedup,
    )

    docs = _spread(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 400))
    planted = docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(10)) == 0,
            F.concat(F.col("text"), F.lit(_RPT_SLOGAN)),
        ).otherwise(F.col("text")).alias("text"),
    )
    ngram = repeated_ngram_report(
        planted, n=_RPT_N, min_docs=2, seed=42, hash_fn="md5"
    ).select(
        F.lit("ngram").alias("method"),
        "doc_id",
        "n_positions",
        "n_repeated",
        "repeated_frac",
        "max_repeated_run",
        F.lit(None).cast("string").alias("cleaned_md5"),
    )
    w = F.split(F.col("text"), " ")
    head = F.concat_ws(" ", F.slice(w, 1, 12))
    tail = F.concat_ws(" ", F.slice(w, 13, F.size(w)))
    pages = docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(5)) == 0,
            F.concat_ws("\n", head, F.lit(_LINE_BOILER), tail),
        ).otherwise(F.concat_ws("\n", head, tail)).alias("text"),
    )
    _, line_report = line_dedup(pages, min_docs=2, seed=42, hash_fn="md5")
    line = line_report.select(
        F.lit("line").alias("method"),
        "doc_id",
        F.col("n_lines").alias("n_positions"),
        "n_repeated",
        "repeated_frac",
        "max_repeated_run",
        "cleaned_md5",
    )
    _, sub_report = substring_dedup(
        planted, n=_RPT_N, min_docs=2, seed=42, hash_fn="md5"
    )
    sub = sub_report.select(
        F.lit("substring").alias("method"),
        "doc_id",
        F.col("n_tokens").alias("n_positions"),
        F.col("n_removed").alias("n_repeated"),
        F.col("removed_frac").alias("repeated_frac"),
        F.col("max_removed_run").alias("max_repeated_run"),
        "cleaned_md5",
    )
    return ngram.unionByName(line).unionByName(sub)


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup, both deployment shapes in one method-tagged
    union (both oracle-checked end to end via the md5 portable hash):

    * ``self``  — one-shot self-join mining over documents + a planted
      clone: shingling → 16 minhashes → 8-band bucket join →
      exact-Jaccard verify (score = true Jaccard, is_unique NULL);
    * ``incremental`` — the delta-crawl shape: docs <200 become the
      persisted :func:`minhash_index` (signatures only — no text), the
      200+ batch plus the clone joins it and reports every new doc with
      its lowest matching historical id and the signature-agreement
      estimate (score = matching-minhash fraction, is_unique flag)."""
    # r06: spread — shingling + 16 minhashes per shingle otherwise run in
    # the single-row-group scan's ONE task at bench SFs
    d = _spread(
        _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    )
    clone = d.where(F.col("doc_id") == 0).withColumn(
        "doc_id", F.lit(1_000_000).cast("long")
    )
    out = minhash_near_duplicates(
        d.unionByName(clone), num_hashes=16, bands=8, threshold=0.8,
        hash_fn="md5",
    )
    self_part = out.select(
        F.lit("self").alias("method"),
        "id_a",
        "id_b",
        F.round("jaccard", 4).alias("score"),
        F.lit(None).cast("boolean").alias("is_unique"),
    )
    hist = d.where(F.col("doc_id") < 200)
    new_batch = d.where(F.col("doc_id") >= 200).unionByName(clone)
    idx = minhash_index(hist, num_hashes=16, bands=8, hash_fn="md5")
    report, _ = dedup_incremental_batch(
        new_batch, idx, num_hashes=16, bands=8, threshold=0.5,
        hash_fn="md5",
    )
    inc_part = report.select(
        F.lit("incremental").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.col("matched_hist_id").alias("id_b"),
        F.col("est_jaccard").alias("score"),
        "is_unique",
    )
    return self_part.unionByName(inc_part)


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures, oracle-checked bit-for-bit via the md5
    portable token hash (xxhash64 stays the production default)."""
    d = _spread(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 200))
    return d.select(
        "doc_id", simhash(F.col("text"), hash_fn="md5").alias("simhash64")
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch path: per-partition HLL sketches unioned to global
    distinct estimates without rescanning — made ORACLE-CHECKABLE (VERDICT
    r03 #1) by emitting the exact distinct count plus a within-2% accuracy
    bound on the estimate: DuckDB computes COUNT(DISTINCT …) and expects
    the boolean TRUE, so the sketch's accuracy contract is hash-matched
    even though the estimate itself can't byte-match another engine.
    lg_k=16 gives ~0.4% standard error — 2% is a ≥5σ bound, deterministic
    in practice. The exact side is the VERIFICATION harness only;
    production consumes the estimate (that's the point of the sketch)."""
    # projection only — NO spread here (r06 measured it at ~2×): lg_k=16
    # sketches are 64 KB each, so a 32-way spread turns one single-task
    # sketch per (partition, column) into 32 partial sketches plus an
    # exchange and a merge; the per-row update cost it parallelizes is
    # smaller than the merge it creates. The countDistinct leg's Expand
    # already parallelizes across the shuffle.
    e = _t(spark, sf_dir, "events").select("user_id", "event_type")
    st = column_stats(
        e, ["user_id", "event_type"], partition_by=(F.col("user_id") % 8),
        hll_lg_k=16,
    )
    est = merge_hll_to_global(st).select("column", "distinct_estimate")
    exact = e.agg(
        F.countDistinct("user_id").alias("user_id"),
        F.countDistinct("event_type").alias("event_type"),
    ).select(
        F.explode(
            F.create_map(
                F.lit("user_id"), F.col("user_id"),
                F.lit("event_type"), F.col("event_type"),
            )
        ).alias("column", "exact_distinct")
    )
    return exact.join(est, "column").select(
        "column",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("distinct_estimate") - F.col("exact_distinct"))
            <= 0.02 * F.col("exact_distinct")
        ).alias("within_2pct"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads through the Arrow-batched
    mapInPandas feature extractor — now FULLY oracle-checked: the stub
    kernel is sha256-derived exact dyadic doubles (int/2^32), so DuckDB
    replays the whole feature vector with sha256 + hex-slice arithmetic
    (payload = UTF-8 bytes of the sha2-hex string, h = sha256(payload),
    feature_i = int(h[4(i mod 8)..+4])/2^32 — the 32-byte digest tiles a
    16-dim vector with period 8).

    Features are projected to a fixed-point CSV string (DECIMAL(12,6) cast,
    identical rendering both engines) so the harness canonicalizer gets one
    hashable scalar."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = d.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio")),
            (F.col("doc_id") % 2 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("text"), 256).cast("binary").alias("content"),
    ).coalesce(2)  # 100 rows: don't spin an Arrow python worker per partition
    feats = multimodal.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.concat_ws(
            ",",
            F.transform(
                F.col("features"),
                lambda x: x.cast("decimal(12,6)").cast("string"),
            ),
        ).alias("features_csv"),
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, oracle-checked in its verification configuration: md5
    portable-hash seed centroids with lloyd_iterations=0 make the quantizer
    a pure function DuckDB replays (seed selection → nearest-cell
    assignment → probe → rounded rank). Production uses xxhash64 seeding +
    Lloyd refinement — same plan shape, verified by the pytest recall and
    planted-clone fixtures."""
    from ndap_data_validator_spark.operators.similarity import ivf_topk

    # r06: spread — cell assignment is 8 cosines × 64 dims per row, all in
    # the single-row-group scan's ONE task at bench SFs otherwise
    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, n_centroids=8, n_probe=4,
        lloyd_iterations=0, hash_fn="md5", round_digits=4,
    )


def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force top-k, oracle-checked: ranking on the 4-dp ROUNDED
    cosine (ties broken by id) makes the order well-defined across engines —
    raw-double rank ties are FP-noise-sensitive. Carries the threshold form
    too (consolidated r04, cap): meets_threshold flags cos ≥ 0.25, the
    similarity-cutoff predicate the former knn_threshold entry verified."""
    from ndap_data_validator_spark.operators.similarity import brute_force_topk

    # r06: spread — 5 exact cosines × 64 dims per corpus row otherwise run
    # in the single-row-group scan's ONE task at bench SFs
    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    return brute_force_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, round_digits=4
    ).withColumn("meets_threshold", F.col("cos") >= 0.25)


def q_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality signal (functions/lm.py): train the
    smoothed LM on documents < 400, score documents < 300 by mean negative
    log-likelihood (rounded 6dp — sum order is engine-noise). DuckDB replays
    train + score end to end. r05: rows also carry CCNet's head/middle/tail
    ``ppl_bucket`` (corpus-percentile thirds of the cross-entropy via the
    exact distributed order-statistic plan; DuckDB replays the cuts with
    quantile_cont)."""
    from ndap_data_validator_spark.functions.lm import (
        doc_cross_entropy,
        perplexity_buckets,
        unigram_lm,
    )

    # r06: spread the filtered slice — LM tokenization (explode + hash per
    # token) otherwise runs in the single-row-group scan's ONE task
    d = _t(spark, sf_dir, "documents")
    ref = _spread(d.where(F.col("doc_id") < 400).select("doc_id", "text"))
    docs = ref.where(F.col("doc_id") < 300)
    lm, consts = unigram_lm(ref, alpha=0.5)
    ce = doc_cross_entropy(docs, lm, consts, round_digits=6)
    return perplexity_buckets(ce)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup in its verification configuration (md5
    seed centroids, 0 Lloyd rounds, rounded cosine — the ann_ivf contract):
    three planted clones must lose to their originals; everything else
    keeps. DuckDB replays quantizer → cells → within-cell prune rule."""
    from ndap_data_validator_spark.operators.similarity import semantic_dedup

    emb = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 300)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    clones = emb.where(F.col("vec_id") < 3).withColumn(
        "vec_id", (F.col("vec_id") + F.lit(1_000_000)).cast("long")
    )
    data = emb.unionByName(clones)
    return semantic_dedup(
        data, threshold=0.999, n_centroids=8, max_cell_size=100_000,
        lloyd_iterations=0, hash_fn="md5", round_digits=4,
    )


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-accounting rollup (operators/curate.py
    corpus_mixture_report) over documents < 500 — the mixture-planning data
    card; DuckDB replays lang-ID, both token counts, quality, and shares.
    r05: alpha=0.3 adds the XLM-R-style temperature-weighted sampling
    column (mixture_weight ∝ tokens^0.3 normalized across languages)."""
    from ndap_data_validator_spark.operators.curate import corpus_mixture_report

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return corpus_mixture_report(d, alpha=0.3)


def q_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing manifests, BOTH flavors in one method-tagged entry
    (consolidated r05, cap — funds the render_transcripts slot):

    * 'chunk' — sliding-window context chunking (max 32, overlap 8) over
      documents < 200: shuffle-free projection+generate, DuckDB replays
      the stride arithmetic and slices (operators/pack.py chunk_documents);
    * 'pack' — GPT-style concat-and-cut over the no-overlap 32-token
      chunking: md5-portable shard routing (4 shards), 64-token bins,
      per-shard running-sum window (pack_manifest).

    Columns aligned as (method, doc_id, chunk_idx, n_tokens, shard,
    bin_id, offset, split, chunk_text); chunk rows carry the text and
    NULL shard/bin/offset/split, pack rows the reverse."""
    from ndap_data_validator_spark.operators.pack import (
        chunk_documents,
        pack_manifest,
    )

    def nl(t: str) -> Column:
        return F.lit(None).cast(t)

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    chunks = chunk_documents(d, max_tokens=32, overlap=8).select(
        F.lit("chunk").alias("method"),
        "doc_id",
        "chunk_idx",
        "n_tokens",
        nl("bigint").alias("shard"),
        nl("bigint").alias("bin_id"),
        nl("bigint").alias("offset"),
        nl("boolean").alias("split"),
        "chunk_text",
    )
    packed = pack_manifest(
        chunk_documents(d, max_tokens=32).drop("chunk_text"),
        budget=64,
        n_shards=4,
        hash_fn="md5",
    ).select(
        F.lit("pack").alias("method"),
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "shard",
        "bin_id",
        "offset",
        "split",
        nl("string").alias("chunk_text"),
    )
    return chunks.unionByName(packed)


def q_render_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r05 — chat-template rendering + loss-mask character spans
    (operators/render.py), the SFT step between transcripts and the
    packer. Transcripts are synthesized from events exactly like
    q_sequence_checks (conv_id=user_id, turn_idx=row_number per user by
    event_id), with a deterministic role rule (turn 1 of every 5th conv
    is 'system'; odd turns 'user'; even 'assistant') and deterministic
    text (event_type || ' #' || event_id || ' ' || props). Both report
    shapes method-tagged in one entry:

    * 'turn' — per-turn span manifest: rendered start offset, the
      [text_start, text_end) loss span, is_target (completion-only
      convention: only assistant TEXT is supervised);
    * 'conv' — per-conversation rollup with the md5 of the ENTIRE
      rendered string, so the oracle hash-checks the rendering itself,
      not just the arithmetic.

    ONE window shuffle on the conversation key for spans; the rollup
    groupBy reuses the same hash partitioning."""
    from ndap_data_validator_spark.operators.render import (
        render_conversations,
        render_turn_spans,
    )

    def nl(t: str) -> Column:
        return F.lit(None).cast(t)

    e = _t(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("props").isNotNull()
        & (F.col("user_id") < 40)
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = e.select(
        F.col("user_id").alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        "event_type",
        "event_id",
        "props",
    ).select(
        "conv_id",
        "turn_idx",
        F.when(
            (F.col("turn_idx") == 1) & (F.col("conv_id") % 5 == 0),
            F.lit("system"),
        )
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.concat(
            F.col("event_type"),
            F.lit(" #"),
            F.col("event_id").cast("string"),
            F.lit(" "),
            F.col("props"),
        ).alias("text"),
    )
    spans = render_turn_spans(t).select(
        F.lit("turn").alias("method"),
        "conv_id",
        "turn_idx",
        "role",
        "n_chars",
        "start_char",
        "text_start",
        "text_end",
        "is_target",
        nl("bigint").alias("n_turns"),
        nl("bigint").alias("n_target_chars"),
        nl("string").alias("rendered_md5"),
    )
    convs = render_conversations(t).select(
        F.lit("conv").alias("method"),
        "conv_id",
        nl("int").alias("turn_idx"),
        nl("string").alias("role"),
        "n_chars",
        nl("bigint").alias("start_char"),
        nl("bigint").alias("text_start"),
        nl("bigint").alias("text_end"),
        nl("boolean").alias("is_target"),
        "n_turns",
        "n_target_chars",
        "rendered_md5",
    )
    return spans.unionByName(convs)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL merge-table BPE (functions/bpe.py — ordered-merge apply over a
    planted vocabulary, sentinel-string replace chain, pure Catalyst):
    per-document token count plus the md5 of the canonical encoded token
    stream, so the oracle hash-checks the ENTIRE token sequence, not just
    its length. This is the token budget chunk/pack actually use
    (VERDICT r03 #2; the regex count in text_quality is the cheap proxy).
    r05: also the md5 of the INTEGER TOKEN-ID sequence under the corpus
    vocabulary (bpe.bpe_vocab — base alphabet in byte order, then merge
    products in rank order), i.e. the tensor a trainer actually consumes;
    the vocab is metadata-sized and lives on the driver, so id lookup is a
    literal-map projection — zero joins, zero shuffles (r06: the former
    posexplode → broadcast-join → groupBy reassembly shuffled the full
    encoded stream once per token; guide §2.3/§2.4)."""
    from ndap_data_validator_spark.functions.bpe import (
        bpe_stream,
        bpe_token_count_from_stream,
        bpe_tokens_from_stream,
        bpe_vocab_list,
    )

    d = _spread(_t(spark, sf_dir, "documents"))
    # vocab build parallelized over the SAME spread frame (the single-split
    # scan otherwise runs the char-wrap chain in one task at bench SFs)
    vocab, _n_base = bpe_vocab_list(d, "text")
    id_map = F.create_map(
        *[x for tid, tok in vocab for x in (F.lit(tok), F.lit(tid))]
    )
    # spread the one-split scan, then compute the replace chain ONCE behind
    # an alias barrier — count, stream md5 and the token ids all derive
    # from the aliased stream. Position order is the array order, OOV
    # (never-merged chars absent from the vocab corpus) drop out exactly
    # like the old collect_list-of-non-null path.
    base = d.select("doc_id", bpe_stream(F.col("text")).alias("__enc"))
    ids = F.filter(
        F.transform(
            bpe_tokens_from_stream(F.col("__enc")), lambda t: id_map[t]
        ),
        lambda x: x.isNotNull(),
    )
    withids = base.select(
        "doc_id",
        "__enc",
        F.array_join(
            F.transform(ids, lambda i: i.cast("string")), ","
        ).alias("__idstr"),
    )
    return withids.select(
        "doc_id",
        bpe_token_count_from_stream(F.col("__enc")).alias("n_tokens_bpe_real"),
        F.md5(F.col("__enc")).alias("stream_md5"),
        F.when(F.col("__enc").isNull(), F.lit(None).cast("string"))
        .otherwise(F.md5(F.col("__idstr")))
        .alias("ids_md5"),
    )


def q_pack_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-boundary-respecting packing (pack.py pack_nosplit) budgeted
    in REAL BPE tokens: md5-portable shard routing, per-shard next-fit-
    decreasing greedy sweep — DuckDB replays the whole greedy rule with a
    recursive CTE over the per-shard rank order, so bin assignments and
    offsets hash-match."""
    from ndap_data_validator_spark.functions.bpe import (
        bpe_stream,
        bpe_token_count_from_stream,
    )
    from ndap_data_validator_spark.operators.pack import pack_nosplit

    d = _spread(_t(spark, sf_dir, "documents").where(F.col("doc_id") < 400))
    sized = d.select(
        "doc_id", bpe_stream(F.col("text")).alias("__enc")
    ).select(
        "doc_id", bpe_token_count_from_stream(F.col("__enc")).alias("n_tokens")
    ).where(F.col("n_tokens") > 0)
    return pack_nosplit(sized, budget=256, n_shards=4, hash_fn="md5", seed=42)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier (functions/quality_clf.py):
    NB log-odds weights over 256 md5-hashed token buckets, trained on a
    planted fixture — documents < 400 as positives vs their vowel-mangled
    derivatives (regexp vowels→'q': deterministic gibberish both engines
    construct identically) as negatives — then scores documents < 300 plus
    three mangled probes. DuckDB replays tokenize → bucket → counts →
    ln(a)−ln(b) weights → per-doc sum; predicted compares the 6dp-rounded
    score to 0 so the boolean is engine-stable."""
    from ndap_data_validator_spark.functions.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    # r06: spread the ≤400-doc slice — the vowel-mangle regex + hashed
    # tokenization otherwise run in the single-row-group scan's ONE task
    d = _spread(
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", "text")
    )
    mangle = F.regexp_replace(F.col("text"), "[aeiou]", "q")
    pos = d.select("doc_id", "text", F.lit(True).alias("label"))
    neg = d.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        mangle.alias("text"),
        F.lit(False).alias("label"),
    )
    weights, consts = train_quality_classifier(
        pos.unionByName(neg), "label", n_buckets=256, alpha=0.5, seed=7,
        hash_fn="md5",
    )
    probes = d.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        mangle.alias("text"),
    )
    score_set = d.where(F.col("doc_id") < 300).select("doc_id", "text").unionByName(probes)
    return score_quality(
        score_set, weights, consts, n_buckets=256, seed=7, hash_fn="md5",
        round_digits=6,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries — the driver checks the first 50, so every entry
    # gets a correctness row every round (VERDICT r03 #1: ann_ivf and
    # hll_distinct fell past the old 52-entry list's cap). Near-duplicate
    # entries were consolidated r04: bool+datetime → scalar_coercion,
    # knn_threshold folded into knn_topk (meets_threshold column),
    # dedup_keepers into dedup_clusters (is_keeper column), the two
    # sampling shapes into one method-tagged union, and the regex token
    # count rides text_quality (the real BPE count is bpe_encode).
    # r05: lang_id folded into text_quality (lang_guess column — same
    # per-doc projection) to fund the new bpe_train slot; duplicate_rows
    # folded into uniqueness_violations (method-tagged union of census +
    # occurrence-tagged rows) to fund the sequence_checks slot.
    return {
        "null_census": q_null_census,
        "coercion_report": q_coercion_report,
        "scalar_coercion": q_scalar_coercion,
        "time_format_census": q_time_format_census,
        "validation_report": q_validation_report,
        "partition_summary": q_partition_summary,
        "latest_event_per_user": q_latest_event_per_user,
        "join_lineage": q_join_lineage,
        "union_tokens": q_union_tokens,
        "uniqueness_violations": q_uniqueness_violations,
        "sequence_checks": q_sequence_checks,
        "ri_orphans": q_ri_orphans,
        "column_stats": q_column_stats,
        "drift_report": q_drift_report,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "text_quality": q_text_quality,
        "bpe_train": q_bpe_train,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_ivf": q_ann_ivf,
        "hll_distinct": q_hll_distinct,
        "topk_orders": q_topk_orders,
        "dtype_coercion_report": q_dtype_coercion_report,
        "three_way_join": q_three_way_join,
        "except_diff": q_except_diff,
        "repeated_ngrams": q_repeated_ngrams,
        "csv_events_rollup": q_csv_events_rollup,
        "dedup_clusters": q_dedup_clusters,
        "text_gates": q_text_gates,
        "key_skew": q_key_skew,
        "sessionization": q_sessionization,
        "sampling": q_sampling,
        "decontamination": q_decontamination,
        "tfidf_top_terms": q_tfidf_top_terms,
        "curation_funnel": q_curation_funnel,
        "lm_cross_entropy": q_lm_cross_entropy,
        "quality_classifier": q_quality_classifier,
        "semantic_dedup": q_semantic_dedup,
        "corpus_mixture": q_corpus_mixture,
        "bpe_encode": q_bpe_encode,
        "packing": q_packing,
        "render_transcripts": q_render_transcripts,
        "pack_nosplit": q_pack_nosplit,
        "frame_sample_plan": q_frame_sample_plan,
        "exact_percentiles": q_exact_percentiles,
        "embedding_neardup": q_embedding_neardup,
        "minhash_candidates": q_minhash_candidates,
        "simhash_fingerprints": q_simhash_fingerprints,
        "knn_topk": q_knn_topk,
        "media_features": q_media_features,
    }


# --------------------------------------------------------------- oracle SQL

def _planes_sql(vec_expr: str = "embedding::DOUBLE[]") -> str:
    planes = hyperplanes(_ANN_DIM, _ANN_PLANES, seed=42)
    terms = []
    for i, p in enumerate(planes):
        arr = "[" + ",".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {arr}) >= 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    return " + ".join(terms)


def _minhash_oracle_sql(num_hashes: int = 16, bands: int = 8, seed: int = 42,
                        threshold: float = 0.8, shingle_n: int = 3,
                        inc_threshold: float = 0.5,
                        hist_below: int = 200) -> str:
    """DuckDB replay of the full md5-portable MinHash+LSH pipeline, BOTH
    deployment shapes (operators/dedup.py with hash_fn='md5'):
    ``self`` = minhash_near_duplicates (band join → exact-Jaccard verify);
    ``incremental`` = dedup_incremental_batch (docs < hist_below are the
    persisted index, the rest + the clone match against it; score is the
    matching-minhash fraction over the num_hashes signature positions)."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    mins = ", ".join(
        f"MIN({P('sh', seed + i)}) AS h{i}" for i in range(num_hashes)
    )
    r = num_hashes // bands
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, {h} AS band_hash FROM sig".format(
            b=b,
            h=P(
                " || ',' || ".join(
                    f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
                )
            ),
        )
        for b in range(bands)
    )
    k = shingle_n - 1
    jac = (
        "len(list_intersect(x.shingles, y.shingles))::DOUBLE"
        " / (len(x.shingles) + len(y.shingles)"
        " - len(list_intersect(x.shingles, y.shingles)))"
    )
    est = "(" + " + ".join(
        f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    ) + f")::DOUBLE / {num_hashes}"
    return rf"""
      WITH docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT CAST(1000000 AS BIGINT), text FROM documents WHERE doc_id = 0),
      w AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM docs),
      s AS (SELECT doc_id,
              CASE WHEN len(w) - {k} <= 0 THEN [array_to_string(w, ' ')]
                   ELSE list_distinct(list_transform(
                          generate_series(1, len(w) - {k}),
                          i -> array_to_string(w[i:i+{k}], ' ')))
              END AS shingles
            FROM w),
      ex AS (SELECT doc_id, unnest(shingles) AS sh FROM s),
      sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
      banded AS ({band_selects}),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM banded a JOIN banded b USING (band_idx, band_hash)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      icand AS (SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id
                FROM banded n JOIN banded h USING (band_idx, band_hash)
                WHERE n.doc_id >= {hist_below} AND h.doc_id < {hist_below}),
      ihits AS (SELECT new_id, hist_id, ROUND({est}, 4) AS est
                FROM icand
                JOIN sig x ON icand.new_id = x.doc_id
                JOIN sig y ON icand.hist_id = y.doc_id
                WHERE ROUND({est}, 4) >= {inc_threshold}),
      ibest AS (SELECT new_id, MIN(hist_id) AS matched_hist_id,
                       MAX(est) AS est
                FROM ihits GROUP BY new_id)
      SELECT 'self' AS method, p.id_a, p.id_b, ROUND({jac}, 4) AS score,
             CAST(NULL AS BOOLEAN) AS is_unique
      FROM pairs p
      JOIN s x ON p.id_a = x.doc_id
      JOIN s y ON p.id_b = y.doc_id
      WHERE {jac} >= {threshold}
      UNION ALL
      SELECT 'incremental' AS method, d.doc_id AS id_a,
             b.matched_hist_id AS id_b, b.est AS score,
             b.matched_hist_id IS NULL AS is_unique
      FROM (SELECT doc_id FROM docs WHERE doc_id >= {hist_below}) d
      LEFT JOIN ibest b ON d.doc_id = b.new_id
    """


def _simhash_oracle_sql(seed: int = 42) -> str:
    """DuckDB replay of the md5-portable 64-bit SimHash: the portable hash
    is 60-bit, so bits 60-63 vote −len(toks) (never set) on both engines."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    vote_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, v -> (v >> {bit}) & 1 = 1)) - len(h) > 0 "
        f"THEN CAST({1 << bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for bit in range(60)
    )
    return rf"""
      WITH t AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
            FROM documents WHERE doc_id < 200),
      hh AS (SELECT doc_id, list_transform(toks, x -> {P('x', seed)}) AS h FROM t)
      SELECT doc_id, {vote_terms} AS simhash64 FROM hh
    """


def _decontamination_fuzzy_oracle_sql(
    num_hashes: int = 16, bands: int = 8, seed: int = 42,
    threshold: float = 0.5, shingle_n: int = 3,
) -> str:
    """DuckDB replay of decontaminate_fuzzy in its md5 verification
    configuration: signatures and banding for BOTH corpora, cross-side
    band join, exact shingle-Jaccard verify, per-doc rollup."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    mins = ", ".join(
        f"MIN({P('sh', seed + i)}) AS h{i}" for i in range(num_hashes)
    )
    r = num_hashes // bands

    def band_selects(sig: str, idc: str) -> str:
        return " UNION ALL ".join(
            "SELECT {idc}, {b} AS band_idx, {h} AS band_hash FROM {sig}".format(
                idc=idc, sig=sig, b=b,
                h=P(
                    " || ',' || ".join(
                        f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
                    )
                ),
            )
            for b in range(bands)
        )

    k = shingle_n - 1
    sh_cte = (
        "SELECT {idc}, CASE WHEN len(w) - {k} <= 0 "
        "THEN [array_to_string(w, ' ')] "
        "ELSE list_distinct(list_transform(generate_series(1, len(w) - {k}), "
        "i -> array_to_string(w[i:i+{k}], ' '))) END AS shingles "
        "FROM (SELECT {idc}, regexp_split_to_array(regexp_replace("
        r"lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM {src})"
    )
    jac = (
        "len(list_intersect(x.shingles, y.shingles))::DOUBLE"
        " / (len(x.shingles) + len(y.shingles)"
        " - len(list_intersect(x.shingles, y.shingles)))"
    )
    return f"""
      WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
      bench AS (SELECT doc_id AS bench_id, text || ' eval suite suffix' AS text
                FROM documents WHERE doc_id < 250 AND doc_id % 11 = 0),
      cs AS ({sh_cte.format(idc='doc_id', k=k, src='corpus')}),
      bs AS ({sh_cte.format(idc='bench_id', k=k, src='bench')}),
      cex AS (SELECT doc_id, unnest(shingles) AS sh FROM cs),
      bex AS (SELECT bench_id, unnest(shingles) AS sh FROM bs),
      csig AS (SELECT doc_id, {mins} FROM cex GROUP BY doc_id),
      bsig AS (SELECT bench_id, {mins} FROM bex GROUP BY bench_id),
      cb AS ({band_selects('csig', 'doc_id')}),
      bb AS ({band_selects('bsig', 'bench_id')}),
      cands AS (SELECT DISTINCT cb.doc_id, bb.bench_id
                FROM cb JOIN bb USING (band_idx, band_hash)),
      ver AS (SELECT cands.doc_id, {jac} AS j
              FROM cands JOIN cs x ON cands.doc_id = x.doc_id
                         JOIN bs y ON cands.bench_id = y.bench_id
              WHERE {jac} >= {threshold}),
      per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
                     MAX(j) AS mj
              FROM ver GROUP BY doc_id)
      SELECT c.doc_id,
             CAST(COALESCE(per.n_bench_matches, 0) AS BIGINT)
               AS n_bench_matches,
             ROUND(per.mj, 4) AS max_jaccard,
             per.doc_id IS NOT NULL AS contaminated
      FROM (SELECT doc_id FROM corpus) c LEFT JOIN per USING (doc_id)
    """


def _text_gates_oracle_sql() -> str:
    """DuckDB replay of q_text_gates: the pii leg unpivoted to one row per
    (doc_id, gate) plus the url_keep survivor leg, columns aligned as
    (gate, doc_id, n_matches, detail)."""
    from ndap_data_validator_spark.functions.pii import (
        pii_count_sql,
        redact_pii_sql,
    )

    url_leg = _url_gate_oracle_sql()
    return f"""
      WITH d AS (
        SELECT doc_id,
               text || CASE CAST(doc_id % 4 AS INT)
                 WHEN 0 THEN ' contact a.b@example.com now'
                 WHEN 1 THEN ' from 10.1.2.3 logged'
                 WHEN 2 THEN ' call +1 (415) 555-0199 today'
                 ELSE '' END AS text
        FROM documents WHERE doc_id < 200),
      counted AS (
        SELECT doc_id,
               CAST({pii_count_sql('text', 'email')} AS INT) AS n_emails,
               CAST({pii_count_sql('text', 'ipv4')} AS INT) AS n_ipv4,
               CAST({pii_count_sql('text', 'phone')} AS INT) AS n_phones,
               md5({redact_pii_sql('text')}) AS redacted_md5
        FROM d)
      SELECT 'pii_email' AS gate, doc_id, n_emails AS n_matches,
             CAST(NULL AS VARCHAR) AS detail FROM counted
      UNION ALL
      SELECT 'pii_ipv4', doc_id, n_ipv4, CAST(NULL AS VARCHAR) FROM counted
      UNION ALL
      SELECT 'pii_phone', doc_id, n_phones, CAST(NULL AS VARCHAR) FROM counted
      UNION ALL
      SELECT 'pii_redact', doc_id, n_emails + n_ipv4 + n_phones,
             redacted_md5 FROM counted
      UNION ALL
      SELECT * FROM (
        {url_leg}
      ) url_leg
    """


def _ann_ivf_oracle_sql(
    n_centroids: int = 8, n_probe: int = 4, k: int = 5, seed: int = 42
) -> str:
    """DuckDB replay of ivf_topk(lloyd_iterations=0, hash_fn='md5'):
    seed-centroid selection, nearest-cell assignment (ties → smaller cell),
    per-query cell probing, rounded-cosine rank within probed cells."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    return f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      seeds AS (SELECT vec_id, v FROM e
                ORDER BY {P('CAST(vec_id AS VARCHAR)', seed)} LIMIT {n_centroids}),
      cents AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell_id,
                       v AS centroid FROM seeds),
      scored AS (SELECT e.vec_id, e.v, c.cell_id,
                        {cos('e.v', 'c.centroid')} AS cc FROM e, cents c),
      cells AS (SELECT vec_id, v, cell_id FROM (
                  SELECT vec_id, v, cell_id,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY cc DESC, cell_id ASC) AS rn
                  FROM scored) WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      qs AS (SELECT q.query_id, q.qv, c.cell_id,
                    {cos('q.qv', 'c.centroid')} AS qc FROM q, cents c),
      probes AS (SELECT query_id, qv, cell_id FROM (
                   SELECT query_id, qv, cell_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY qc DESC, cell_id ASC) AS rn
                   FROM qs) WHERE rn <= {n_probe}),
      cand AS (SELECT p.query_id, cells.vec_id,
                      ROUND({cos('p.qv', 'cells.v')}, 4) AS cos
               FROM probes p JOIN cells USING (cell_id)),
      r AS (SELECT query_id, vec_id, cos,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
            FROM cand)
      SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= {k}
    """


def _url_gate_oracle_sql() -> str:
    from ndap_data_validator_spark.functions.urls import URL_PATTERN

    pat = URL_PATTERN.replace("'", "''")
    # host = authority after the last '@' (userinfo stripped), then the
    # bracketed [...] IPv6 literal whole or everything before the first ':'
    # (port stripped), lowercased — extract_domains' contract, ADVICE r04
    no_user = (
        "string_split(lower(regexp_replace(u, "
        "'^https?://([^/?#]+).*$', '\\1')), '@')[-1]"
    )
    host = (
        f"CASE WHEN starts_with({no_user}, '[') "
        f"THEN regexp_extract({no_user}, '^(\\[[^\\]]*\\])', 1) "
        f"ELSE string_split({no_user}, ':')[1] END"
    )
    dom = (
        "list_distinct(list_transform(regexp_extract_all(text, '{p}'), "
        "u -> {h}))"
    ).format(p=pat, h=host)
    blocked = ["site-3.example.com", "site-7.example.com"]
    # label-suffix rule: host = d OR host endswith '.' || d
    hit = " OR ".join(
        f"h = '{d}' OR suffix(h, '.{d}')" for d in blocked
    )
    return f"""
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                    THEN text || ' see http://site-' ||
                         CAST(doc_id % 13 AS VARCHAR) ||
                         '.example.com/page?x=1 ok'
                    ELSE text END AS text
        FROM documents WHERE doc_id < 500),
      x AS (SELECT doc_id, text, {dom} AS domains FROM d)
      SELECT 'url_keep' AS gate, doc_id,
             CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS n_matches,
             COALESCE(array_to_string(list_sort(domains), ','), '')
               AS detail  -- DuckDB: array_to_string([]) is NULL
      FROM x
      WHERE len(list_filter(domains, h -> {hit})) = 0
    """


def _curation_funnel_oracle_sql(n: int = 8, seed: int = 42) -> str:
    """DuckDB replay of the ENTIRE curation funnel (operators/curate.py):
    quality score, lang-ID, fingerprint keepers, and the md5-portable
    decontamination gate, unpivoted to the 5-stage survivor table."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P
    from ndap_data_validator_spark.functions.textstats import (
        LANG_MARKERS,
        _STOPWORDS_EN,
    )

    k = n - 1
    sw = "[" + ",".join(f"'{w}'" for w in _STOPWORDS_EN) + "]"
    hits = ", ".join(
        "len(list_filter(ltoks, x -> list_contains(["
        + ",".join(f"'{w}'" for w in ws_)
        + f"], x))) AS {lang}"
        for lang, ws_ in LANG_MARKERS.items()
    )
    others = [l for l in LANG_MARKERS if l != "en"]
    en_cond = "en > 0 AND " + " AND ".join(f"en >= {l}" for l in others)
    return rf"""
      WITH docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 600
        UNION ALL
        SELECT CAST(700000 AS BIGINT), text FROM documents WHERE doc_id = 1),
      t AS (SELECT doc_id, text,
              CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
            FROM docs),
      t2 AS (SELECT doc_id, text, toks,
               list_transform(toks, x -> lower(x)) AS ltoks,
               COALESCE(CASE WHEN len(toks) > 0
                 THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                      / len(toks) END, 0.0) AS mwl
             FROM t),
      q AS (SELECT doc_id, text, ltoks,
              ROUND(
                LEAST(len(ltoks)::DOUBLE / 20.0, 1.0) * 0.3
                + COALESCE(CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^\p{{L}}]', '', 'g'))::DOUBLE
                         / length(text) END, 0.0) * 0.3
                + LEAST(COALESCE(CASE WHEN len(ltoks) > 0
                    THEN len(list_filter(ltoks, x -> list_contains({sw}, x)))::DOUBLE
                         / len(ltoks) END, 0.0) * 4, 1.0) * 0.2
                + (CASE WHEN mwl >= 2 AND mwl <= 12 THEN 1.0 ELSE 0.3 END) * 0.2,
              4) AS quality,
              {hits},
              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
            FROM t2),
      -- decontamination: distinct word n-gram hashes, benchmark = doc_id % 31
      w AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM docs),
      sh AS (SELECT doc_id,
               CASE WHEN len(w) - {k} <= 0 THEN [array_to_string(w, ' ')]
                    ELSE list_distinct(list_transform(
                           generate_series(1, len(w) - {k}),
                           i -> array_to_string(w[i:i+{k}], ' ')))
               END AS ngrams
             FROM w),
      ex AS (SELECT doc_id, {P('ng', seed)} AS ng_hash
             FROM (SELECT doc_id, unnest(ngrams) AS ng FROM sh)),
      bh AS (SELECT DISTINCT ng_hash FROM ex WHERE doc_id % 31 = 0),
      dirty AS (SELECT DISTINCT e.doc_id FROM ex e JOIN bh USING (ng_hash)),
      flags AS (SELECT q.doc_id,
                 (q.quality >= 0.5) AS s1,
                 (q.quality >= 0.5 AND ({en_cond})) AS s2,
                 (q.quality >= 0.5 AND ({en_cond})
                  AND q.doc_id = MIN(q.doc_id) OVER (PARTITION BY q.fp)) AS s3,
                 (q.doc_id IN (SELECT doc_id FROM dirty)) AS dirty
               FROM q),
      f AS (SELECT CAST(COUNT(*) AS BIGINT) AS ingested,
                   CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS quality_gate,
                   CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS language_gate,
                   CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS dedup_gate,
                   CAST(SUM(CASE WHEN s3 AND NOT dirty THEN 1 ELSE 0 END) AS BIGINT) AS decontamination_gate
            FROM flags)
      SELECT CAST(0 AS INT) AS stage_idx, 'ingested' AS stage, ingested AS survivors FROM f
      UNION ALL SELECT 1, 'quality_gate', quality_gate FROM f
      UNION ALL SELECT 2, 'language_gate', language_gate FROM f
      UNION ALL SELECT 3, 'dedup_gate', dedup_gate FROM f
      UNION ALL SELECT 4, 'decontamination_gate', decontamination_gate FROM f
    """


def _dsir_oracle_ctes(
    n_buckets: int = 4096,
    alpha: float = 0.5,
    seed: int = 13,
    gumbel_seed: int = 97,
    keep_fraction: float = 0.25,
) -> str:
    """DuckDB CTE chain replaying operators/dsir.py end to end: hashed
    unigram+bigram features → target/raw bucket distributions → per-bucket
    ln(a)−ln(b) log weights → per-doc sums → hash-Gumbel priorities →
    exact quantile threshold. Exposes ``dsir_pri`` (doc_id, priority) and
    ``dsir_thr`` (t) for the sampling entry's final union."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql
    from ndap_data_validator_spark.operators.dsir import gumbel_key_sql

    b = float(alpha * n_buckets)
    bucket = f"({portable_hash64_sql('feat', seed)}) % {n_buckets}"
    toks = (
        "CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[] "
        r"ELSE list_transform(regexp_split_to_array(trim(text), '\s+'), "
        "x -> lower(x)) END"
    )
    feats = (
        "list_concat(t, CASE WHEN len(t) <= 1 THEN []::VARCHAR[] "
        "ELSE list_transform(generate_series(1, len(t) - 1), "
        "i -> array_to_string(t[i:i+1], ' ')) END)"
    )
    q = 1.0 - keep_fraction
    return f"""
      dsir_tgt AS (SELECT text FROM documents
                   WHERE doc_id % 5 = 0 AND doc_id < 400),
      dsir_raw AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
      dsir_tt AS (SELECT {toks} AS t FROM dsir_tgt),
      dsir_tf AS (SELECT unnest({feats}) AS feat FROM dsir_tt),
      dsir_tb AS (SELECT {bucket} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt_t
                  FROM dsir_tf GROUP BY 1),
      dsir_rt AS (SELECT doc_id, {toks} AS t FROM dsir_raw),
      dsir_rf AS (SELECT doc_id, unnest({feats}) AS feat FROM dsir_rt),
      dsir_rfb AS (SELECT doc_id, {bucket} AS bucket FROM dsir_rf),
      dsir_rb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt_r
                  FROM dsir_rfb GROUP BY bucket),
      dsir_j AS (SELECT COALESCE(dsir_tb.bucket, dsir_rb.bucket) AS bucket,
                        COALESCE(cnt_t, 0) AS cnt_t,
                        COALESCE(cnt_r, 0) AS cnt_r
                 FROM dsir_tb FULL OUTER JOIN dsir_rb
                   ON dsir_tb.bucket = dsir_rb.bucket),
      dsir_tot AS (SELECT SUM(cnt_t) AS t_tot, SUM(cnt_r) AS r_tot
                   FROM dsir_j),
      dsir_w AS (SELECT bucket,
                   (ln(cnt_t + {alpha}) - ln(t_tot + {b}))
                   - (ln(cnt_r + {alpha}) - ln(r_tot + {b})) AS w
                 FROM dsir_j, dsir_tot),
      dsir_un AS (SELECT (ln({alpha}) - ln(t_tot + {b}))
                         - (ln({alpha}) - ln(r_tot + {b})) AS w_unseen
                  FROM dsir_tot),
      dsir_sc AS (SELECT doc_id, COALESCE(w, w_unseen) AS w
                  FROM dsir_rfb LEFT JOIN dsir_w USING (bucket), dsir_un),
      dsir_per AS (SELECT doc_id, ROUND(SUM(w), 6) AS log_w
                   FROM dsir_sc GROUP BY doc_id),
      dsir_base AS (SELECT d.doc_id, COALESCE(dsir_per.log_w, 0.0) AS log_w
                    FROM (SELECT DISTINCT doc_id FROM dsir_raw) d
                    LEFT JOIN dsir_per USING (doc_id)),
      dsir_pri AS (SELECT doc_id,
                     ROUND(log_w + {gumbel_key_sql('doc_id', gumbel_seed)}, 6)
                       AS priority
                   FROM dsir_base),
      dsir_thr AS (SELECT quantile_cont(priority, {q}) AS t FROM dsir_pri)
    """


def _lm_cross_entropy_oracle_sql(alpha: float = 0.5) -> str:
    """DuckDB replay of unigram_lm + doc_cross_entropy: same tokenization,
    same add-alpha smoothing, and the SAME ln(a)-ln(b) formulation (not
    ln(a/b)) so the doubles agree bit-for-bit before the 6dp round."""
    toks = (
        r"CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[] "
        r"ELSE list_transform(regexp_split_to_array(trim(text), '\s+'), "
        r"x -> lower(x)) END"
    )
    return rf"""
      WITH ref AS (SELECT text FROM documents WHERE doc_id < 400),
      docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
      rt AS (SELECT unnest({toks}) AS token FROM ref),
      counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM rt GROUP BY token),
      consts AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                        CAST(COUNT(*) AS BIGINT) AS vocab FROM counts),
      lm AS (SELECT token,
                    ln(cnt + {alpha}) - ln(total + {alpha} * (vocab + 1)) AS logp
             FROM counts, consts),
      unk AS (SELECT ln({alpha}) - ln(total + {alpha} * (vocab + 1)) AS unk_logp
              FROM consts),
      dt AS (SELECT doc_id, unnest({toks}) AS token FROM docs),
      scored AS (SELECT dt.doc_id, COALESCE(lm.logp, unk.unk_logp) AS lp
                 FROM dt LEFT JOIN lm USING (token), unk),
      per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     ROUND(-AVG(lp), 6) AS cross_entropy
              FROM scored GROUP BY doc_id),
      ce AS (SELECT d.doc_id,
                    CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
                    per.cross_entropy
             FROM (SELECT DISTINCT doc_id FROM docs) d
             LEFT JOIN per USING (doc_id)),
      cuts AS (SELECT quantile_cont(cross_entropy, 0.33) AS t1,
                      quantile_cont(cross_entropy, 0.67) AS t2 FROM ce)
      SELECT doc_id, n_tokens, cross_entropy,
             CASE WHEN cross_entropy IS NULL THEN NULL
                  WHEN cross_entropy <= t1 THEN 'head'
                  WHEN cross_entropy <= t2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM ce, cuts
    """


def _semantic_dedup_oracle_sql(
    n_centroids: int = 8, seed: int = 42, threshold: float = 0.999
) -> str:
    """DuckDB replay of semantic_dedup(lloyd_iterations=0, hash_fn='md5'):
    md5 seed-centroid selection, nearest-cell assignment (ties → smaller
    cell, as assign_cells' max_by struct), within-cell lower-id prune rule
    on the 4dp-rounded cosine. max_cell_size is above the input size, so
    full within-cell pairs — no star branch to replay."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    return f"""
      WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings WHERE vec_id < 300),
      e AS (SELECT vec_id, v FROM base
            UNION ALL
            SELECT vec_id + 1000000, v FROM base WHERE vec_id < 3),
      seeds AS (SELECT vec_id, v FROM e
                ORDER BY {P('CAST(vec_id AS VARCHAR)', seed)} LIMIT {n_centroids}),
      cents AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
                       v AS centroid FROM seeds),
      scored AS (SELECT e.vec_id, e.v, c.cell_id,
                        {cos('e.v', 'c.centroid')} AS cc FROM e, cents c),
      cells AS (SELECT vec_id, v, cell_id FROM (
                  SELECT vec_id, v, cell_id,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY cc DESC, cell_id ASC) AS rn
                  FROM scored) WHERE rn = 1),
      pruned AS (SELECT DISTINCT b.vec_id
                 FROM cells a JOIN cells b
                   ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
                 WHERE ROUND({cos('a.v', 'b.v')}, 4) >= {threshold})
      SELECT c.vec_id, c.cell_id, (p.vec_id IS NULL) AS is_keeper
      FROM cells c LEFT JOIN pruned p ON c.vec_id = p.vec_id
    """


def _corpus_mixture_oracle_sql() -> str:
    """DuckDB replay of corpus_mixture_report: lang-ID argmax (earlier
    marker language wins ties), ws/bpe token counts, UNROUNDED per-doc
    quality averaged then rounded, window token share over the grouped
    (language-sized) result."""
    from ndap_data_validator_spark.functions.textstats import (
        BPE_ISH_TOKEN_RE,
        LANG_MARKERS,
        _STOPWORDS_EN,
    )

    sw = "[" + ",".join(f"'{w}'" for w in _STOPWORDS_EN) + "]"
    hits = ", ".join(
        "len(list_filter(ltoks, x -> list_contains(["
        + ",".join(f"'{w}'" for w in ws_)
        + f"], x))) AS {lang}"
        for lang, ws_ in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    label_branches = []
    for i, lang in enumerate(langs):
        laters = langs[i + 1:]
        cond = f"{lang} > 0" + "".join(f" AND {lang} >= {o}" for o in laters)
        label_branches.append(f"WHEN {cond} THEN '{lang}'")
    label = "CASE " + " ".join(label_branches) + " ELSE 'und' END"
    bpe_pat = BPE_ISH_TOKEN_RE.replace("'", "''")
    return rf"""
      WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      t AS (SELECT doc_id, text,
              CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
            FROM d),
      t2 AS (SELECT doc_id, text, toks,
               list_transform(toks, x -> lower(x)) AS ltoks,
               COALESCE(CASE WHEN len(toks) > 0
                 THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                      / len(toks) END, 0.0) AS mwl
             FROM t),
      f AS (SELECT doc_id,
              LEAST(len(ltoks)::DOUBLE / 20.0, 1.0) * 0.3
              + COALESCE(CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[^\p{{L}}]', '', 'g'))::DOUBLE
                       / length(text) END, 0.0) * 0.3
              + LEAST(COALESCE(CASE WHEN len(ltoks) > 0
                  THEN len(list_filter(ltoks, x -> list_contains({sw}, x)))::DOUBLE
                       / len(ltoks) END, 0.0) * 4, 1.0) * 0.2
              + (CASE WHEN mwl >= 2 AND mwl <= 12 THEN 1.0 ELSE 0.3 END) * 0.2
                AS q,
              len(toks) AS ws,
              CASE WHEN text IS NULL THEN NULL
                   ELSE len(regexp_extract_all(text, '{bpe_pat}')) END AS bpe,
              {hits}
            FROM t2),
      labeled AS (SELECT doc_id, q, ws, bpe, {label} AS lang FROM f),
      grouped AS (SELECT lang,
                         CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(ws) AS BIGINT) AS tokens_ws,
                         CAST(SUM(bpe) AS BIGINT) AS tokens_bpe,
                         ROUND(AVG(q), 4) AS avg_quality
                  FROM labeled GROUP BY lang)
      SELECT lang, n_docs, tokens_ws, tokens_bpe, avg_quality,
             ROUND(tokens_ws::DOUBLE / SUM(tokens_ws) OVER (), 4) AS token_share,
             ROUND(POWER(tokens_ws, 0.3) / SUM(POWER(tokens_ws, 0.3)) OVER (), 4)
               AS mixture_weight
      FROM grouped
    """


def _chunk_cte_sql(max_tokens: int, overlap: int, max_doc_id: int = 200) -> str:
    """Shared DuckDB CTE replaying chunk_documents' stride arithmetic:
    yields (doc_id, chunk_idx, piece) with piece = the chunk's token list.
    DuckDB list slices are 1-based inclusive and truncate past the end —
    matching Spark's slice(toks, start+1, max_tokens)."""
    stride = max_tokens - overlap
    return rf"""
      t AS (SELECT doc_id,
              CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                   ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
            FROM documents WHERE doc_id < {max_doc_id}),
      nc AS (SELECT doc_id, toks, len(toks) AS n,
                    CASE WHEN len(toks) > 0
                         THEN CAST(FLOOR((GREATEST(len(toks) - {overlap}, 1) - 1)
                                         / {stride}.0) AS BIGINT) + 1
                         ELSE 0 END AS n_chunks
             FROM t),
      ch AS (SELECT doc_id,
                    CAST(ci AS INT) AS chunk_idx,
                    toks[ci * {stride} + 1 : ci * {stride} + {max_tokens}] AS piece
             FROM nc, unnest(generate_series(0, CAST(n_chunks AS INT) - 1)) AS u(ci)
             WHERE n_chunks > 0)"""


def _doc_chunks_oracle_sql() -> str:
    return f"""
      WITH {_chunk_cte_sql(32, 8)}
      SELECT doc_id, chunk_idx,
             CAST(len(piece) AS INT) AS n_tokens,
             array_to_string(piece, ' ') AS chunk_text
      FROM ch
    """


def _pack_manifest_oracle_sql(
    budget: int = 64, n_shards: int = 4, seed: int = 42
) -> str:
    """DuckDB replay of pack_manifest over the 32-token chunking: portable
    md5 shard routing, per-shard running sum ordered by (doc_id,
    chunk_idx), floor/mod bin arithmetic, straddle flag."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    return f"""
      WITH {_chunk_cte_sql(32, 0)},
      sh AS (SELECT doc_id, chunk_idx, CAST(len(piece) AS INT) AS n_tokens,
                    {P('CAST(doc_id AS VARCHAR)', seed)} % {n_shards} AS shard
             FROM ch),
      c AS (SELECT shard, doc_id, chunk_idx, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY shard
                                       ORDER BY doc_id, chunk_idx
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) - n_tokens AS prefix
            FROM sh)
      SELECT shard,
             CAST(FLOOR(prefix / {budget}.0) AS BIGINT) AS bin_id,
             doc_id, chunk_idx, n_tokens,
             CAST(prefix % {budget} AS BIGINT) AS "offset",
             (prefix % {budget} + n_tokens) > {budget} AS split
      FROM c
    """


def _packing_oracle_sql() -> str:
    """Method-tagged union of both packing manifests with aligned columns —
    mirrors q_packing's consolidation (r05)."""
    return f"""
      SELECT 'chunk' AS method, doc_id, chunk_idx, n_tokens,
             CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS bin_id,
             CAST(NULL AS BIGINT) AS "offset", CAST(NULL AS BOOLEAN) AS split,
             chunk_text
      FROM ({_doc_chunks_oracle_sql()})
      UNION ALL
      SELECT 'pack', doc_id, chunk_idx, n_tokens, shard, bin_id, "offset",
             split, CAST(NULL AS VARCHAR)
      FROM ({_pack_manifest_oracle_sql()})
    """


def _sql_text_lit(s: str) -> str:
    """Render a Python string as a DuckDB expression, splicing newlines in
    as chr(10) so the SQL source stays one physical line."""
    parts = ["'" + seg.replace("'", "''") + "'" for seg in s.split("\n")]
    return "(" + " || chr(10) || ".join(parts) + ")"


def _render_transcripts_oracle_sql() -> str:
    """DuckDB replay of q_render_transcripts: same transcript synthesis,
    same template affixes (operators/render.py PRE/MID/SUF), prefix-sum
    span arithmetic, and md5 over string_agg(... ORDER BY turn_idx)."""
    from ndap_data_validator_spark.operators.render import MID, PRE, SUF

    pre_n, mid_n, suf_n = len(PRE), len(MID), len(SUF)
    pre_e, mid_e, suf_e = (_sql_text_lit(x) for x in (PRE, MID, SUF))
    return f"""
      WITH e AS (
        SELECT * FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND props IS NOT NULL AND user_id < 40),
      t0 AS (
        SELECT user_id AS conv_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS INT) AS turn_idx,
               event_type, event_id, props
        FROM e),
      t AS (
        SELECT conv_id, turn_idx,
               CASE WHEN turn_idx = 1 AND conv_id % 5 = 0 THEN 'system'
                    WHEN turn_idx % 2 = 1 THEN 'user'
                    ELSE 'assistant' END AS role,
               event_type || ' #' || CAST(event_id AS VARCHAR) || ' ' || props
                 AS text
        FROM t0),
      r AS (
        SELECT conv_id, turn_idx, role, text,
               CAST({pre_n + mid_n + suf_n} + length(role) + length(text)
                    AS BIGINT) AS n_chars,
               {pre_e} || role || {mid_e} || text || {suf_e} AS rendered_turn
        FROM t),
      s AS (
        SELECT *,
               SUM(n_chars) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n_chars AS start_char
        FROM r)
      SELECT 'turn' AS method, conv_id, turn_idx, role, n_chars,
             CAST(start_char AS BIGINT) AS start_char,
             CAST(start_char + {pre_n + mid_n} + length(role) AS BIGINT)
               AS text_start,
             CAST(start_char + {pre_n + mid_n} + length(role) + length(text)
                  AS BIGINT) AS text_end,
             role = 'assistant' AS is_target,
             CAST(NULL AS BIGINT) AS n_turns,
             CAST(NULL AS BIGINT) AS n_target_chars,
             CAST(NULL AS VARCHAR) AS rendered_md5
      FROM s
      UNION ALL
      SELECT 'conv', conv_id, NULL, NULL, CAST(SUM(n_chars) AS BIGINT),
             NULL, NULL, NULL, NULL,
             CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(CASE WHEN role = 'assistant'
                                    THEN length(text) END), 0) AS BIGINT),
             md5(string_agg(rendered_turn, '' ORDER BY turn_idx))
      FROM s GROUP BY conv_id
    """


def _decontamination_oracle_sql() -> str:
    """Method-tagged union of both decontamination flavors with aligned
    columns — mirrors q_decontamination's consolidation (r05)."""
    return f"""
      SELECT 'exact' AS method, doc_id, n_hits AS n_matches,
             hit_ratio AS score, contaminated
      FROM ({_decontamination_exact_oracle_sql()})
      UNION ALL
      SELECT 'fuzzy' AS method, doc_id, n_bench_matches AS n_matches,
             max_jaccard AS score, contaminated
      FROM ({_decontamination_fuzzy_oracle_sql()})
      UNION ALL
      SELECT 'bloom' AS method, doc_id, n_hits AS n_matches,
             hit_ratio AS score, contaminated
      FROM ({_decontamination_bloom_oracle_sql()})
    """


def _decontamination_exact_oracle_sql(n: int = 8, seed: int = 42) -> str:
    """DuckDB replay of the md5-portable decontamination pipeline: same
    tokenization/shingling as the minhash oracle, benchmark = doc_id % 7."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    k = n - 1
    return rf"""
      WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
      w AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM docs),
      s AS (SELECT doc_id,
              CASE WHEN len(w) - {k} <= 0 THEN [array_to_string(w, ' ')]
                   ELSE list_distinct(list_transform(
                          generate_series(1, len(w) - {k}),
                          i -> array_to_string(w[i:i+{k}], ' ')))
              END AS ngrams
            FROM w),
      ex AS (SELECT doc_id, {P('ng', seed)} AS ng_hash
             FROM (SELECT doc_id, unnest(ngrams) AS ng FROM s)),
      bh AS (SELECT DISTINCT ng_hash FROM ex WHERE doc_id % 7 = 0),
      m AS (SELECT e.doc_id,
                   CASE WHEN b.ng_hash IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM ex e LEFT JOIN bh b USING (ng_hash))
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(hit) AS BIGINT) AS n_hits,
             ROUND(SUM(hit)::DOUBLE / COUNT(*), 4) AS hit_ratio,
             (SUM(hit)::DOUBLE / COUNT(*)) > 0.0 AS contaminated
      FROM m GROUP BY doc_id
    """


def _decontamination_bloom_oracle_sql(
    n: int = 8,
    seed: int = 42,
    m_bits: int = 1 << 20,
    k: int = 3,
    bloom_seed: int = 101,
) -> str:
    """DuckDB replay of the Bloom-bitset decontamination
    (operators/decontaminate.py bloom_bitset + decontaminate_bloom):
    same shingling as the exact check, then each benchmark n-gram hash
    sets k positions (md5 re-hash with a 'j#' prefix) in a 2^20-bit /
    32-bit-word bitset built with bit_or, and each corpus n-gram is
    maybe-in iff all k probed bits are set — the identical integer
    arithmetic both engines can compute."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    kk = n - 1
    probe = P(f"CAST(j AS VARCHAR) || '#' || CAST(ng_hash AS VARCHAR)", bloom_seed)
    mask = "(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))"
    return rf"""
      WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
      w AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM docs),
      s AS (SELECT doc_id,
              CASE WHEN len(w) - {kk} <= 0 THEN [array_to_string(w, ' ')]
                   ELSE list_distinct(list_transform(
                          generate_series(1, len(w) - {kk}),
                          i -> array_to_string(w[i:i+{kk}], ' ')))
              END AS ngrams
            FROM w),
      ex AS (SELECT doc_id, ng, {P('ng', seed)} AS ng_hash
             FROM (SELECT doc_id, unnest(ngrams) AS ng FROM s)),
      bh AS (SELECT DISTINCT ng_hash FROM ex WHERE doc_id % 7 = 0),
      js AS (SELECT unnest(generate_series(0, {k - 1})) AS j),
      bpos AS (SELECT ({probe}) % {m_bits} AS pos FROM bh CROSS JOIN js),
      bits AS (SELECT pos // 32 AS word, bit_or({mask}) AS bits
               FROM bpos GROUP BY 1),
      mp AS (SELECT doc_id, ng, ({probe}) % {m_bits} AS pos
             FROM ex CROSS JOIN js),
      mh AS (SELECT doc_id, ng,
               CASE WHEN (COALESCE(bits.bits, 0) & {mask}) = {mask}
                    THEN 1 ELSE 0 END AS hitj
             FROM mp LEFT JOIN bits ON (mp.pos // 32) = bits.word),
      gh AS (SELECT doc_id, ng,
               CASE WHEN SUM(hitj) = {k} THEN 1 ELSE 0 END AS hit
             FROM mh GROUP BY doc_id, ng)
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(hit) AS BIGINT) AS n_hits,
             ROUND(SUM(hit)::DOUBLE / COUNT(*), 4) AS hit_ratio,
             (SUM(hit)::DOUBLE / COUNT(*)) > 0.0 AS contaminated
      FROM gh GROUP BY doc_id
    """


def _repeated_ngrams_oracle_sql(seed: int = 42, min_docs: int = 2) -> str:
    """DuckDB replay of repeated_ngram_report (operators/repeated.py) in
    its md5 configuration: positional n-grams (short-doc whole-text rule),
    repeated-hash set by distinct-doc count, pos − cumulative-count run
    grouping — identical state to the Spark plan, including the planted
    every-10th-doc slogan."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    k = _RPT_N - 1
    ng = (
        f"CASE WHEN len(w) - {k} <= 0 THEN array_to_string(w, ' ') "
        f"ELSE array_to_string(w[pos:pos+{k}], ' ') END"
    )
    return rf"""
      WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN text || '{_RPT_SLOGAN}'
                    ELSE text END AS text
        FROM documents WHERE doc_id < 400),
      w AS (SELECT doc_id,
              regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM docs),
      px AS (SELECT doc_id, w,
               unnest(CASE WHEN len(w) - {k} <= 0 THEN [1]
                           ELSE generate_series(1, len(w) - {k}) END) AS pos
             FROM w),
      hx AS (SELECT doc_id, pos, {P(ng, seed)} AS hh FROM px),
      rep AS (SELECT hh FROM (
                SELECT hh, COUNT(DISTINCT doc_id) AS nd FROM hx GROUP BY hh)
              WHERE nd >= {min_docs}),
      m AS (SELECT hx.doc_id, hx.pos,
                   CASE WHEN rep.hh IS NOT NULL THEN 1 ELSE 0 END AS r
            FROM hx LEFT JOIN rep USING (hh)),
      c AS (SELECT doc_id, pos, r,
                   SUM(r) OVER (PARTITION BY doc_id ORDER BY pos) AS cum
            FROM m),
      g AS (SELECT doc_id,
                   CASE WHEN r = 1 THEN pos - cum ELSE NULL END AS grp,
                   COUNT(*) AS cnt
            FROM c GROUP BY doc_id, grp),
      snt AS (SELECT doc_id, len(w) AS nt FROM w),
      srep AS (SELECT hh, MIN(doc_id) AS canon
               FROM (SELECT DISTINCT doc_id, hh FROM hx) sd
               GROUP BY hh HAVING COUNT(*) >= {min_docs}),
      scov AS (SELECT DISTINCT doc_id, tpos FROM (
                 SELECT h.doc_id AS doc_id,
                        unnest(generate_series(
                          h.pos, least(h.pos + {k}, s.nt))) AS tpos
                 FROM hx h JOIN srep r USING (hh)
                 JOIN snt s ON s.doc_id = h.doc_id
                 WHERE h.doc_id IS DISTINCT FROM r.canon) sq),
      stok AS (SELECT doc_id, i AS tpos, w[i] AS tok FROM (
                 SELECT doc_id, w,
                        unnest(generate_series(1, len(w))) AS i
                 FROM w) tq),
      smk AS (SELECT t.doc_id, t.tpos, t.tok,
                     CASE WHEN c.tpos IS NOT NULL THEN 1 ELSE 0 END AS r,
                     SUM(CASE WHEN c.tpos IS NOT NULL THEN 1 ELSE 0 END)
                       OVER (PARTITION BY t.doc_id ORDER BY t.tpos) AS cum
              FROM stok t LEFT JOIN scov c ON c.doc_id = t.doc_id
                                          AND c.tpos = t.tpos),
      sclean AS (SELECT doc_id,
                   COALESCE(array_to_string(
                     list(tok ORDER BY tpos) FILTER (WHERE r = 0),
                     ' '), '') AS t
                 FROM smk GROUP BY doc_id),
      sg AS (SELECT doc_id,
                    CASE WHEN r = 1 THEN tpos - cum ELSE NULL END AS grp,
                    COUNT(*) AS cnt
             FROM smk GROUP BY doc_id, grp),
      sroll AS (SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_positions,
             CAST(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_repeated,
             ROUND(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END)::DOUBLE
                   / SUM(cnt), 4) AS repeated_frac,
             CAST(COALESCE(MAX(CASE WHEN grp IS NOT NULL THEN cnt END), 0)
               AS BIGINT) AS max_repeated_run
      FROM sg GROUP BY doc_id),
      ldocs AS (SELECT doc_id,
               array_to_string(w[1:12], ' ')
               || CASE WHEN doc_id % 5 = 0
                       THEN chr(10) || '{_LINE_BOILER}' ELSE '' END
               || chr(10)
               || COALESCE(array_to_string(w[13:len(w)], ' '), '')
                 AS text
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents WHERE doc_id < 400)),
      ll AS (SELECT doc_id, string_split(text, chr(10)) AS L FROM ldocs),
      lpx AS (SELECT doc_id, L,
                unnest(generate_series(1, len(L))) AS pos
              FROM ll),
      lrow AS (SELECT doc_id, pos, L[pos] AS line,
                      lower(trim(L[pos])) AS norm
               FROM lpx),
      lelig AS (SELECT doc_id, pos, {P('norm', seed)} AS hh
                FROM lrow WHERE norm <> ''),
      lrep AS (SELECT hh FROM (
                 SELECT hh, COUNT(DISTINCT doc_id) AS nd
                 FROM lelig GROUP BY hh)
               WHERE nd >= {min_docs}),
      lflag AS (SELECT e.doc_id, e.pos, 1 AS r
                FROM lelig e JOIN lrep USING (hh)),
      lc AS (SELECT l.doc_id, l.pos, l.line, COALESCE(f.r, 0) AS r,
                    SUM(COALESCE(f.r, 0)) OVER (
                      PARTITION BY l.doc_id ORDER BY l.pos) AS cum
             FROM lrow l LEFT JOIN lflag f ON l.doc_id = f.doc_id
                                          AND l.pos = f.pos),
      lclean AS (SELECT doc_id,
                   COALESCE(array_to_string(
                     list(line ORDER BY pos) FILTER (WHERE r = 0),
                     chr(10)), '') AS t
                 FROM lc GROUP BY doc_id),
      lg AS (SELECT doc_id,
                    CASE WHEN r = 1 THEN pos - cum ELSE NULL END AS grp,
                    COUNT(*) AS cnt
             FROM lc GROUP BY doc_id, grp),
      lroll AS (SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_positions,
             CAST(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_repeated,
             ROUND(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END)::DOUBLE
                   / SUM(cnt), 4) AS repeated_frac,
             CAST(COALESCE(MAX(CASE WHEN grp IS NOT NULL THEN cnt END), 0)
               AS BIGINT) AS max_repeated_run
      FROM lg GROUP BY doc_id)
      SELECT 'ngram' AS method, doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_positions,
             CAST(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_repeated,
             ROUND(SUM(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END)::DOUBLE
                   / SUM(cnt), 4) AS repeated_frac,
             CAST(COALESCE(MAX(CASE WHEN grp IS NOT NULL THEN cnt END), 0)
               AS BIGINT) AS max_repeated_run,
             CAST(NULL AS VARCHAR) AS cleaned_md5
      FROM g GROUP BY doc_id
      UNION ALL
      SELECT 'line' AS method, r.doc_id, r.n_positions, r.n_repeated,
             r.repeated_frac, r.max_repeated_run, md5(c.t) AS cleaned_md5
      FROM lroll r JOIN lclean c USING (doc_id)
      UNION ALL
      SELECT 'substring' AS method, r.doc_id, r.n_positions, r.n_repeated,
             r.repeated_frac, r.max_repeated_run, md5(c.t) AS cleaned_md5
      FROM sroll r JOIN sclean c USING (doc_id)
    """


def _bpe_encode_oracle_sql() -> str:
    """DuckDB replay of the merge-table BPE: identical pretokenizer regex
    and identical sentinel-replace chain (functions/bpe.py renders both),
    so the full token stream hash matches byte-for-byte — and (r05) the
    identical vocabulary build (byte-ordered base alphabet + rank-ordered
    merge products, bpe_vocab_sql) plus position-ordered id join, so the
    INTEGER ID sequence hash matches too."""
    from ndap_data_validator_spark.functions.bpe import (
        bpe_stream_sql,
        bpe_tokens_sql_from_stream,
        bpe_vocab_sql,
    )

    vocab = bpe_vocab_sql("SELECT text FROM documents", "text")
    toks = bpe_tokens_sql_from_stream("stream")
    return f"""
      WITH enc AS (
        SELECT doc_id, {bpe_stream_sql('text')} AS stream FROM documents
      ),
      vocab AS ({vocab}),
      tk AS (
        SELECT doc_id, toks[i] AS tok, i FROM (
          SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks))) AS i
          FROM (SELECT doc_id, {toks} AS toks FROM enc) a
        ) b
      ),
      ids AS (
        SELECT doc_id,
               string_agg(CAST(v.token_id AS VARCHAR), ',' ORDER BY i)
                 AS idstr
        FROM tk JOIN vocab v ON v.token = tk.tok
        GROUP BY doc_id
      )
      SELECT e.doc_id,
             CAST((length(e.stream)
                   - length(replace(e.stream, chr(31), ''))) / 2 AS INT)
               AS n_tokens_bpe_real,
             md5(e.stream) AS stream_md5,
             CASE WHEN e.stream IS NULL THEN NULL
                  ELSE md5(COALESCE(i.idstr, '')) END AS ids_md5
      FROM enc e LEFT JOIN ids i USING (doc_id)
    """


def _bpe_train_oracle_sql() -> str:
    """DuckDB replay of the distributed BPE trainer: the greedy loop
    unrolled into K CTE steps with the exact state / pair-extraction /
    tie-break expressions the Spark loop runs (functions/bpe.py
    bpe_train_sql), so the learned merge sequence matches rank-for-rank
    with counts."""
    from ndap_data_validator_spark.functions.bpe import bpe_train_sql

    return bpe_train_sql(
        f"SELECT text FROM documents WHERE doc_id < {_BPE_TRAIN_DOCS}",
        "text",
        _BPE_TRAIN_MERGES,
    )


def _pack_nosplit_oracle_sql(
    budget: int = 256, n_shards: int = 4, seed: int = 42
) -> str:
    """DuckDB replay of pack_nosplit's greedy rule: md5 shard routing, per
    shard rank by (n_tokens DESC, doc_id), then a RECURSIVE CTE walks the
    rank order carrying (bin_id, fill) — the sequential next-fit fold the
    engine runs in applyInPandas."""
    from ndap_data_validator_spark.functions.bpe import bpe_token_count_sql
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    nt = bpe_token_count_sql("text")
    return f"""
      WITH RECURSIVE
      src AS (SELECT doc_id, {nt} AS n_tokens
              FROM documents WHERE doc_id < 400),
      sz AS (SELECT doc_id, n_tokens,
                    {P('CAST(doc_id AS VARCHAR)', seed)} % {n_shards} AS shard
             FROM src WHERE n_tokens > 0),
      r AS (SELECT shard, doc_id, n_tokens,
                   CAST(ROW_NUMBER() OVER (PARTITION BY shard
                        ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn
            FROM sz),
      rec(shard, rn, doc_id, n_tokens, bin_id, fill) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT),
               CAST(n_tokens AS BIGINT)
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
               CASE WHEN rec.fill + r.n_tokens <= {budget}
                    THEN rec.bin_id ELSE rec.bin_id + 1 END,
               CASE WHEN rec.fill + r.n_tokens <= {budget}
                    THEN rec.fill + r.n_tokens
                    ELSE CAST(r.n_tokens AS BIGINT) END
        FROM r JOIN rec ON r.shard = rec.shard AND r.rn = rec.rn + 1)
      SELECT shard, bin_id, doc_id, n_tokens,
             CAST(fill - n_tokens AS BIGINT) AS "offset"
      FROM rec
    """


def _quality_classifier_oracle_sql(
    n_buckets: int = 256, alpha: float = 0.5, seed: int = 7
) -> str:
    """DuckDB replay of the NB log-odds hashing classifier: same
    tokenization, same md5 bucketing, the SAME ln(a)-ln(b) term order (lm
    parity trick), 6dp-rounded score, predicted from the rounded value."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql as P

    b = float(n_buckets) * alpha
    toks = (
        r"CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[] "
        r"ELSE list_transform(regexp_split_to_array(trim(text), '\s+'), "
        r"x -> lower(x)) END"
    )
    return f"""
      WITH train AS (
        SELECT doc_id, text, TRUE AS label
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id + 1000000, regexp_replace(text, '[aeiou]', 'q', 'g'),
               FALSE
        FROM documents WHERE doc_id < 400),
      tb AS (SELECT label, {P('token', seed)} % {n_buckets} AS bucket
             FROM (SELECT label, unnest({toks}) AS token FROM train)),
      counts AS (SELECT bucket,
                   CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
                   CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS cneg
                 FROM tb GROUP BY bucket),
      tot AS (SELECT CAST(SUM(cpos) AS BIGINT) AS tpos,
                     CAST(SUM(cneg) AS BIGINT) AS tneg FROM counts),
      nd AS (SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS npos,
                    CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS nneg
             FROM train),
      consts AS (SELECT ln(npos::DOUBLE) - ln(nneg::DOUBLE) AS prior,
                        ln({alpha}) - ln(tpos + {b}) - ln({alpha}) + ln(tneg + {b})
                          AS w_unseen
                 FROM tot, nd),
      w AS (SELECT bucket,
                   ln(cpos + {alpha}) - ln(tpos + {b})
                   - ln(cneg + {alpha}) + ln(tneg + {b}) AS w
            FROM counts, tot),
      score_set AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT doc_id + 1000000, regexp_replace(text, '[aeiou]', 'q', 'g')
        FROM documents WHERE doc_id < 3),
      sb AS (SELECT doc_id, {P('token', seed)} % {n_buckets} AS bucket
             FROM (SELECT doc_id, unnest({toks}) AS token FROM score_set)),
      sw AS (SELECT sb.doc_id, COALESCE(w.w, consts.w_unseen) AS wv
             FROM sb LEFT JOIN w USING (bucket), consts),
      per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     SUM(wv) AS s
              FROM sw GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
             ROUND(consts.prior + COALESCE(per.s, 0.0), 6) AS score,
             ROUND(consts.prior + COALESCE(per.s, 0.0), 6) > 0 AS predicted
      FROM (SELECT DISTINCT doc_id FROM score_set) d
      LEFT JOIN per USING (doc_id), consts
    """


def oracle_sql() -> dict[str, str]:
    ev_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    null_census = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls FROM events"
        for c in ev_cols
    )

    # isnan terms mirror the engine's NaN→null normalization (pandas isna
    # parity): a string parsing to NaN counts as error + null on both sides.
    int_err = (
        "int_m IS NOT NULL AND (TRY_CAST(int_m AS DOUBLE) IS NULL "
        "OR isnan(TRY_CAST(int_m AS DOUBLE)) "
        "OR fmod(TRY_CAST(int_m AS DOUBLE), 1) != 0)"
    )
    float_err = (
        "float_m IS NOT NULL AND (TRY_CAST(float_m AS DOUBLE) IS NULL "
        "OR isnan(TRY_CAST(float_m AS DOUBLE)))"
    )

    coercion_report = f"""
      WITH d AS ({DERIVED_SQL})
      SELECT 'int_m' AS "column",
             CAST(SUM(CASE WHEN {int_err} THEN 1 ELSE 0 END) AS BIGINT) AS conversion_errors
      FROM d
      UNION ALL
      SELECT 'float_m',
             CAST(SUM(CASE WHEN {float_err} THEN 1 ELSE 0 END) AS BIGINT)
      FROM d
    """

    time_format_census = f"""
      WITH d AS ({DERIVED_SQL}),
      lab AS (SELECT year_str AS s, {LABEL_SQL} AS label FROM d WHERE year_str IS NOT NULL)
      SELECT COALESCE(label, '<invalid>') AS label, CAST(COUNT(*) AS BIGINT) AS n
      FROM lab GROUP BY 1
    """

    validation_report = f"""
      WITH d AS ({DERIVED_SQL}),
      lab AS (SELECT year_str AS s, {LABEL_SQL} AS label FROM d),
      tmaj AS (SELECT COALESCE(MAX(c), 0) AS majority FROM
                 (SELECT COUNT(*) AS c FROM lab WHERE label IS NOT NULL GROUP BY label)),
      tagg AS (SELECT
          CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
          CAST(SUM(CASE WHEN s IS NOT NULL AND label IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid,
          CAST(COUNT(label) AS BIGINT) AS valid_total,
          CAST(COUNT(DISTINCT label) AS BIGINT) AS n_formats
        FROM lab),
      agg AS (SELECT
          CAST(SUM(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS conv_nulls,
          CAST(SUM(CASE WHEN role IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS role_nulls,
          CAST(SUM(CASE WHEN tag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tag_nulls,
          CAST(SUM(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS turn_nulls,
          CAST(SUM(CASE WHEN int_m IS NULL OR {int_err} THEN 1 ELSE 0 END) AS BIGINT) AS int_nulls,
          CAST(SUM(CASE WHEN {int_err} THEN 1 ELSE 0 END) AS BIGINT) AS int_errs,
          CAST(SUM(CASE WHEN float_m IS NULL OR ({float_err}) THEN 1 ELSE 0 END) AS BIGINT) AS float_nulls,
          CAST(SUM(CASE WHEN {float_err} THEN 1 ELSE 0 END) AS BIGINT) AS float_errs
        FROM d)
      SELECT '<all>' AS partition_id, 'conv_id' AS "column", 'Location' AS role,
             conv_nulls AS nulls, CAST(0 AS BIGINT) AS conversion_errors,
             conv_nulls = 0 AS passed,
             CASE WHEN conv_nulls > 0 THEN 'No Nulls allowed' ELSE '' END AS reasons
      FROM agg
      UNION ALL
      SELECT '<all>', 'turn_idx', 'Measures', turn_nulls, CAST(0 AS BIGINT), TRUE, '' FROM agg
      UNION ALL
      SELECT '<all>', 'role', 'Others', role_nulls, CAST(0 AS BIGINT), TRUE, '' FROM agg
      UNION ALL
      SELECT '<all>', 'year_str', 'Time',
             t.nulls, t.invalid + (t.valid_total - CAST(m.majority AS BIGINT)),
             (t.nulls = 0 AND t.invalid = 0 AND t.n_formats <= 1),
             concat_ws('; ',
               CASE WHEN t.nulls > 0 THEN 'No Nulls allowed' END,
               CASE WHEN t.invalid > 0 THEN '{REASON_INVALID_TIME.replace("'", "''")}'
                    WHEN t.n_formats > 1 THEN 'Inconsistent time formats across rows' END)
      FROM tagg t, tmaj m
      UNION ALL
      SELECT '<all>', 'int_m', 'Measures', int_nulls, int_errs,
             int_errs = 0,
             CASE WHEN int_errs > 0 THEN 'Non-numeric values detected' ELSE '' END
      FROM agg
      UNION ALL
      SELECT '<all>', 'float_m', 'Measures', float_nulls, float_errs,
             float_errs = 0,
             CASE WHEN float_errs > 0 THEN 'Non-numeric values detected' ELSE '' END
      FROM agg
      UNION ALL
      SELECT '<all>', 'tag', 'Others', tag_nulls, CAST(0 AS BIGINT), TRUE, '' FROM agg
    """

    partition_summary = f"""
      WITH d AS ({DERIVED_SQL}),
      lab AS (SELECT role AS p, year_str AS s, {LABEL_SQL} AS label FROM d),
      tagg AS (SELECT p,
          SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS nulls,
          SUM(CASE WHEN s IS NOT NULL AND label IS NULL THEN 1 ELSE 0 END) AS invalid,
          COUNT(DISTINCT label) AS n_formats
        FROM lab GROUP BY p),
      base AS (SELECT role AS p, COUNT(*) AS n_rows,
          SUM(CASE WHEN conv_id IS NULL THEN 1 ELSE 0 END) AS conv_nulls,
          SUM(CASE WHEN {int_err} THEN 1 ELSE 0 END) AS int_errs,
          SUM(CASE WHEN {float_err} THEN 1 ELSE 0 END) AS float_errs
        FROM d GROUP BY role)
      SELECT 'validate' AS method, b.p AS partition_id,
        CAST(b.n_rows AS BIGINT) AS n_rows,
        CAST((CASE WHEN b.conv_nulls > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN t.nulls > 0 OR t.invalid > 0 OR (t.invalid = 0 AND t.n_formats > 1) THEN 1 ELSE 0 END)
           + (CASE WHEN b.int_errs > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN b.float_errs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS failed_count,
        (b.conv_nulls = 0 AND b.int_errs = 0 AND b.float_errs = 0
          AND t.nulls = 0 AND t.invalid = 0 AND t.n_formats <= 1) AS passed,
        concat_ws(',',
          CASE WHEN b.conv_nulls > 0 THEN 'conv_id' END,
          CASE WHEN t.nulls > 0 OR t.invalid > 0 OR (t.invalid = 0 AND t.n_formats > 1) THEN 'year_str' END,
          CASE WHEN b.int_errs > 0 THEN 'int_m' END,
          CASE WHEN b.float_errs > 0 THEN 'float_m' END) AS detail
      FROM base b JOIN tagg t ON b.p = t.p
      UNION ALL
      SELECT 'completeness', COALESCE(e.key, c.key),
        CAST(COALESCE(c.n, 0) AS BIGINT),
        CAST(NULL AS BIGINT),
        (e.key IS NOT NULL AND COALESCE(c.n, 0) >= 200) AS passed,
        CASE WHEN e.key IS NULL THEN 'unexpected'
             WHEN COALESCE(c.n, 0) = 0 THEN 'missing'
             WHEN c.n < 200 THEN 'undersized'
             ELSE 'ok' END
      FROM (VALUES ('click'), ('error'), ('purchase'), ('signup'),
                   ('view'), ('refund')) e(key)
      FULL OUTER JOIN (SELECT role AS key, COUNT(*) AS n FROM d GROUP BY role) c
        ON e.key = c.key
    """

    latest_event = """
      SELECT user_id, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    """

    join_lineage = """
      SELECT c.c_mktsegment AS c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    """

    union_tokens = """
      SELECT user_id AS token FROM events
      UNION SELECT o_custkey FROM orders
      UNION SELECT c_custkey FROM customer
    """

    uniqueness = """
      SELECT 'key_census' AS method, o_custkey, o_orderpriority AS detail,
             CAST(NULL AS INT) AS occurrence, CAST(COUNT(*) AS BIGINT) AS dup_count
      FROM orders GROUP BY o_custkey, o_orderpriority HAVING COUNT(*) > 1
      UNION ALL
      SELECT 'dup_rows', o_custkey, detail, occurrence, dup_count FROM (
        SELECT o_custkey, CAST(o_orderkey AS VARCHAR) AS detail,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey) AS INT)
                 AS occurrence,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
                 AS dup_count
        FROM orders WHERE o_custkey < 100) t
      WHERE dup_count > 1
    """

    sequence_checks = """
      WITH e AS (
        SELECT * FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND user_id < 75),
      t AS (
        SELECT user_id AS conv_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY event_id) AS INT) AS turn_idx,
               event_type AS role,
               CASE WHEN event_id % 11 = 0 THEN ts - INTERVAL 720 HOUR
                    ELSE ts END AS ts,
               event_id,
               value
        FROM e),
      t2 AS (SELECT * FROM t WHERE event_id % 7 != 0),
      l AS (
        SELECT conv_id, turn_idx, ts, role,
               LAG(turn_idx) OVER w AS pturn,
               LAG(ts) OVER w AS pts,
               LAG(role) OVER w AS prole
        FROM t2 WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
      jsonp AS (
        SELECT conv_id, turn_idx,
               CASE WHEN event_id % 13 = 0 THEN '{"tool": broken'
                    WHEN event_id % 13 = 1
                      THEN '{"retries":' || CAST(event_id % 5 AS VARCHAR)
                           || '}'
                    WHEN event_id % 13 = 2
                      THEN '{"tool":"t-' || CAST(event_id AS VARCHAR)
                           || '","retries":"lots"}'
                    ELSE '{"tool":"t-' || CAST(event_id AS VARCHAR)
                         || '","retries":' || CAST(event_id % 5 AS VARCHAR)
                         || '}'
               END AS payload
        FROM t2)
      SELECT conv_id, turn_idx, 'order_gap' AS "check"
        FROM l WHERE turn_idx != pturn + 1
      UNION ALL
      SELECT conv_id, turn_idx, 'ts_regression' FROM l WHERE ts < pts
      UNION ALL
      SELECT conv_id, turn_idx, 'long_gap'
        FROM l WHERE ts > pts + INTERVAL 500 HOUR
      UNION ALL
      SELECT conv_id, turn_idx, 'role_repeat' FROM l WHERE role = prole
      UNION ALL
      SELECT conv_id, turn_idx, 'bad_transition' FROM l
        WHERE prole IS NOT NULL
          AND NOT ((prole, role) IN (__SEQ_PAIRS__))
      UNION ALL
      SELECT conv_id, turn_idx, 'value_cap'
        FROM t2 WHERE (value <= 400) IS FALSE
      UNION ALL
      SELECT conv_id, turn_idx, 'error_low_value'
        FROM t2 WHERE (role <> 'error' OR value < 100) IS FALSE
      UNION ALL
      SELECT conv_id, turn_idx, 'json_malformed'
        FROM jsonp WHERE NOT json_valid(payload)
      UNION ALL
      SELECT conv_id, turn_idx, 'json_missing_tool' FROM jsonp
        WHERE json_valid(payload)
          AND json_extract(payload, '$.tool') IS NULL
      UNION ALL
      SELECT conv_id, turn_idx, 'json_missing_retries' FROM jsonp
        WHERE json_valid(payload)
          AND json_extract(payload, '$.retries') IS NULL
      UNION ALL
      SELECT conv_id, turn_idx, 'json_type_retries' FROM jsonp
        WHERE json_valid(payload)
          AND json_extract(payload, '$.retries') IS NOT NULL
          AND TRY_CAST(json_extract_string(payload, '$.retries') AS INTEGER)
              IS NULL
    """
    # render the FSM whitelist as row-value IN pairs — the same literal
    # set q_sequence_checks compiles to a Catalyst disjunction
    sequence_checks = sequence_checks.replace(
        "__SEQ_PAIRS__",
        ", ".join(
            f"('{a}', '{b}')" for a, b in sorted(_SEQ_TRANSITIONS)
        ),
    )

    ri_orphans = """
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS violation_count
      FROM events
      WHERE user_id IS NOT NULL
        AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
      GROUP BY user_id
    """

    stats_leg_sql = " UNION ALL ".join(
        f"""SELECT '{c}' AS name, '{m}' AS metric, {expr}::DOUBLE AS value
            FROM lineitem"""
        for c in _STATS_COLS
        for m, expr in [
            ("min", f"MIN({c})"),
            ("max", f"MAX({c})"),
            ("mean", f"ROUND(AVG({c}), 4)"),
            ("stddev", f"ROUND(STDDEV_SAMP({c}), 2)"),
            ("distinct", f"COUNT(DISTINCT {c})"),
        ]
    )
    # the expectations leg: metric values once in a CTE, rule rows with
    # bounds, passed computed on the UNROUNDED value (as the engine does),
    # value rounded to 6 dp for the cross-engine hash
    column_stats_sql = f"""
      WITH m AS (
        SELECT COUNT(*)::DOUBLE AS rows_v,
               AVG(CASE WHEN l_quantity IS NULL THEN 1.0 ELSE 0.0 END) AS nullfrac_v,
               AVG(l_quantity) AS mean_v,
               MIN(l_discount)::DOUBLE AS dmin_v,
               MAX(l_discount)::DOUBLE AS dmax_v,
               COUNT(DISTINCT l_orderkey)::DOUBLE / COUNT(*) AS ratio_v,
               AVG(CASE WHEN COALESCE(l_extendedprice > 0 AND l_quantity > 0,
                                      FALSE) THEN 1.0 ELSE 0.0 END) AS comp_v,
               MAX(l_quantity)::DOUBLE AS qmax_v,
               epoch(TIMESTAMP '2026-01-01 00:00:00') - epoch(MAX(l_shipdate)) AS fresh_v
        FROM lineitem
      ),
      e(name, metric, value, lo, hi) AS (
        SELECT 'rows_ok', 'row_count', rows_v, 1.0, 1e12 FROM m
        UNION ALL SELECT 'qty_null_free', 'null_fraction', nullfrac_v,
                         CAST(NULL AS DOUBLE), 0.001 FROM m
        UNION ALL SELECT 'qty_mean', 'mean', mean_v, 20.0, 30.0 FROM m
        UNION ALL SELECT 'disc_min', 'min', dmin_v, 0.0,
                         CAST(NULL AS DOUBLE) FROM m
        UNION ALL SELECT 'disc_max', 'max', dmax_v,
                         CAST(NULL AS DOUBLE), 0.2 FROM m
        UNION ALL SELECT 'orderkey_ratio', 'distinct_ratio', ratio_v,
                         0.05, 0.6 FROM m
        UNION ALL SELECT 'positive_price', 'compliance', comp_v, 1.0,
                         CAST(NULL AS DOUBLE) FROM m
        UNION ALL SELECT 'qty_max_strict', 'max', qmax_v,
                         CAST(NULL AS DOUBLE), 10.0 FROM m
        UNION ALL SELECT 'shipdate_fresh', 'freshness', fresh_v, 0.0,
                         2e9 FROM m
      )
      SELECT 'stats' AS method, name, metric, value,
             CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
             CAST(NULL AS BOOLEAN) AS passed
      FROM ({stats_leg_sql})
      UNION ALL
      SELECT 'expect' AS method, name, metric, ROUND(value, 6) AS value,
             lo, hi,
             (value IS NOT NULL AND NOT isnan(value)
              AND (lo IS NULL OR value >= lo)
              AND (hi IS NULL OR value <= hi)) AS passed
      FROM e
    """

    w = (_DRIFT_HI - _DRIFT_LO) / _DRIFT_BINS
    drift_sql = f"""
      WITH bins AS (SELECT UNNEST(range(0, {_DRIFT_BINS + 2})) AS bin_id),
      b AS (SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - {_DRIFT_LO}) / {w}) AS INT) + 1, 0), {_DRIFT_BINS + 1}) AS bin_id,
                   COUNT(*) AS c
            FROM orders WHERE year(o_orderdate) <= 1997 AND o_totalprice IS NOT NULL GROUP BY 1),
      q AS (SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - {_DRIFT_LO}) / {w}) AS INT) + 1, 0), {_DRIFT_BINS + 1}) AS bin_id,
                   COUNT(*) AS c
            FROM orders WHERE year(o_orderdate) > 1997 AND o_totalprice IS NOT NULL GROUP BY 1),
      f AS (SELECT bins.bin_id,
                   COALESCE(b.c, 0)::DOUBLE / (SELECT SUM(c) FROM b) AS fp,
                   COALESCE(q.c, 0)::DOUBLE / (SELECT SUM(c) FROM q) AS fq
            FROM bins LEFT JOIN b ON bins.bin_id = b.bin_id LEFT JOIN q ON bins.bin_id = q.bin_id),
      cdf AS (SELECT bin_id, SUM(fp) OVER (ORDER BY bin_id) AS cp,
                     SUM(fq) OVER (ORDER BY bin_id) AS cq FROM f),
      k AS (SELECT MAX(ABS(cp - cq)) AS ks FROM cdf),
      p AS (SELECT SUM((GREATEST(fq, 1e-6) - GREATEST(fp, 1e-6)) * LN(GREATEST(fq, 1e-6) / GREATEST(fp, 1e-6))) AS psi FROM f),
      j AS (SELECT SUM(
              CASE WHEN fp > 0 THEN 0.5 * fp * LN(fp / ((fp + fq) / 2)) ELSE 0 END
            + CASE WHEN fq > 0 THEN 0.5 * fq * LN(fq / ((fp + fq) / 2)) ELSE 0 END) AS js FROM f),
      wd AS (SELECT SUM(ABS(cp - cq) * CASE WHEN bin_id = 0 OR bin_id = {_DRIFT_BINS} THEN {w} / 2
                                            WHEN bin_id < {_DRIFT_BINS} THEN {w}
                                            ELSE 0 END) AS w1 FROM cdf)
      SELECT 'o_totalprice' AS "column", ROUND((SELECT ks FROM k), 6) AS ks_binned, ROUND((SELECT psi FROM p), 4) AS psi,
             ROUND((SELECT js FROM j), 6) AS js, ROUND((SELECT w1 FROM wd), 3) AS w1
    """

    drift_exact_ks = """
      WITH u AS (
        SELECT o_totalprice AS v, 1 AS a, 0 AS b FROM orders
        WHERE year(o_orderdate) <= 1997 AND o_totalprice IS NOT NULL
        UNION ALL
        SELECT o_totalprice, 0, 1 FROM orders
        WHERE year(o_orderdate) > 1997 AND o_totalprice IS NOT NULL),
      g AS (SELECT v, SUM(a) AS a, SUM(b) AS b FROM u GROUP BY v),
      t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM g),
      cdf AS (SELECT SUM(a) OVER (ORDER BY v) AS ca,
                     SUM(b) OVER (ORDER BY v) AS cb FROM g)
      SELECT 'o_totalprice' AS "column",
             ROUND(MAX(ABS(ca::DOUBLE / t.na - cb::DOUBLE / t.nb)), 6) AS ks_exact
      FROM cdf, t
    """

    drift_cat = """
      WITH c AS (
        SELECT o_orderpriority AS cat,
               SUM(CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END)::DOUBLE AS a_cnt,
               SUM(CASE WHEN year(o_orderdate) > 1997 THEN 1 ELSE 0 END)::DOUBLE AS b_cnt
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        GROUP BY 1),
      t AS (SELECT SUM(a_cnt) AS A, SUM(b_cnt) AS B, COUNT(*)::DOUBLE AS K FROM c)
      SELECT 'o_orderpriority' AS cat_column,
             ROUND(SUM(((b_cnt + 0.5) / (t.B + t.K * 0.5) - (a_cnt + 0.5) / (t.A + t.K * 0.5))
                   * LN(((b_cnt + 0.5) / (t.B + t.K * 0.5)) / ((a_cnt + 0.5) / (t.A + t.K * 0.5)))), 6) AS psi_cat,
             ROUND(SUM(
               POWER(a_cnt - (a_cnt + b_cnt) * t.A / (t.A + t.B), 2) / ((a_cnt + b_cnt) * t.A / (t.A + t.B))
               + POWER(b_cnt - (a_cnt + b_cnt) * t.B / (t.A + t.B), 2) / ((a_cnt + b_cnt) * t.B / (t.A + t.B))), 4) AS chi2_cat,
             CAST(COUNT(*) AS INT) AS n_categories
      FROM c, t GROUP BY t.A, t.B, t.K
    """

    # per-partition leg: the SAME baseline-fraction/CDF fold as drift_sql,
    # but the current side grouped by o_orderpriority — one cdf window per
    # partition, mirroring drift_report_partitioned's per-partition cumsum
    drift_part_sql = f"""
      WITH bins AS (SELECT UNNEST(range(0, {_DRIFT_BINS + 2})) AS bin_id),
      b AS (SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - {_DRIFT_LO}) / {w}) AS INT) + 1, 0), {_DRIFT_BINS + 1}) AS bin_id,
                   COUNT(*) AS c
            FROM orders WHERE year(o_orderdate) <= 1997 AND o_totalprice IS NOT NULL GROUP BY 1),
      bt AS (SELECT SUM(c) AS t FROM b),
      q AS (SELECT o_orderpriority AS scope,
                   LEAST(GREATEST(CAST(FLOOR((o_totalprice - {_DRIFT_LO}) / {w}) AS INT) + 1, 0), {_DRIFT_BINS + 1}) AS bin_id,
                   COUNT(*) AS c
            FROM orders WHERE year(o_orderdate) > 1997 AND o_totalprice IS NOT NULL GROUP BY 1, 2),
      qt AS (SELECT scope, SUM(c) AS t FROM q GROUP BY 1),
      f AS (SELECT qt.scope, bins.bin_id,
                   COALESCE(b.c, 0)::DOUBLE / bt.t AS fp,
                   COALESCE(q.c, 0)::DOUBLE / qt.t AS fq
            FROM qt CROSS JOIN bins CROSS JOIN bt
            LEFT JOIN b ON bins.bin_id = b.bin_id
            LEFT JOIN q ON q.scope = qt.scope AND q.bin_id = bins.bin_id),
      cdf AS (SELECT scope, bin_id, fp, fq,
                     SUM(fp) OVER (PARTITION BY scope ORDER BY bin_id) AS cp,
                     SUM(fq) OVER (PARTITION BY scope ORDER BY bin_id) AS cq
              FROM f)
      SELECT scope, 'o_totalprice' AS "column",
             ROUND(MAX(ABS(cp - cq)), 6) AS ks_binned,
             ROUND(SUM((GREATEST(fq, 1e-6) - GREATEST(fp, 1e-6))
                       * LN(GREATEST(fq, 1e-6) / GREATEST(fp, 1e-6))), 4) AS psi,
             ROUND(SUM(
               CASE WHEN fp > 0 THEN 0.5 * fp * LN(fp / ((fp + fq) / 2)) ELSE 0 END
             + CASE WHEN fq > 0 THEN 0.5 * fq * LN(fq / ((fp + fq) / 2)) ELSE 0 END), 6) AS js,
             ROUND(SUM(ABS(cp - cq) * CASE WHEN bin_id = 0 OR bin_id = {_DRIFT_BINS} THEN {w} / 2
                                           WHEN bin_id < {_DRIFT_BINS} THEN {w}
                                           ELSE 0 END), 3) AS w1,
             CAST(NULL AS DOUBLE) AS ks_exact,
             CAST(NULL AS VARCHAR) AS cat_column,
             CAST(NULL AS DOUBLE) AS psi_cat,
             CAST(NULL AS DOUBLE) AS chi2_cat,
             CAST(NULL AS INTEGER) AS n_categories
      FROM cdf GROUP BY scope
    """

    drift_report = f"""
      SELECT 'dataset' AS scope,
             b."column", b.ks_binned, b.psi, b.js, b.w1, e.ks_exact,
             c.cat_column, c.psi_cat, c.chi2_cat, c.n_categories
      FROM ({drift_sql}) b
      JOIN ({drift_exact_ks}) e USING ("column")
      CROSS JOIN ({drift_cat}) c
      UNION ALL
      SELECT * FROM ({drift_part_sql}) p
    """

    ngram_pairs_cte = r"""
      s AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS ws
        FROM documents WHERE doc_id < 120),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM s a, s b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.ws, b.ws))::DOUBLE
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.9)
    """
    dedup_clusters = f"""
      WITH RECURSIVE
      {ngram_pairs_cte},
      e AS (SELECT id_a AS src, id_b AS dst FROM p
            UNION SELECT id_b, id_a FROM p),
      n AS (SELECT DISTINCT src AS node FROM e),
      reach(node, r) AS (
        SELECT node, node FROM n
        UNION
        SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.node),
      comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
      SELECT d.doc_id, comp.comp,
             (comp.comp IS NULL OR d.doc_id = comp.comp) AS is_keeper
      FROM (SELECT doc_id FROM documents WHERE doc_id < 120) d
      LEFT JOIN comp ON d.doc_id = comp.node
    """

    sessionization = """
      WITH o AS (SELECT user_id, event_id, ts,
                        CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
                 WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      g AS (SELECT user_id, event_id, ts, es,
              CASE WHEN es - lag(es) OVER w IS NULL
                        OR es - lag(es) OVER w > 3600
                   THEN 1 ELSE 0 END AS is_new
            FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT user_id, ts, es,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
            FROM g)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             MAX(es) - MIN(es) AS duration_sec
      FROM s GROUP BY user_id, session_id
    """

    from ndap_data_validator_spark.operators.sample import (
        sample_gate_sql,
        stratified_sample_sql,
    )

    sampling = f"""
      WITH {_dsir_oracle_ctes()}
      SELECT 'uniform' AS method, o_orderkey AS row_key,
             o_totalprice AS value, TRUE AS keep
      FROM orders WHERE {sample_gate_sql('o_orderkey', 0.1, seed=7)}
      UNION ALL
      SELECT 'stratified', o_orderkey, o_totalprice, TRUE
      FROM orders
      WHERE {stratified_sample_sql('o_orderstatus', _STRATA_RATES, 'o_orderkey', seed=11)}
      UNION ALL
      SELECT 'dsir', doc_id, priority, priority >= thr.t
      FROM dsir_pri, dsir_thr AS thr
    """

    fingerprint_sql = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"

    dedup_exact = f"""
      SELECT {fingerprint_sql} AS fingerprint,
             MIN(doc_id) AS keeper_id,
             CAST(COUNT(*) AS BIGINT) AS dup_count
      FROM documents GROUP BY 1
    """

    ngram_jaccard = r"""
      WITH s AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS ws
        FROM documents WHERE doc_id < 120)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(len(list_intersect(a.ws, b.ws))::DOUBLE
                   / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 4) AS jaccard
      FROM s a, s b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.ws, b.ws))::DOUBLE
            / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.9
    """

    sw = "['the','a','an','of','and','or','to','in','is','are','was','for','on','with','as','at','by','it','this','that']"
    _bpe_pat_tq = T.BPE_ISH_TOKEN_RE.replace("'", "''")
    langs = {
        "en": ["the", "and", "of", "is", "with", "that"],
        "de": ["der", "die", "das", "und", "ist", "mit"],
        "fr": ["le", "la", "les", "et", "est", "avec"],
        "es": ["el", "la", "los", "es", "con", "que"],
    }
    hits = []
    for lang, ws_ in langs.items():
        lst = "[" + ",".join(f"'{w}'" for w in ws_) + "]"
        hits.append(
            f"len(list_filter(ltoks, x -> list_contains({lst}, x))) AS {lang}"
        )
    # lang_guess folded into the text_quality projection (r05 consolidation
    # — same per-doc scan, frees the 50-entry slot bpe_train occupies)
    text_quality = rf"""
      WITH t AS (SELECT doc_id, text,
            CASE WHEN trim(text) IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        FROM documents),
      t2 AS (SELECT *, list_transform(toks, x -> lower(x)) AS ltoks FROM t),
      s AS (SELECT *, {', '.join(hits)} FROM t2)
      SELECT doc_id,
        CAST(len(toks) AS INT) AS n_tokens_ws,
        CASE WHEN text IS NULL THEN NULL
             ELSE CAST(len(regexp_extract_all(text, '{_bpe_pat_tq}')) AS INT)
             END AS n_tokens_bpe,
        ROUND(CASE WHEN length(text) > 0
              THEN length(regexp_replace(text, '[^\p{{L}}]', '', 'g'))::DOUBLE / length(text) END, 4) AS alpha_ratio,
        ROUND(CASE WHEN len(toks) > 0
              THEN len(list_filter(ltoks, x -> list_contains({sw}, x)))::DOUBLE / len(toks) END, 4) AS stopword_ratio,
        ROUND(CASE WHEN len(toks) - 2 <= 0 THEN NULL
              ELSE 1.0 - len(list_distinct(list_transform(
                     generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' '))))::DOUBLE
                   / (len(toks) - 2) END, 4) AS repetition_ratio,
        {fingerprint_sql} AS fingerprint,
        CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
             WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
             WHEN fr > 0 AND fr >= es THEN 'fr'
             WHEN es > 0 THEN 'es'
             ELSE 'und' END AS lang_guess
      FROM s
    """

    ann_lsh = f"""
      SELECT vec_id, CAST({_planes_sql()} AS BIGINT) AS bucket FROM embeddings
    """

    knn_topk = """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      s AS (SELECT q.query_id, e.vec_id,
              ROUND(list_dot_product(q.qv, e.v)
                / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 4) AS cos
            FROM q, e),
      r AS (SELECT query_id, vec_id, cos,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
            FROM s)
      SELECT query_id, vec_id, cos, rank, cos >= 0.25 AS meets_threshold
      FROM r WHERE rank <= 5
    """

    topk_orders = """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """

    year_err = (
        "year_str IS NOT NULL AND (TRY_CAST(year_str AS DOUBLE) IS NULL "
        "OR isnan(TRY_CAST(year_str AS DOUBLE)) "
        "OR fmod(TRY_CAST(year_str AS DOUBLE), 1) != 0)"
    )
    dtype_coercion_report = f"""
      WITH d AS ({DERIVED_SQL})
      SELECT 'year_str' AS "column",
             CAST(SUM(CASE WHEN {year_err} THEN 1 ELSE 0 END) AS BIGINT) AS conversion_errors FROM d
      UNION ALL
      SELECT 'int_m', CAST(SUM(CASE WHEN {int_err} THEN 1 ELSE 0 END) AS BIGINT) FROM d
      UNION ALL
      SELECT 'float_m', CAST(SUM(CASE WHEN {float_err} THEN 1 ELSE 0 END) AS BIGINT) FROM d
    """

    scalar_coercion = f"""
      WITH d AS ({BOOL_TS_SQL}),
      v AS (SELECT bool_m,
              CASE WHEN lower(trim(bool_m)) IN ('true','t','yes','y','1') THEN TRUE
                   WHEN lower(trim(bool_m)) IN ('false','f','no','n','0') THEN FALSE
                   ELSE NULL END AS b
            FROM d)
      SELECT 'bool_m' AS "column",
        CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        CAST(SUM(CASE WHEN b = FALSE THEN 1 ELSE 0 END) AS BIGINT) AS n_false,
        CAST(SUM(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
        CAST(NULL AS BIGINT) AS n_parsed,
        CAST(SUM(CASE WHEN bool_m IS NOT NULL AND b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS conversion_errors,
        CAST(NULL AS VARCHAR) AS min_ts,
        CAST(NULL AS VARCHAR) AS max_ts
      FROM v
    """

    # The engine's pinned grammar (functions/coercion.py _TS_FORMATS) as
    # try_strptime fallbacks — same accepted forms, same first-match wins.
    _ts_parse = (
        "COALESCE("
        "try_strptime(ts_str, '%Y-%m-%dT%H:%M:%S'), "
        "try_strptime(ts_str, '%Y-%m-%d %H:%M:%S'), "
        "try_strptime(ts_str, '%Y-%m-%d'), "
        "try_strptime(ts_str, '%Y/%m/%d'), "
        "try_strptime(ts_str, '%d-%m-%Y'))"
    )
    scalar_coercion += f"""
      UNION ALL
      SELECT 'ts_str' AS "column",
        CAST(NULL AS BIGINT) AS n_true,
        CAST(NULL AS BIGINT) AS n_false,
        CAST(NULL AS BIGINT) AS nulls,
        CAST(SUM(CASE WHEN t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
        CAST(SUM(CASE WHEN ts_str IS NOT NULL AND t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS conversion_errors,
        strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS min_ts,
        strftime(MAX(t), '%Y-%m-%d %H:%M:%S') AS max_ts
      FROM (SELECT ts_str, {_ts_parse} AS t FROM ({BOOL_TS_SQL}) d2) v
    """

    hll_distinct = """
      SELECT 'user_id' AS "column",
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
             TRUE AS within_2pct
      FROM events
      UNION ALL
      SELECT 'event_type', CAST(COUNT(DISTINCT event_type) AS BIGINT), TRUE
      FROM events
    """

    return {
        "null_census": null_census,
        "coercion_report": coercion_report,
        "scalar_coercion": scalar_coercion,
        "time_format_census": time_format_census,
        "validation_report": validation_report,
        "partition_summary": partition_summary,
        "latest_event_per_user": latest_event,
        "join_lineage": join_lineage,
        "union_tokens": union_tokens,
        "uniqueness_violations": uniqueness,
        "ri_orphans": ri_orphans,
        "column_stats": column_stats_sql,
        "drift_report": drift_report,
        "dedup_exact": dedup_exact,
        "ngram_jaccard": ngram_jaccard,
        "text_quality": text_quality,
        "bpe_train": _bpe_train_oracle_sql(),
        "hll_distinct": hll_distinct,
        "ann_lsh_buckets": ann_lsh,
        "knn_topk": knn_topk,
        "minhash_candidates": _minhash_oracle_sql(),
        "simhash_fingerprints": _simhash_oracle_sql(),
        "dedup_clusters": dedup_clusters,
        "sessionization": sessionization,
        "sampling": sampling,
        "curation_funnel": _curation_funnel_oracle_sql(),
        "lm_cross_entropy": _lm_cross_entropy_oracle_sql(),
        "quality_classifier": _quality_classifier_oracle_sql(),
        "semantic_dedup": _semantic_dedup_oracle_sql(),
        "corpus_mixture": _corpus_mixture_oracle_sql(),
        "bpe_encode": _bpe_encode_oracle_sql(),
        "packing": _packing_oracle_sql(),
        "render_transcripts": _render_transcripts_oracle_sql(),
        "pack_nosplit": _pack_nosplit_oracle_sql(),
        "decontamination": _decontamination_oracle_sql(),
        "repeated_ngrams": _repeated_ngrams_oracle_sql(),
        "tfidf_top_terms": r"""
          WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
          toks AS (SELECT doc_id,
                     unnest(regexp_split_to_array(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                       ' ')) AS term
                   FROM docs),
          p AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks WHERE term <> '' GROUP BY doc_id, term),
          d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM p GROUP BY term HAVING COUNT(*) >= 2),
          n AS (SELECT COUNT(*) AS n_docs FROM docs),
          tot AS (SELECT SUM(tf) AS tot_tf FROM p),
          dlen AS (SELECT doc_id, SUM(tf) AS dl FROM p GROUP BY doc_id),
          s AS (SELECT p.doc_id, p.term, p.tf, d.df,
                  ROUND(p.tf * (ln((1.0 + n.n_docs) / (1.0 + d.df)) + 1.0), 6)
                    AS tfidf,
                  ROUND(
                    ln(1.0 + (n.n_docs - d.df + 0.5) / (d.df + 0.5))
                    * ((p.tf * 2.2)
                       / (p.tf + 1.2 * (0.25 + 0.75 * dlen.dl
                                        / (tot.tot_tf / n.n_docs)))), 6)
                    AS bm25
                FROM p JOIN d USING (term) JOIN dlen USING (doc_id)
                     CROSS JOIN n CROSS JOIN tot),
          r AS (SELECT *, CAST(ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT)
                  AS "rank"
                FROM s)
          SELECT doc_id, term, tf, df, tfidf, bm25, "rank"
          FROM r WHERE "rank" <= 3
        """,
        "text_gates": _text_gates_oracle_sql(),
        "key_skew": f"""
          WITH d AS ({DERIVED_SQL}),
          c AS (SELECT conv_id AS key, COUNT(*) AS n_rows
                FROM d GROUP BY conv_id),
          s AS (SELECT COUNT(*) AS n_keys, SUM(n_rows) AS total,
                       MAX(n_rows) AS mx FROM c),
          t AS (SELECT key, n_rows,
                       CAST(ROW_NUMBER() OVER (
                         ORDER BY n_rows DESC, key ASC) AS INT) AS rank
                FROM c ORDER BY n_rows DESC, key ASC LIMIT 10)
          SELECT t.key, t.n_rows, t.rank,
                 ROUND(CAST(t.n_rows AS DOUBLE) / s.total, 6) AS share,
                 s.n_keys,
                 ROUND(CAST(s.mx AS DOUBLE) * s.n_keys / s.total, 6)
                   AS skew_factor
          FROM t, s
        """,
        "ann_ivf": _ann_ivf_oracle_sql(),
        "embedding_neardup": f"""
          WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            UNION ALL
            SELECT CAST(100000 AS BIGINT), embedding::DOUBLE[]
            FROM embeddings WHERE vec_id = 0),
          sig AS (SELECT vec_id, v, CAST({_planes_sql('v')} AS BIGINT) AS b FROM e),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS cos
                FROM sig a JOIN sig b ON a.b = b.b AND a.vec_id < b.vec_id)
          SELECT id_a, id_b, ROUND(cos, 4) AS cos FROM p WHERE cos >= 0.95
        """,
        "frame_sample_plan": """
          SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_id,
                 CAST(unnest(generate_series(0,
                        GREATEST(CAST((doc_id % 5 + 1) * 1000 AS INT) - 1, 0),
                        400)) AS BIGINT) AS frame_ts_ms
          FROM documents WHERE doc_id < 50
        """,
        # replays the deterministic stub kernel (multimodal._fake_features):
        # payload = UTF-8 bytes of sha2(text,256) hex → h = sha256(payload)
        # (DuckDB sha256(varchar) hashes the same bytes); feature_i =
        # int(h[4(i%8)..+4]) / 2^32 — exact dyadic doubles in both engines,
        # rendered DECIMAL(12,6) → identical CSV strings
        "media_features": """
          SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                 CAST(64 AS INT) AS n_bytes,
                 array_to_string(
                   list_transform(range(0, 16), i ->
                     CAST(CAST(CAST('0x' || substr(h, 1 + 8*(i % 8), 8) AS BIGINT)
                               / 4294967296.0 AS DECIMAL(12,6)) AS VARCHAR)),
                   ',') AS features_csv
          FROM (SELECT doc_id, sha256(sha256(text)) AS h
                FROM documents WHERE doc_id < 100)
        """,
        "exact_percentiles": """
          SELECT 'l_extendedprice' AS "column",
                 ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                 ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
                 ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
          FROM lineitem
        """,
        "csv_events_rollup": """
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                 MIN(event_id) AS min_event_id,
                 MAX(event_id) AS max_event_id,
                 CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
          FROM events GROUP BY event_type
        """,
        "topk_orders": topk_orders,
        "sequence_checks": sequence_checks,
        "dtype_coercion_report": dtype_coercion_report,
        "three_way_join": """
          SELECT n.n_name AS n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
          FROM orders o
          LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name
        """,
        "except_diff": """
          WITH h AS (SELECT quantile_cont(event_id, 0.5) AS m FROM events),
          a AS (SELECT event_type, user_id % 5 AS bucket FROM events, h WHERE event_id <= h.m),
          b AS (SELECT event_type, user_id % 5 AS bucket FROM events, h WHERE event_id > h.m),
          o AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
          p AS (
            SELECT o_orderkey,
                   o_totalprice + CASE WHEN o_orderkey % 13 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice,
                   CASE WHEN o_orderkey % 17 = 0 THEN lower(o_orderpriority) ELSE o_orderpriority END AS o_orderpriority
            FROM o WHERE o_orderkey % 29 != 3
            UNION ALL
            SELECT -o_orderkey, o_totalprice, o_orderpriority FROM o WHERE o_orderkey % 41 = 0
          ),
          j AS (
            SELECT o.o_orderkey AS lid, p.o_orderkey AS rid,
                   (o.o_totalprice IS NOT DISTINCT FROM p.o_totalprice) AS tp_eq,
                   (o.o_orderpriority IS NOT DISTINCT FROM p.o_orderpriority) AS pr_eq
            FROM o FULL OUTER JOIN p ON o.o_orderkey = p.o_orderkey
          ),
          rec AS (
            SELECT
              count(*) FILTER (lid IS NOT NULL) AS rows_left,
              count(*) FILTER (rid IS NOT NULL) AS rows_right,
              count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL) AS keys_matched,
              count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND tp_eq AND pr_eq) AS rows_equal,
              count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT (tp_eq AND pr_eq)) AS rows_differing,
              count(*) FILTER (lid IS NULL) AS missing_left,
              count(*) FILTER (rid IS NULL) AS missing_right,
              count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT tp_eq) AS mm_totalprice,
              count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT pr_eq) AS mm_priority
            FROM j
          )
          SELECT 'except' AS method, event_type AS dim,
                 CAST(bucket AS VARCHAR) AS detail, CAST(COUNT(*) AS BIGINT) AS value
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
          GROUP BY event_type, bucket
          UNION ALL
          SELECT 'reconcile', u.metric, u.col, u.v FROM rec, LATERAL (VALUES
            ('rows_left', CAST(NULL AS VARCHAR), rows_left),
            ('rows_right', NULL, rows_right),
            ('keys_matched', NULL, keys_matched),
            ('rows_equal', NULL, rows_equal),
            ('rows_differing', NULL, rows_differing),
            ('missing_left', NULL, missing_left),
            ('missing_right', NULL, missing_right),
            ('column_mismatch', 'o_totalprice', mm_totalprice),
            ('column_mismatch', 'o_orderpriority', mm_priority)
          ) AS u(metric, col, v)
        """,
    }
