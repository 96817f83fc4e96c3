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


def merge_hll_to_global(stats: DataFrame) -> DataFrame:
    """Roll per-partition sketches up to table-level distinct estimates —
    the 'merge, never rescan' path for incremental/global stats."""
    return stats.groupBy("column").agg(
        F.sum("rows").alias("rows"),
        F.sum("nulls").alias("nulls"),
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("distinct_estimate"),
    )
