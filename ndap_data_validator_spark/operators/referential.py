"""Referential-integrity check (north_rule: tool references vs a tool
catalog).

The reference handles orphans implicitly with COALESCE/'Not run' defaults in
its lineage joins (``/root/reference/utils/db.py:522-542``); the engine makes
RI a first-class violation query: a LEFT ANTI join of referencing rows
against the referenced key set. The referenced dimension is broadcast when
small (a tool catalog always is), so the check is shuffle-free on the fact
side — at 10^12 rows that's the difference between a map-only pass and a
full-table exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ri_violations(
    df: DataFrame,
    column: str,
    ref: DataFrame,
    ref_column: str,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Rows whose non-null ``column`` has no match in ``ref.ref_column``."""
    keys = ref.select(F.col(ref_column).alias(column)).distinct()
    if broadcast_ref:
        keys = F.broadcast(keys)
    return df.where(F.col(column).isNotNull()).join(keys, on=column, how="left_anti")


def ri_violation_counts(
    df: DataFrame,
    column: str,
    ref: DataFrame,
    ref_column: str,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Distinct dangling key values with occurrence counts — the compact
    report form: (value, violation_count)."""
    return (
        ri_violations(df, column, ref, ref_column, broadcast_ref)
        .groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("violation_count"))
    )
