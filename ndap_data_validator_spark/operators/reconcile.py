"""Keyed snapshot reconciliation: cell-level diff of two versions of the
same table (datacompy/"data diff"-style), the validation step that closes
the migration loop — after a re-ingest, a backfill, an engine swap, or a
checkpoint restore, "does the new snapshot equal the old one, and if not,
WHERE?" Per-row rules and dataset expectations can both pass on a table
that silently dropped 0.1% of its keys or perturbed one column; this
operator is the direct check.

The reference has no counterpart (its validation compares a frame against
a RULE catalog, never against another frame — ``/root/reference/utils/
validation.py``), so this is engine scope, north-star: the brief's
"matching the reference's per-partition pass/fail and violation rows" is
itself a reconciliation problem, and a 10^12-turn pipeline re-runs it on
every resumed batch.

Scale shape (100 TB):
  * ONE full-outer equi-join on the key — sort-merge under AQE (which
    also skew-splits a hot key); each side shuffles exactly once and only
    the compared columns travel (column pruning reaches both scans).
  * every per-column verdict is a null-safe equality expression evaluated
    inside the join's projection — no second pass, no Python.
  * the summary is ONE map-side-combined aggregate over the joined frame;
    the report is O(#columns) rows.
  * row-level output (``reconcile_rows``) stays distributed; callers cap
    published samples with ``.where(status != 'equal').limit(k)`` — a
    LocalLimit that short-circuits, never a global sort.

Keys are assumed unique per side (the standard reconciliation
precondition — a primary key); duplicated keys multiply join rows exactly
as SQL does. Pre-check with ``operators.uniqueness.duplicate_keys`` when
the key is not yet trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reconcile_rows", "reconcile_summary"]

_STATUSES = ("equal", "differing", "missing_left", "missing_right")


def _resolve_cols(
    left: DataFrame, right: DataFrame, keys: list[str], compare_cols
) -> list[str]:
    if compare_cols is not None:
        cols = list(compare_cols)
    else:
        # default: every non-key column present in BOTH schemas, in the
        # left frame's column order (deterministic report order)
        rset = set(right.columns)
        cols = [c for c in left.columns if c not in keys and c in rset]
    if not cols:
        raise ValueError("no comparable columns (nothing to reconcile)")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate compare columns: {cols}")
    for c in cols:
        if c in keys:
            raise ValueError(f"compare column {c!r} is a key")
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"compare column {c!r} missing from a side")
    # the join projection aliases compared columns as l__X / r__X plus the
    # presence markers — a real column with one of those names would
    # silently collide with its own alias
    reserved = {f"l__{c}" for c in cols} | {f"r__{c}" for c in cols} | {
        "l__present",
        "r__present",
    }
    clash = reserved & set(keys) | reserved & set(cols)
    if clash:
        raise ValueError(
            f"column names collide with reconcile's internal aliases: "
            f"{sorted(clash)} — rename them first"
        )
    return cols


def reconcile_rows(
    left: DataFrame,
    right: DataFrame,
    keys: str | list[str],
    compare_cols: list[str] | None = None,
    float_tol: float = 0.0,
) -> DataFrame:
    """Row-level reconciliation verdicts.

    Returns one row per key present on EITHER side:
    ``(*keys, status, diff_cols)`` where ``status`` is

      * ``equal``          — key on both sides, every compared column
                             null-safe-equal (``<=>``: NULL == NULL)
      * ``differing``      — key on both sides, ≥1 compared column differs
      * ``missing_left``   — key only on the right (inserted/extra row)
      * ``missing_right``  — key only on the left (dropped row)

    and ``diff_cols`` is the array of differing column names (empty for
    ``equal``, NULL for the missing statuses — there is nothing to
    compare). Plan: one full-outer sort-merge join, verdicts as
    projection expressions.

    ``float_tol`` (absolute) relaxes the compare on float/double columns:
    two non-NULL values within the tolerance count as equal — a re-ingest
    through a different engine legitimately perturbs the last ulps, and a
    migration check that flags every 1e-15 is noise. 0.0 (default) keeps
    the compare exact; NULL-vs-NULL is always equal, NULL-vs-value never.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    cols = _resolve_cols(left, right, key_list, compare_cols)
    if float_tol < 0:
        raise ValueError("float_tol must be >= 0")
    float_cols = {
        f.name
        for f in left.schema.fields
        if f.dataType.typeName() in ("float", "double")
    }

    lp = left.select(
        *key_list,
        *[F.col(c).alias(f"l__{c}") for c in cols],
        F.lit(True).alias("l__present"),
    )
    rp = right.select(
        *key_list,
        *[F.col(c).alias(f"r__{c}") for c in cols],
        F.lit(True).alias("r__present"),
    )
    j = lp.join(rp, on=key_list, how="full_outer")

    # NULL-valued cells must not read as "missing side": presence markers
    # are constant TRUE per side, NULL only when the join found no row.
    on_left = F.col("l__present").isNotNull()
    on_right = F.col("r__present").isNotNull()
    def _cell_equal(c: str):
        l, r = F.col(f"l__{c}"), F.col(f"r__{c}")
        eq = l.eqNullSafe(r)
        if float_tol > 0 and c in float_cols:
            eq = eq | (
                l.isNotNull()
                & r.isNotNull()
                & (F.abs(l - r) <= F.lit(float(float_tol)))
            )
        return eq

    diff_arr = F.array_compact(
        F.array(*[F.when(~_cell_equal(c), F.lit(c)) for c in cols])
    )
    status = (
        F.when(~on_left, F.lit("missing_left"))
        .when(~on_right, F.lit("missing_right"))
        .when(F.size(diff_arr) == 0, F.lit("equal"))
        .otherwise(F.lit("differing"))
    )
    return j.select(
        *key_list,
        status.alias("status"),
        F.when(on_left & on_right, diff_arr).alias("diff_cols"),
    )


def reconcile_summary(
    left: DataFrame,
    right: DataFrame,
    keys: str | list[str],
    compare_cols: list[str] | None = None,
    float_tol: float = 0.0,
) -> DataFrame:
    """Long-form reconciliation report: ``(metric, column, value)``.

    Row-status metrics (``column`` NULL): ``rows_left``, ``rows_right``,
    ``keys_matched``, ``rows_equal``, ``rows_differing``,
    ``missing_left``, ``missing_right`` — then one
    ``column_mismatch`` row per compared column counting the keys where
    that column differs. ONE aggregate over the joined frame; output is
    ``7 + #columns`` rows.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    cols = _resolve_cols(left, right, key_list, compare_cols)
    rows = reconcile_rows(left, right, key_list, cols, float_tol=float_tol)

    s = F.col("status")
    aggs = [
        F.count_if(s != "missing_left").alias("rows_left"),
        F.count_if(s != "missing_right").alias("rows_right"),
        F.count_if(s.isin("equal", "differing")).alias("keys_matched"),
        F.count_if(s == "equal").alias("rows_equal"),
        F.count_if(s == "differing").alias("rows_differing"),
        F.count_if(s == "missing_left").alias("missing_left"),
        F.count_if(s == "missing_right").alias("missing_right"),
    ] + [
        F.count_if(F.array_contains(F.col("diff_cols"), c)).alias(
            f"col__{i}"
        )
        for i, c in enumerate(cols)
    ]
    agg = rows.agg(*aggs)

    structs = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.lit(None).cast("string").alias("column"),
                F.col(m).alias("value"),
            )
            for m in (
                "rows_left",
                "rows_right",
                "keys_matched",
                "rows_equal",
                "rows_differing",
                "missing_left",
                "missing_right",
            )
        ]
        + [
            F.struct(
                F.lit("column_mismatch").alias("metric"),
                F.lit(c).cast("string").alias("column"),
                F.col(f"col__{i}").alias("value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return agg.select(F.explode(structs).alias("e")).select(
        "e.metric", "e.column", "e.value"
    )
