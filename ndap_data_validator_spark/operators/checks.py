"""Generic row-level CHECK constraints (cross-column boolean rules).

The per-column rules (null / numeric / range / regex / domain,
`rules.model.ColumnAssignment`) cannot express relationships BETWEEN
columns — the standard-SQL `CHECK (expr)` class: "a tool turn must name a
tool", "value is non-negative unless the row is a reversal", "end >=
start". `rules.model.CheckRule` carries one such expression; this module
compiles a list of them into Catalyst in ONE projection.

Semantics are standard SQL CHECK: a row VIOLATES a rule only when the
expression evaluates to FALSE — NULL (unknown) passes, exactly as a SQL
CHECK constraint admits NULL. That makes the rules composable with the
engine's null rules (notNull decides nullability; CHECK decides
relationships) and lets DuckDB replay them verbatim with `IS FALSE` /
`IS NOT FALSE`.

Scale shape (100 TB): both entry points are scan-level — every rule
expression evaluates inside the same whole-stage-codegen projection.
``check_violations`` adds NO shuffle (filter + explode on the scan);
``check_summary`` is ONE map-side-combined aggregate. The reference has no
counterpart (its rules are per-column; utils/validation.py) — this is
north-star engine scope, symmetric with SequenceRule.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.rules.model import CheckRule

__all__ = ["check_violation_pred", "check_violations", "check_summary"]


def check_violation_pred(rule: CheckRule) -> Column:
    """The single source of CHECK-violation truth: TRUE exactly when the
    rule's expression is definitively FALSE (NULL = unknown = passes).
    Shared by the violations report, the summary, and row routing
    (``ValidationEngine.flag_rows``) so the three can never disagree on
    which rows violate."""
    return F.expr(rule.expression).eqNullSafe(F.lit(False))


def check_violations(
    df: DataFrame,
    rules: Sequence[CheckRule],
    key_cols: Iterable[str] = (),
    carry_cols: Iterable[str] = (),
) -> DataFrame:
    """One row per (row, violated rule): ``(*carry_cols, *key_cols, check)``
    where ``check`` is the rule name. Mirrors
    ``convchecks.sequence_checks``'s output contract so both violation
    families union into one report; unlike sequence checks this needs NO
    window — the whole evaluation is a single scan-level projection
    (array_compact + explode), zero shuffles."""
    if not rules:
        raise ValueError("no check rules given")
    hits = F.array_compact(
        F.array(
            *[F.when(check_violation_pred(r), F.lit(r.name)) for r in rules]
        )
    )
    keys = list(key_cols)
    carry = list(carry_cols)
    return (
        df.select(*carry, *keys, hits.alias("__checks"))
        .where(F.size("__checks") > 0)
        .select(*carry, *keys, F.explode("__checks").alias("check"))
    )


def check_summary(df: DataFrame, rules: Sequence[CheckRule]) -> DataFrame:
    """Per-rule rollup in ONE aggregate over one scan:
    ``(check, n_violations, n_passed, passed)`` — the pass/fail verdict row
    the report assembler consumes. ``n_passed`` counts rows where the
    expression is TRUE or NULL (SQL CHECK admits unknown)."""
    if not rules:
        raise ValueError("no check rules given")
    aggs = []
    for r in rules:
        v = check_violation_pred(r).cast("long")
        aggs.append(F.sum(v).alias(f"__v_{r.name}"))
        aggs.append(F.count(F.lit(1)).alias(f"__n_{r.name}"))
    agg = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("check"),
                F.col(f"__v_{r.name}").alias("n_violations"),
                (F.col(f"__n_{r.name}") - F.col(f"__v_{r.name}")).alias(
                    "n_passed"
                ),
                (F.col(f"__v_{r.name}") == 0).alias("passed"),
            )
            for r in rules
        ]
    )
    return agg.select(F.explode(structs).alias("s")).select(
        "s.check", "s.n_violations", "s.n_passed", "s.passed"
    )
