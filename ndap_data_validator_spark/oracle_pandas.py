"""Executable pandas oracle for golden-report tests.

An independent, from-scratch implementation of the publicly-observable
semantics documented in SURVEY.md §2.2-2.4/§2.12 (derived from reading
``/root/reference/utils/validation.py`` behavior — NOT copied code). Tests
assert the Spark engine's per-column report / summary / violation rows match
this oracle field-for-field, including the exact reason strings.

Kept deliberately simple and row-oriented — clarity over speed; it only ever
runs on pytest-sized frames.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd

from ndap_data_validator_spark.rules.model import (
    ColumnAssignment,
    REASON_INCONSISTENT_TIME,
    REASON_INVALID_TIME,
    REASON_NO_NULLS,
    REASON_NON_NUMERIC,
    RuleCatalog,
    load_default_catalog,
)
from ndap_data_validator_spark.functions.timeformat import TIME_PATTERNS

_COMPILED = [(label, re.compile(pat.replace("(?i)", ""), re.IGNORECASE if "(?i)" in pat else 0)) for label, pat in TIME_PATTERNS]


def _is_null(v: Any) -> bool:
    return v is None or (isinstance(v, float) and v != v) or v is pd.NA or v is pd.NaT


def _time_label(v: Any) -> str | None:
    s = str(v).strip()
    if s == "":
        return None
    for label, pat in _COMPILED:
        if pat.match(s):
            return label
    return None


def _coerce_cell(v: Any, role: str, measure_type: str | None) -> tuple[Any, bool]:
    """Return (coerced_value, is_conversion_error) for one cell."""
    if _is_null(v):
        return None, False
    if role == "Measures":
        try:
            f = float(str(v).strip())
        except (TypeError, ValueError):
            return None, True
        if (measure_type or "float") == "integer":
            if f != f or f % 1 != 0:
                return None, True
            return int(f), False
        if f != f:  # NaN parsed from 'nan'
            return None, True
        return f, False
    # Location / Time / Others: string form, never a coercion error here
    return str(v), False


def oracle_validate(
    df: pd.DataFrame,
    assignments: list[ColumnAssignment],
    catalog: RuleCatalog | None = None,
    schema_name: str | None = None,
) -> dict[str, Any]:
    """Compute {per_column, failed_columns, missing_roles, passed, rows,
    violations} for one partition of data."""
    catalog = catalog or load_default_catalog()
    rules = catalog.schema_rules(schema_name)
    by_col = {a.column: a for a in assignments}

    per_column: dict[str, dict[str, Any]] = {}
    failed_columns: list[str] = []
    violations: list[tuple[str, str, str | None]] = []  # (column, reason, value)

    for col in df.columns:
        a = by_col.get(col, ColumnAssignment(column=col, role="Others"))
        rule = rules.get(a.role)
        not_null = rule.not_null if rule else False
        numeric_only = rule.numeric_only if rule else False

        coerced: list[Any] = []
        conv_errs = 0
        labels: list[str] = []
        invalid_time = 0
        for v in df[col].tolist():
            cv, err = _coerce_cell(v, a.role, a.measure_type)
            coerced.append(cv)
            if err:
                conv_errs += 1
                violations.append((col, REASON_NON_NUMERIC, str(v)))
            if a.role == "Time" and not _is_null(v):
                lbl = _time_label(v)
                if lbl is None:
                    invalid_time += 1
                    violations.append((col, REASON_INVALID_TIME, str(v)))
                else:
                    labels.append(lbl)

        if a.role == "Time":
            # majority-format extras fold into conversion_errors
            extra = 0
            if labels:
                counts: dict[str, int] = {}
                for l in labels:
                    counts[l] = counts.get(l, 0) + 1
                extra = len(labels) - max(counts.values())
            conv_errs = invalid_time + extra

        nulls = sum(1 for cv in coerced if cv is None)
        if not_null:
            for orig, cv in zip(df[col].tolist(), coerced):
                if cv is None:
                    violations.append(
                        (col, REASON_NO_NULLS, None if _is_null(orig) else str(orig))
                    )

        reasons: list[str] = []
        if numeric_only and conv_errs > 0:
            reasons.append(REASON_NON_NUMERIC)
        if not_null and nulls > 0:
            reasons.append(REASON_NO_NULLS)
        if a.role == "Time":
            if invalid_time > 0:
                reasons.append(REASON_INVALID_TIME)
            elif len(set(labels)) > 1:
                reasons.append(REASON_INCONSISTENT_TIME)

        passed = len(reasons) == 0
        if not passed:
            failed_columns.append(col)
        per_column[col] = {
            "role": a.role,
            "nulls": nulls,
            "conversion_errors": conv_errs,
            "passed": passed,
            "reasons": reasons,
        }

    assigned_roles = {a.role for a in assignments}
    missing_roles = [
        r for r in catalog.mandatory_roles(schema_name) if r not in assigned_roles
    ]
    return {
        "per_column": per_column,
        "failed_columns": failed_columns,
        "missing_roles": missing_roles,
        "passed": not failed_columns and not missing_roles,
        "rows": len(df),
        "violations": sorted(violations, key=lambda t: (t[0], t[1], t[2] or "")),
    }
