"""Tolerance + severity verdict knobs (ColumnAssignment.tolerance /
.severity — Deequ/Great-Expectations-standard controls the strict
reference verdict lacks; engine extension, defaults reproduce the
reference bit-for-bit).

Covered here:
  * tolerance moves ONLY the pass/fail verdict — violation counts and
    violation rows are untouched;
  * the trip point is ``count > tolerance × rows`` (boundary exact);
  * tolerance=0.0 ≡ tolerance=None ≡ the strict reference verdict;
  * Time rules: invalid-fraction branch and the minority-format reading of
    the consistency rule;
  * severity='warn' reports reasons but pins passed=True, so the partition
    summary and the publish gate never fail on a warn rule;
  * assignment_digest identity: default knobs leave the digest unchanged
    (pre-existing checkpoints stay valid); a set tolerance changes it.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.rules.model import (
    ColumnAssignment,
    REASON_INCONSISTENT_TIME,
    REASON_INVALID_TIME,
    REASON_NO_NULLS,
    REASON_NON_NUMERIC,
    assignment_digest,
    load_default_catalog,
)


def _pdf(n: int = 200, bad_pop: int = 2, null_state: int = 1) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rows.append(
            {
                "state": f"State {i % 7}",
                "fiscal_year": "2021",
                "population": str(1000 + i),
            }
        )
    for i in range(bad_pop):  # non-numeric integer Measures values
        rows[3 + i]["population"] = "junk"
    for i in range(null_state):  # nulls in the notNull Location column
        rows[10 + i]["state"] = None
    return pd.DataFrame(rows)


def _sdf(spark, pdf):
    return spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))


def _assign(pop_tol=None, state_tol=None, pop_sev="error"):
    return [
        ColumnAssignment("state", "Location", tolerance=state_tol),
        ColumnAssignment("fiscal_year", "Time"),
        ColumnAssignment(
            "population", "Measures", "integer", tolerance=pop_tol, severity=pop_sev
        ),
    ]


def _col_report(result):
    return {r["column"]: r.asDict() for r in result.per_column_report.collect()}


def test_tolerance_moves_verdict_not_counts(spark):
    pdf = _pdf(n=200, bad_pop=2)  # 2/200 = 1% bad
    eng = ValidationEngine()

    strict = _col_report(eng.validate(_sdf(spark, pdf), _assign()))
    tol = _col_report(eng.validate(_sdf(spark, pdf), _assign(pop_tol=0.05)))

    assert strict["population"]["passed"] is False
    assert REASON_NON_NUMERIC in strict["population"]["reasons"]
    # 1% ≤ 5% → passes, reason gone; counts identical either way
    assert tol["population"]["passed"] is True
    assert tol["population"]["reasons"] == []
    assert (
        tol["population"]["conversion_errors"]
        == strict["population"]["conversion_errors"]
        == 2
    )


def test_tolerance_boundary_is_strict_greater_than(spark):
    pdf = _pdf(n=200, bad_pop=2)
    eng = ValidationEngine()
    # exactly at the boundary: 2 == 0.01 × 200 → NOT tripped
    at = _col_report(eng.validate(_sdf(spark, pdf), _assign(pop_tol=0.01)))
    assert at["population"]["passed"] is True
    # just under: 2 > 0.005 × 200 = 1 → tripped
    under = _col_report(eng.validate(_sdf(spark, pdf), _assign(pop_tol=0.005)))
    assert under["population"]["passed"] is False


def test_tolerance_zero_equals_strict_default(spark):
    pdf = _pdf(n=50, bad_pop=1, null_state=1)
    eng = ValidationEngine()
    strict = eng.validate(_sdf(spark, pdf), _assign())
    zero = eng.validate(
        _sdf(spark, pdf), _assign(pop_tol=0.0, state_tol=0.0)
    )
    assert sorted(map(str, strict.per_column_report.collect())) == sorted(
        map(str, zero.per_column_report.collect())
    )
    assert strict.summary.collect() == zero.summary.collect()


def test_tolerance_applies_to_not_null_rule(spark):
    pdf = _pdf(n=200, bad_pop=0, null_state=3)  # 1.5% nulls
    eng = ValidationEngine()
    strict = _col_report(eng.validate(_sdf(spark, pdf), _assign()))
    assert strict["state"]["passed"] is False
    assert REASON_NO_NULLS in strict["state"]["reasons"]
    tol = _col_report(eng.validate(_sdf(spark, pdf), _assign(state_tol=0.02)))
    assert tol["state"]["passed"] is True
    assert tol["state"]["nulls"] == 3  # count untouched


def test_time_tolerance_invalid_and_minority_branches(spark):
    rows = [{"fiscal_year": "2021"} for _ in range(100)]
    rows[0]["fiscal_year"] = "Q1 bogus"  # 1 invalid
    rows[1]["fiscal_year"] = "Mar-2021"  # 1 minority valid format
    pdf = pd.DataFrame(rows)
    eng = ValidationEngine()

    strict = _col_report(
        eng.validate(_sdf(spark, pdf), [ColumnAssignment("fiscal_year", "Time")])
    )
    # reference branch: invalid>0 wins, consistency branch never fires
    assert strict["fiscal_year"]["passed"] is False
    assert strict["fiscal_year"]["reasons"] == [REASON_INVALID_TIME]

    tol = _col_report(
        eng.validate(
            _sdf(spark, pdf),
            [ColumnAssignment("fiscal_year", "Time", tolerance=0.05)],
        )
    )
    # 1% invalid ≤ 5% AND 1% minority ≤ 5% → fully clean verdict
    assert tol["fiscal_year"]["passed"] is True
    assert tol["fiscal_year"]["reasons"] == []
    # conversion_errors math (invalid + minority) never moves
    assert (
        tol["fiscal_year"]["conversion_errors"]
        == strict["fiscal_year"]["conversion_errors"]
        == 2
    )

    # minority formats over the budget trip the CONSISTENCY reason (the
    # invalid branch stayed under its own budget)
    many_minor = pd.DataFrame(
        [{"fiscal_year": "2021"} for _ in range(90)]
        + [{"fiscal_year": "Mar-2021"} for _ in range(10)]
    )
    incons = _col_report(
        eng.validate(
            _sdf(spark, many_minor),
            [ColumnAssignment("fiscal_year", "Time", tolerance=0.05)],
        )
    )
    assert incons["fiscal_year"]["passed"] is False
    assert incons["fiscal_year"]["reasons"] == [REASON_INCONSISTENT_TIME]


def test_warn_severity_reports_but_never_fails(spark):
    pdf = _pdf(n=50, bad_pop=2)
    eng = ValidationEngine()
    res = eng.validate(_sdf(spark, pdf), _assign(pop_sev="warn"))
    rep = _col_report(res)
    # the reason is still visible — that's the point of warn
    assert rep["population"]["reasons"] == [REASON_NON_NUMERIC]
    assert rep["population"]["passed"] is True
    # partition verdict unaffected by the warn rule
    summ = res.summary.collect()[0]
    assert "population" not in summ["failed_columns"]
    # violation ROWS still emitted for triage
    v = res.violations.where("column = 'population'").count()
    assert v == 2


def test_warn_plus_error_mix_fails_only_on_error_rules(spark):
    pdf = _pdf(n=50, bad_pop=2, null_state=1)
    eng = ValidationEngine()
    res = eng.validate(_sdf(spark, pdf), _assign(pop_sev="warn"))
    summ = res.summary.collect()[0]
    # state's notNull is still an error rule → partition fails on it alone
    assert summ["failed_columns"] == ["state"]
    assert summ["passed"] is False


def test_digest_identity_for_default_knobs():
    cat = load_default_catalog()
    base = [ColumnAssignment("a", "Measures", "integer")]
    explicit = [
        ColumnAssignment("a", "Measures", "integer", tolerance=None, severity="error")
    ]
    assert assignment_digest(base, cat) == assignment_digest(explicit, cat)
    # a set knob must change the digest (re-runs re-validate)
    tol = [ColumnAssignment("a", "Measures", "integer", tolerance=0.01)]
    warn = [ColumnAssignment("a", "Measures", "integer", severity="warn")]
    assert assignment_digest(tol, cat) != assignment_digest(base, cat)
    assert assignment_digest(warn, cat) != assignment_digest(base, cat)


def test_knob_validation():
    with pytest.raises(ValueError):
        ColumnAssignment("a", tolerance=1.5)
    with pytest.raises(ValueError):
        ColumnAssignment("a", tolerance=-0.1)
    with pytest.raises(ValueError):
        ColumnAssignment("a", severity="fatal")
