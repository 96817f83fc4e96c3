"""Golden-report tests: Spark engine vs the independent pandas oracle
(SURVEY.md §5.2) on the `ndap_roles_csv`-style fixture (FIXTURES.md §4),
field-for-field including exact reason strings (§2.12)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.oracle_pandas import oracle_validate
from ndap_data_validator_spark.rules.model import (
    ColumnAssignment,
    REASON_INCONSISTENT_TIME,
    REASON_INVALID_TIME,
    REASON_NO_NULLS,
    REASON_NON_NUMERIC,
)
from ndap_data_validator_spark.operators.validate import ValidationEngine


def fixture_pdf() -> pd.DataFrame:
    rows = []
    for i in range(30):
        rows.append(
            {
                "state": f"State {i % 7}",
                "fiscal_year": "2021",
                "population": str(1000 + i),
                "gdp_growth": f"{2.5 + i / 10:.1f}",
                "district_code": f"D{i:03d}",
            }
        )
    # nulls in a notNull Location column → "No Nulls allowed"
    rows[3]["state"] = None
    rows[11]["state"] = None
    # invalid + second-format time values
    rows[5]["fiscal_year"] = "Q1 2021"  # invalid
    rows[6]["fiscal_year"] = ""  # empty → invalid
    rows[7]["fiscal_year"] = "Mar-2021"  # valid but different format
    rows[8]["fiscal_year"] = "Jan - Mar, 2021"
    # integer measure errors: fractional + non-numeric
    rows[9]["population"] = "12.5"
    rows[10]["population"] = "N/A"
    # float measure: non-numeric + nulls (nulls must NOT fail Measures)
    rows[12]["gdp_growth"] = "junk"
    rows[13]["gdp_growth"] = None
    rows[14]["gdp_growth"] = None
    rows[15]["district_code"] = None  # Others: no rules
    return pd.DataFrame(rows)


ASSIGNMENTS = [
    ColumnAssignment("state", "Location"),
    ColumnAssignment("fiscal_year", "Time"),
    ColumnAssignment("population", "Measures", "integer"),
    ColumnAssignment("gdp_growth", "Measures", "float"),
    ColumnAssignment("district_code", "Others"),
]


@pytest.fixture(scope="module")
def engine():
    return ValidationEngine()


def run_both(spark, pdf, assignments):
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    result = ValidationEngine().validate(sdf, assignments, order_by=None)
    oracle = oracle_validate(pdf, assignments)
    return result, oracle


def test_per_column_report_matches_oracle(spark):
    pdf = fixture_pdf()
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert set(got) == set(oracle["per_column"])
    for col, exp in oracle["per_column"].items():
        g = got[col]
        assert g["role"] == exp["role"], col
        assert g["nulls"] == exp["nulls"], col
        assert g["conversion_errors"] == exp["conversion_errors"], col
        assert g["passed"] == exp["passed"], col
        assert list(g["reasons"]) == exp["reasons"], col


def test_summary_matches_oracle(spark):
    pdf = fixture_pdf()
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    s = result.summary.collect()
    assert len(s) == 1
    row = s[0]
    assert row["rows"] == oracle["rows"]
    assert list(row["failed_columns"]) == oracle["failed_columns"]
    assert list(row["missing_roles"]) == oracle["missing_roles"]
    assert row["passed"] == oracle["passed"]


def test_exact_reason_strings(spark):
    pdf = fixture_pdf()
    result, _ = run_both(spark, pdf, ASSIGNMENTS)
    got = {r["column"]: list(r["reasons"]) for r in result.per_column_report.collect()}
    assert got["state"] == [REASON_NO_NULLS]
    assert got["fiscal_year"] == [REASON_INVALID_TIME]
    assert got["population"] == [REASON_NON_NUMERIC]
    assert got["gdp_growth"] == [REASON_NON_NUMERIC]  # nulls alone never fail Measures
    assert got["district_code"] == []
    # the invalid-format message carries its verbatim trailing space
    assert REASON_INVALID_TIME.endswith(" ")


def test_inconsistent_formats_without_invalid(spark):
    pdf = fixture_pdf()
    pdf["fiscal_year"] = "2021"
    pdf.loc[3, "fiscal_year"] = "Mar-2021"  # two valid formats, zero invalid
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert got["fiscal_year"]["reasons"] == [REASON_INCONSISTENT_TIME]
    assert not got["fiscal_year"]["passed"]
    # majority-format extras count into conversion_errors (validation.py:180-188)
    assert got["fiscal_year"]["conversion_errors"] == 1
    assert oracle["per_column"]["fiscal_year"]["conversion_errors"] == 1


def test_nulls_counted_on_coerced_frame(spark):
    # junk integer values surface as conversion_errors AND nulls (§2.12)
    pdf = fixture_pdf()
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert got["population"]["nulls"] == 2  # "12.5" and "N/A" nulled by coercion
    assert got["population"]["conversion_errors"] == 2
    assert oracle["per_column"]["population"]["nulls"] == 2


def test_missing_mandatory_roles(spark):
    pdf = fixture_pdf()
    no_time = [a for a in ASSIGNMENTS if a.role != "Time"] + [
        ColumnAssignment("fiscal_year", "Others")
    ]
    result, oracle = run_both(spark, pdf, no_time)
    row = result.summary.first()
    assert list(row["missing_roles"]) == ["Time"] == oracle["missing_roles"]
    assert not row["passed"]

    no_meas = [
        ColumnAssignment("state", "Location"),
        ColumnAssignment("fiscal_year", "Time"),
        ColumnAssignment("population", "Others"),
        ColumnAssignment("gdp_growth", "Others"),
        ColumnAssignment("district_code", "Others"),
    ]
    result2, oracle2 = run_both(spark, pdf, no_meas)
    assert list(result2.summary.first()["missing_roles"]) == ["Measures"] == oracle2["missing_roles"]


def test_clean_pass(spark):
    rows = [
        {
            "state": f"S{i}",
            "fiscal_year": "2021",
            "population": str(10 * i),
            "gdp_growth": "1.5",
            "district_code": f"D{i}",
        }
        for i in range(20)
    ]
    pdf = pd.DataFrame(rows)
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    row = result.summary.first()
    assert row["passed"] and oracle["passed"]
    assert row["failed_count"] == 0
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert all(g["passed"] for g in got.values())


def test_violation_rows_match_oracle(spark):
    pdf = fixture_pdf()
    result, oracle = run_both(spark, pdf, ASSIGNMENTS)
    got = [
        (r["column"], r["reason"], r["value"])
        for r in result.violations.collect()
    ]
    got_sorted = sorted(got, key=lambda t: (t[0], t[1], t[2] or ""))
    assert got_sorted == oracle["violations"]


def test_partitioned_report(spark):
    # two partitions ≙ two "files" (main.py:880-936): per-partition pass/fail
    pdf = fixture_pdf()
    pdf["part"] = ["p0" if i < 16 else "p1" for i in range(len(pdf))]
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    result = ValidationEngine().validate(
        sdf, ASSIGNMENTS + [ColumnAssignment("part", "Others")], partition_by="part"
    )
    summaries = {r["partition_id"]: r.asDict() for r in result.summary.collect()}
    assert set(summaries) == {"p0", "p1"}
    for pid in ("p0", "p1"):
        sub = pdf[pdf["part"] == pid].drop(columns=["part"]).reset_index(drop=True)
        oracle = oracle_validate(sub, ASSIGNMENTS)
        assert summaries[pid]["rows"] == oracle["rows"]
        assert list(summaries[pid]["failed_columns"]) == [
            c for c in oracle["failed_columns"]
        ]
        # passed_all fold (main.py:926-936)
    passed_all = all(s["passed"] for s in summaries.values())
    assert passed_all == all(
        oracle_validate(
            pdf[pdf["part"] == pid].drop(columns=["part"]), ASSIGNMENTS
        )["passed"]
        for pid in ("p0", "p1")
    )


def test_unassigned_column_defaults_to_others(spark):
    pdf = fixture_pdf()
    partial = [a for a in ASSIGNMENTS if a.column != "district_code"]
    result, _ = run_both(spark, pdf, partial)
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert got["district_code"]["role"] == "Others"
    assert got["district_code"]["passed"]


def test_range_and_regex_extensions(spark):
    pdf = pd.DataFrame(
        {
            "fiscal_year": ["2021"] * 5,
            "population": ["1", "2", "300", "4", "5"],
            "code": ["A1", "A2", "bad!", "A4", "A5"],
        }
    )
    assigns = [
        ColumnAssignment("fiscal_year", "Time"),
        ColumnAssignment("population", "Measures", "integer", min_value=0, max_value=100),
        ColumnAssignment("code", "Others", regex=r"^A\d$"),
    ]
    sdf = spark.createDataFrame(pdf)
    result = ValidationEngine().validate(sdf, assigns)
    got = {r["column"]: r.asDict() for r in result.per_column_report.collect()}
    assert not got["population"]["passed"]
    assert "Value out of allowed range" in got["population"]["reasons"]
    assert not got["code"]["passed"]
    assert "Value does not match required pattern" in got["code"]["reasons"]
    viol = {(r["column"], r["value"]) for r in result.violations.collect()}
    assert ("population", "300") in viol and ("code", "bad!") in viol


def test_violation_cap_per_rule(spark):
    """max_violations_per_rule keeps the FIRST K violation rows per
    (partition, column, reason) by the stable order key; aggregate counts
    in per_column_report are NOT capped."""
    from ndap_data_validator_spark.operators.validate import ValidationEngine
    from ndap_data_validator_spark.sources.datagen import transcripts

    t = transcripts(spark, 3_000, 30, seed=42)
    assigns = [
        ColumnAssignment("conv_id", "Location"),
        # bad injected roles ('sys?', '') violate this regex on many rows
        ColumnAssignment("role", "Others", regex=r"^(user|assistant|tool)$"),
        ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
    ]
    engine = ValidationEngine()
    full = engine.validate(
        t, assigns, partition_by=F.substring("conv_id", 6, 1),
        order_by=["conv_id", "turn_idx"],
    )
    capped = engine.validate(
        t, assigns, partition_by=F.substring("conv_id", 6, 1),
        order_by=["conv_id", "turn_idx"], max_violations_per_rule=3,
    )
    key = lambda r: (r["partition_id"], r["column"], r["reason"])
    from collections import defaultdict

    full_rows = defaultdict(list)
    for r in full.violations.collect():
        full_rows[key(r)].append(
            (r["conv_id"], r["turn_idx"], r["value"])
        )
    cap_rows = defaultdict(list)
    for r in capped.violations.collect():
        cap_rows[key(r)].append((r["conv_id"], r["turn_idx"], r["value"]))
    assert full_rows and any(len(v) > 3 for v in full_rows.values())
    for k, rows in cap_rows.items():
        assert len(rows) <= 3
        # the kept rows are exactly the first K of the full set, ordered by
        # the stable key (+ value tiebreak)
        def _k(t):
            # NULLS FIRST for every component, matching Spark asc ordering
            return (
                t[0] is not None, t[0] or "",
                t[1] is not None, t[1] if t[1] is not None else 0,
                t[2] is not None, t[2] or "",
            )

        want = sorted(full_rows[k], key=_k)[: len(rows)]
        assert sorted(rows, key=_k) == want
    # counts NOT capped: the aggregate report is identical either way
    a = sorted(map(repr, full.per_column_report.collect()))
    b = sorted(map(repr, capped.per_column_report.collect()))
    assert a == b


def test_violation_cap_requires_order_by(spark):
    from ndap_data_validator_spark.operators.validate import ValidationEngine
    from ndap_data_validator_spark.sources.datagen import transcripts

    t = transcripts(spark, 200, 5, seed=1)
    with pytest.raises(ValueError, match="order_by"):
        ValidationEngine().validate(
            t,
            [ColumnAssignment("conv_id", "Location")],
            max_violations_per_rule=5,
        ).violations.count()
