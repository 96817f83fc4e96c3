"""CheckRule / operators.checks: SQL CHECK semantics + plan shape +
pipeline wiring.

Pinned contract: a row violates only when the expression is definitively
FALSE — NULL passes (standard SQL CHECK admits unknown), so nullability
remains the notNull rule's job and the DuckDB oracle replays the family
with `IS FALSE`.
"""

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.checks import (
    check_summary,
    check_violations,
)
from ndap_data_validator_spark.rules.model import CheckRule


@pytest.fixture(scope="module")
def frame(spark):
    # (id, start, end, tool_role, tool): two cross-column rules' worth of
    # planted violations + NULL rows that must PASS
    rows = [
        (1, 10, 20, "tool", "search"),   # clean
        (2, 30, 25, "tool", "browse"),   # end < start → range violation
        (3, 5, 9, "tool", None),         # tool role without tool → tool rule
        (4, None, 7, "user", None),      # NULL start → range rule passes
        (5, 1, 1, "user", None),         # clean (end == start allowed)
    ]
    return spark.createDataFrame(
        rows, "id int, start int, end int, role string, tool string"
    )


RULES = [
    CheckRule("range_order", "end >= start"),
    CheckRule("tool_named", "role <> 'tool' OR tool IS NOT NULL"),
]


def test_violations_rows_and_null_passes(frame):
    out = check_violations(frame, RULES, key_cols=("id",)).collect()
    got = sorted((r["id"], r["check"]) for r in out)
    assert got == [(2, "range_order"), (3, "tool_named")]


def test_summary_counts(frame):
    out = {r["check"]: r for r in check_summary(frame, RULES).collect()}
    assert out["range_order"]["n_violations"] == 1
    assert out["range_order"]["n_passed"] == 4  # incl. the NULL-start row
    assert not out["range_order"]["passed"]
    assert out["tool_named"]["n_violations"] == 1
    assert not out["tool_named"]["passed"]


def test_summary_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    (row,) = check_summary(df, [CheckRule("pos", "x > 0")]).collect()
    assert row["passed"] and row["n_violations"] == 0 and row["n_passed"] == 2


def test_multi_violation_row_emits_multiple_rows(spark):
    df = spark.createDataFrame([(0, -1)], "a int, b int")
    out = check_violations(
        df, [CheckRule("a_pos", "a > 0"), CheckRule("b_pos", "b > 0")],
        key_cols=("a",),
    ).collect()
    assert sorted(r["check"] for r in out) == ["a_pos", "b_pos"]


def test_violations_plan_has_no_shuffle(frame):
    plan = (
        check_violations(frame, RULES, key_cols=("id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure scan-level projection


def test_empty_rules_raise(frame):
    with pytest.raises(ValueError):
        check_violations(frame, [])
    with pytest.raises(ValueError):
        check_summary(frame, [])
    with pytest.raises(ValueError):
        CheckRule("", "x > 0")


def test_pipeline_writes_check_violations(spark, tmp_path):
    from ndap_data_validator_spark.plans.pipeline import run_validation
    from ndap_data_validator_spark.rules.model import ColumnAssignment

    df = spark.createDataFrame(
        [("p1", 1, 3, 5), ("p1", 2, 5, 9), ("p2", 3, 2, 1)],
        "part string, id int, lo int, hi int",
    )
    run_validation(
        spark,
        df,
        [ColumnAssignment("id", "Others")],
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        report_path=str(tmp_path / "rep"),
        order_by=["id"],
        check_rules=[CheckRule("hi_ge_lo", "hi >= lo")],
    )
    got = spark.read.parquet(str(tmp_path / "rep" / "check_violations"))
    rows = got.collect()
    assert [(r["id"], r["check"], r["partition_id"]) for r in rows] == [
        (3, "hi_ge_lo", "p2")
    ]


def test_check_rule_paired_with_compliance_gates_verdict(spark, tmp_path):
    """CHECK rules report rows; the documented pairing with
    MetricRule(compliance, '(expr) IS NOT FALSE', min_bound=1.0) gives
    the same expression full verdict semantics: the violating partition
    fails, is withheld from publish, and the clean one publishes. The
    IS NOT FALSE wrapper preserves CHECK's NULL-passes reading."""
    import pandas as pd

    from ndap_data_validator_spark.operators.expectations import MetricRule
    from ndap_data_validator_spark.plans.pipeline import run_validation
    from ndap_data_validator_spark.rules.model import CheckRule, ColumnAssignment

    expr = "TRY_CAST(m AS INT) < 100"
    pdf = pd.DataFrame(
        {
            "part": ["good"] * 3 + ["bad"] * 3,
            "t": ["2021"] * 6,
            "v": ["1", "2", "3", "4", "5", "6"],  # clean Measures column
            # NULL-producing 'oops' must PASS the check (unknown), so only
            # 'bad' (with 150) violates
            "m": ["1", "2", "oops", "3", "150", "4"],
        }
    )
    out = run_validation(
        spark,
        spark.createDataFrame(pdf),
        [
            ColumnAssignment("part", "Others"),
            ColumnAssignment("t", "Time"),
            ColumnAssignment("v", "Measures", "integer"),
            # m stays un-assigned so the 'oops' row is not a column-rule
            # failure - the check/compliance pair is the only gate
        ],
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        report_path=str(tmp_path / "rep"),
        publish_path=str(tmp_path / "pub"),
        order_by=["m"],
        check_rules=[CheckRule("m_cap", expr)],
        metric_rules=[
            MetricRule(
                "m_cap_holds",
                "compliance",
                expression=f"({expr}) IS NOT FALSE",
                min_bound=1.0,
            )
        ],
    )
    assert not out.passed_all
    pub = spark.read.parquet(str(tmp_path / "pub"))
    assert {r[0] for r in pub.select("partition_id").distinct().collect()} == {
        "good"
    }
    # and the row-level report still names the one violating row
    chk = spark.read.parquet(str(tmp_path / "rep") + "/check_violations")
    assert [(r["m"], r["check"]) for r in chk.collect()] == [("150", "m_cap")]
