"""Row-granular publish routing (``row_policy="quarantine"``): clean rows
publish even from failing partitions; each failing row lands in the
quarantine sink with a ``row_reasons`` array naming every fired rule.
Dataset-granular verdicts (missing mandatory roles, error-severity
expectations) still withhold whole partitions from BOTH sinks."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.plans.pipeline import run_validation
from ndap_data_validator_spark.rules.model import CheckRule, ColumnAssignment


def _rows_or_zero(spark, path) -> int:
    # an all-withheld or empty-side write leaves an empty dir (or none):
    # the missing path and the schema-less read both mean "zero rows"
    try:
        return spark.read.parquet(str(path)).count()
    except Exception:
        return 0


def _frame(spark):
    pdf = pd.DataFrame(
        {
            "part": ["good"] * 5 + ["bad"] * 5,
            "loc": [f"x{i}" for i in range(5)] + ["y0", None, "y2", "y3", "y4"],
            "t": ["2021"] * 10,
            "m": [str(i) for i in range(5)] + ["5", "6", "oops", "8", "9"],
        }
    )
    return spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))


_ASSIGNS = [
    ColumnAssignment("part", "Others"),
    ColumnAssignment("loc", "Location"),
    ColumnAssignment("t", "Time"),
    ColumnAssignment("m", "Measures", "integer"),
]


def test_flag_rows_matches_violations_report(spark):
    """flag_rows' per-row verdicts agree with the violations report: the
    same rows flag, with one reason per violation entry."""
    sdf = _frame(spark).withColumn("rid", F.monotonically_increasing_id())
    eng = ValidationEngine()
    flagged = eng.flag_rows(sdf, _ASSIGNS).collect()
    bad = {r["rid"]: r["row_reasons"] for r in flagged if not r["row_passed"]}
    res = eng.validate(
        sdf, _ASSIGNS, partition_by="part", order_by=["rid"]
    )
    viol = res.violations.collect()
    viol_by_rid: dict[int, int] = {}
    for v in viol:
        viol_by_rid[v["rid"]] = viol_by_rid.get(v["rid"], 0) + 1
    assert set(bad) == set(viol_by_rid)
    for rid, reasons in bad.items():
        assert len(reasons) == viol_by_rid[rid]
    # every passing row has an EMPTY (not NULL) reasons array
    for r in flagged:
        if r["row_passed"]:
            assert r["row_reasons"] == []
    res.release()


def test_quarantine_routes_rows(spark, tmp_path):
    out = run_validation(
        spark,
        _frame(spark),
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
    )
    # verdicts are policy-independent: the run still fails
    assert not out.passed_all
    pub = spark.read.parquet(str(tmp_path / "pub"))
    quar = spark.read.parquet(str(tmp_path / "pub_quarantine"))
    # clean rows from BOTH partitions publish (bad's 3 clean rows included)
    assert pub.count() == 8
    assert {r[0] for r in pub.select("partition_id").distinct().collect()} == {
        "good",
        "bad",
    }
    # the two failing rows are quarantined with their reasons
    rows = {(r["loc"], r["m"]): r["row_reasons"] for r in quar.collect()}
    assert set(rows) == {(None, "6"), ("y2", "oops")}
    assert rows[(None, "6")] == ["loc: No Nulls allowed"]
    assert len(rows[("y2", "oops")]) == 1  # non-numeric Measures
    # published rows are originals: no routing columns, uncoerced dtypes
    assert "row_reasons" not in pub.columns
    assert "row_passed" not in pub.columns
    assert dict(pub.dtypes)["m"] == "string"
    # conservation: publish + quarantine == source
    assert pub.count() + quar.count() == 10


def test_quarantine_includes_check_rules(spark, tmp_path):
    run_validation(
        spark,
        _frame(spark),
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
        check_rules=[CheckRule("m_small", "TRY_CAST(m AS INT) < 8")],
        order_by=["loc"],
    )
    quar = spark.read.parquet(str(tmp_path / "pub_quarantine"))
    reasons = {
        tuple(r["row_reasons"])
        for r in quar.collect()
    }
    # rows m=8, m=9 violate ONLY the CHECK rule; m='oops' violates the
    # column rule and passes the CHECK (NULL cast -> unknown -> passes)
    assert ("check: m_small",) in reasons
    assert quar.count() == 4


def test_quarantine_custom_path_and_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="row_policy"):
        run_validation(
            spark,
            _frame(spark),
            _ASSIGNS,
            partition_by="part",
            checkpoint_path=str(tmp_path / "ckpt"),
            row_policy="rows",
        )
    with pytest.raises(ValueError, match="quarantine_path"):
        run_validation(
            spark,
            _frame(spark),
            _ASSIGNS,
            partition_by="part",
            checkpoint_path=str(tmp_path / "ckpt"),
            quarantine_path=str(tmp_path / "q"),
        )
    run_validation(
        spark,
        _frame(spark),
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt2"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
        quarantine_path=str(tmp_path / "dead_letters"),
    )
    assert spark.read.parquet(str(tmp_path / "dead_letters")).count() == 2


def test_quarantine_missing_role_withholds_partition(spark, tmp_path):
    """A missing mandatory role is a CONFIG failure: the rule set never
    compiled, so row verdicts are vacuous — the whole batch is withheld
    from both sinks even under the quarantine policy."""
    assigns = [
        ColumnAssignment("part", "Others"),
        ColumnAssignment("loc", "Location"),
        # no Time, no Measures -> mandatory roles missing
    ]
    run_validation(
        spark,
        _frame(spark),
        assigns,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
    )
    def _rows(path):
        # an all-withheld write leaves an empty dir (or none): both the
        # missing path and the schema-less read mean "zero rows landed"
        try:
            return spark.read.parquet(path).count()
        except Exception:
            return 0

    assert _rows(str(tmp_path / "pub")) == 0
    assert _rows(str(tmp_path / "pub_quarantine")) == 0


def test_default_policy_unchanged(spark, tmp_path):
    """row_policy='partition' (default) keeps the reference contract:
    the failing partition is withheld wholesale, no quarantine dir."""
    run_validation(
        spark,
        _frame(spark),
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
    )
    import os

    pub = spark.read.parquet(str(tmp_path / "pub"))
    assert pub.count() == 5
    assert not os.path.exists(str(tmp_path / "pub_quarantine"))


def test_quarantine_aggregate_only_failure_withholds(spark, tmp_path):
    """Time-format consistency is an aggregate verdict — the minority-
    format rows are only identifiable relative to the majority, so no
    row-local predicate can route them. The partition is withheld
    wholesale under the quarantine policy, exactly like the default."""
    pdf = pd.DataFrame(
        {
            "part": ["mixed"] * 4 + ["clean"] * 3,
            "loc": [f"x{i}" for i in range(7)],
            "t": ["2021", "2021", "Jan-2021", "2021", "2022", "2022", "2022"],
            "m": [str(i) for i in range(7)],
        }
    )
    out = run_validation(
        spark,
        spark.createDataFrame(pdf),
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
    )
    assert not out.passed_all
    pub = spark.read.parquet(str(tmp_path / "pub"))
    # every row of 'mixed' individually matches a VALID format, so none
    # can be quarantined — the whole partition is withheld instead
    assert {r[0] for r in pub.select("partition_id").distinct().collect()} == {
        "clean"
    }
    assert pub.count() == 3
    # nothing quarantined: the rows aren't individually bad
    assert _rows_or_zero(spark, tmp_path / "pub_quarantine") == 0


def test_quarantine_warn_severity_does_not_route(spark, tmp_path):
    """warn's contract is 'report, never block the publish gate' — a warn
    column's violating rows publish under BOTH policies."""
    assigns = [
        ColumnAssignment("part", "Others"),
        ColumnAssignment("loc", "Location", severity="warn"),
        ColumnAssignment("t", "Time"),
        ColumnAssignment("m", "Measures", "integer"),
    ]
    pdf = pd.DataFrame(
        {
            "part": ["p"] * 4,
            "loc": ["a", None, "c", "d"],
            "t": ["2021"] * 4,
            "m": ["1", "2", "3", "4"],
        }
    )
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    out = run_validation(
        spark,
        sdf,
        assigns,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
        row_policy="quarantine",
    )
    assert out.passed_all  # warn never fails the verdict
    pub = spark.read.parquet(str(tmp_path / "pub"))
    assert pub.count() == 4  # conservation with the default policy
    assert _rows_or_zero(spark, tmp_path / "pub_quarantine") == 0


def test_quarantine_requires_publish_path(spark, tmp_path):
    with pytest.raises(ValueError, match="publish_path"):
        run_validation(
            spark,
            _frame(spark),
            _ASSIGNS,
            partition_by="part",
            checkpoint_path=str(tmp_path / "ckpt"),
            row_policy="quarantine",
        )


def test_flag_rows_rejects_reserved_columns(spark):
    sdf = _frame(spark).withColumn("row_passed", F.lit(True))
    with pytest.raises(ValueError, match="row_passed"):
        ValidationEngine().flag_rows(sdf, _ASSIGNS)


def test_quarantine_delta_watermark_advances_past_routed_rows(
    spark, tmp_path
):
    """Under the quarantine policy a routed (dead-lettered) failure must
    NOT freeze the delta watermark: the bad row already landed in the
    quarantine sink, so re-picking it forever would grow every later
    batch. Under the default policy the same batch freezes (withheld rows
    are genuinely re-pickable)."""
    from ndap_data_validator_spark.plans.checkpoint import CheckpointStore

    pdf = pd.DataFrame(
        {
            "part": ["p"] * 4,
            "loc": ["a", None, "c", "d"],  # one permanently-bad row
            "t": ["2021"] * 4,
            "m": ["1", "2", "3", "4"],
            "wm": ["2024-01-0%d" % (i + 1) for i in range(4)],
        }
    )
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))

    run_validation(
        spark,
        sdf,
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt_q"),
        publish_path=str(tmp_path / "pub_q"),
        row_policy="quarantine",
        load_mode="delta",
        watermark_col="wm",
    )
    assert (
        CheckpointStore(spark, str(tmp_path / "ckpt_q")).last_watermark("wm")
        == "2024-01-04"
    )

    run_validation(
        spark,
        sdf,
        _ASSIGNS,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt_d"),
        publish_path=str(tmp_path / "pub_d"),
        load_mode="delta",
        watermark_col="wm",
    )
    assert (
        CheckpointStore(spark, str(tmp_path / "ckpt_d")).last_watermark("wm")
        is None
    )
