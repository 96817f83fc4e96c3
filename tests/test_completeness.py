"""partition_completeness: expected-manifest census — hand fixtures for
all four statuses, key casting, validation, and plan shape (no
Python-RDD literal frames, no nested-loop joins)."""

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.completeness import (
    partition_completeness,
)


@pytest.fixture(scope="module")
def days(spark):
    # d1 ×3 rows, d2 ×1 row, d4 ×2 rows (not in manifest); d3 never lands
    rows = [("d1",)] * 3 + [("d2",)] + [("d4",)] * 2
    return spark.createDataFrame(rows, "day string")


def test_all_four_statuses(days):
    out = {
        r["key"]: (r["n_rows"], r["expected"], r["status"])
        for r in partition_completeness(
            days, "day", ["d1", "d2", "d3"], min_rows=2
        ).collect()
    }
    assert out == {
        "d1": (3, True, "ok"),
        "d2": (1, True, "undersized"),
        "d3": (0, True, "missing"),
        "d4": (2, False, "unexpected"),
    }


def test_default_min_rows_one(days):
    out = {
        r["key"]: r["status"]
        for r in partition_completeness(days, "day", ["d1", "d2"]).collect()
    }
    assert out["d2"] == "ok"  # 1 row clears min_rows=1


def test_non_string_keys_cast(spark):
    df = spark.createDataFrame([(1,), (1,), (3,)], "shard int")
    out = {
        r["key"]: r["status"]
        for r in partition_completeness(df, "shard", [1, 2]).collect()
    }
    assert out == {"1": "ok", "2": "missing", "3": "unexpected"}


def test_validation(days):
    with pytest.raises(ValueError, match="empty"):
        partition_completeness(days, "day", [])
    with pytest.raises(ValueError, match="duplicates"):
        partition_completeness(days, "day", ["d1", "d1"])
    with pytest.raises(ValueError, match="min_rows"):
        partition_completeness(days, "day", ["d1"], min_rows=0)


def test_null_keys_report_as_unexpected(spark):
    # NULL partition keys are real arrivals the manifest can't name; they
    # must surface, not vanish in the join
    df = spark.createDataFrame([("d1",), (None,)], "day string")
    out = {
        r["key"]: r["status"]
        for r in partition_completeness(df, "day", ["d1"]).collect()
    }
    assert out["d1"] == "ok"
    assert out[None] == "unexpected"


def test_plan_shape(days):
    plan = (
        partition_completeness(days, "day", ["d1", "d2", "d3"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the manifest enters as a JVM range+explode (never a Python-RDD scan)
    assert "Range (0, 1" in plan


def test_dataframe_manifest(spark, days):
    manifest = spark.createDataFrame(
        [("d1",), ("d2",), ("d3",), ("d3",), (None,)], "day string"
    )
    out = {
        r["key"]: r["status"]
        for r in partition_completeness(
            days, "day", manifest.select("day"), min_rows=2
        ).collect()
    }
    # identical verdicts to the list manifest; dups and NULLs in the
    # manifest table are cleaned, not fatal
    assert out == {
        "d1": "ok",
        "d2": "undersized",
        "d3": "missing",
        "d4": "unexpected",
    }


def test_dataframe_manifest_must_be_one_column(spark, days):
    with pytest.raises(ValueError, match="exactly one column"):
        partition_completeness(days, "day", days.select("day", "day"))
