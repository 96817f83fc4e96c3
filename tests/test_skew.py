"""key_skew_report: hand-computed fixtures + plan shape.

The operator is the diagnostic for the north-star brief's
skewed-conversations clause (feeds plans.pipeline.salt_repartition); these
tests pin the ranking contract (count desc, key asc), the share/skew
arithmetic, and that top-N plans as TakeOrderedAndProject rather than a
global sort.
"""

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.skew import key_skew_report


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'a' ×6, 'b' ×3, 'c' ×2, 'd' ×1 → total 12, 4 keys, mean 3, max 6
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1
    return spark.createDataFrame(rows, "k string")


def test_skew_report_values(skewed):
    out = key_skew_report(skewed, "k", top_n=3).collect()
    assert [(r["key"], r["n_rows"], r["rank"]) for r in out] == [
        ("a", 6, 1),
        ("b", 3, 2),
        ("c", 2, 3),
    ]
    assert out[0]["share"] == 0.5
    assert out[1]["share"] == 0.25
    assert all(r["n_keys"] == 4 for r in out)
    # skew_factor = max/mean = 6 / (12/4) = 2.0 on every row
    assert all(r["skew_factor"] == 2.0 for r in out)


def test_skew_tie_break_is_key_asc(spark):
    df = spark.createDataFrame(
        [("z",), ("z",), ("m",), ("m",), ("a",)], "k string"
    )
    out = key_skew_report(df, "k", top_n=2).collect()
    # m and z tie at 2 — ascending key wins rank 1
    assert [(r["key"], r["rank"]) for r in out] == [("m", 1), ("z", 2)]


def test_skew_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "a int, b string"
    )
    out = key_skew_report(df, ["a", "b"], top_n=1).collect()
    assert out[0]["key"] == "1|x"
    assert out[0]["n_rows"] == 2


def test_skew_uniform_factor_is_one(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    out = key_skew_report(df, "k", top_n=3).collect()
    assert all(r["skew_factor"] == 1.0 for r in out)
    assert all(r["share"] == round(1 / 3, 6) for r in out)


def test_skew_plan_is_take_ordered_not_global_sort(skewed):
    plan = (
        key_skew_report(skewed, "k", top_n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the checkpointed counts frame must not be re-sorted globally: the
    # only Sort allowed is inside the <=top_n-row window stage
    assert "Exchange rangepartitioning" not in plan
