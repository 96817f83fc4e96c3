"""reconcile_rows / reconcile_summary: hand-computed fixtures, NULL
semantics, default-column resolution, and an independent DuckDB replay of
the full summary (the same full-outer-join + null-safe-compare fold the
entry oracle uses)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.reconcile import (
    reconcile_rows,
    reconcile_summary,
)


@pytest.fixture(scope="module")
def sides(spark):
    # key 1: equal (incl. NULL == NULL on v)     key 4: only-left
    # key 2: v differs                           key 5: only-right
    # key 3: s differs AND v differs (NULL vs 3)
    left = spark.createDataFrame(
        [
            (1, None, "a"),
            (2, 10.0, "b"),
            (3, None, "c"),
            (4, 4.0, "d"),
        ],
        "id int, v double, s string",
    )
    right = spark.createDataFrame(
        [
            (1, None, "a"),
            (2, 11.0, "b"),
            (3, 3.0, "C"),
            (5, 5.0, "e"),
        ],
        "id int, v double, s string",
    )
    return left, right


def test_row_statuses(sides):
    left, right = sides
    out = {
        r["id"]: (r["status"], r["diff_cols"])
        for r in reconcile_rows(left, right, "id").collect()
    }
    assert out[1] == ("equal", [])
    assert out[2] == ("differing", ["v"])
    assert out[3] == ("differing", ["v", "s"])
    assert out[4] == ("missing_right", None)
    assert out[5] == ("missing_left", None)


def test_summary_values(sides):
    left, right = sides
    got = {
        (r["metric"], r["column"]): r["value"]
        for r in reconcile_summary(left, right, "id").collect()
    }
    assert got[("rows_left", None)] == 4
    assert got[("rows_right", None)] == 4
    assert got[("keys_matched", None)] == 3
    assert got[("rows_equal", None)] == 1
    assert got[("rows_differing", None)] == 2
    assert got[("missing_left", None)] == 1
    assert got[("missing_right", None)] == 1
    assert got[("column_mismatch", "v")] == 2
    assert got[("column_mismatch", "s")] == 1


def test_compare_cols_subset_and_validation(sides):
    left, right = sides
    got = {
        (r["metric"], r["column"]): r["value"]
        for r in reconcile_summary(left, right, "id", ["s"]).collect()
    }
    # with only s compared, key 2 (v differs) counts as equal
    assert got[("rows_equal", None)] == 2
    assert got[("rows_differing", None)] == 1
    assert ("column_mismatch", "v") not in got

    with pytest.raises(ValueError, match="is a key"):
        reconcile_rows(left, right, "id", ["id"])
    with pytest.raises(ValueError, match="missing from a side"):
        reconcile_rows(left, right, "id", ["nope"])
    with pytest.raises(ValueError, match="no comparable columns"):
        reconcile_rows(left.select("id"), right.select("id"), "id")


def test_default_cols_are_shared_non_keys(sides):
    left, right = sides
    # drop s from the right: default comparison shrinks to v only
    out = reconcile_summary(left, right.drop("s"), "id").collect()
    cols = {r["column"] for r in out if r["metric"] == "column_mismatch"}
    assert cols == {"v"}


def test_composite_key(spark):
    left = spark.createDataFrame(
        [("c1", 0, "hi"), ("c1", 1, "yo")], "conv string, turn int, t string"
    )
    right = spark.createDataFrame(
        [("c1", 0, "hi"), ("c1", 2, "xx")], "conv string, turn int, t string"
    )
    got = {
        r["metric"]: r["value"]
        for r in reconcile_summary(
            left, right, ["conv", "turn"]
        ).collect()
        if r["column"] is None
    }
    assert got["rows_equal"] == 1
    assert got["missing_left"] == 1  # ('c1', 2)
    assert got["missing_right"] == 1  # ('c1', 1)


def test_summary_matches_duckdb_on_events(spark):
    """Cross-engine fold: deterministic perturbation of events, summary
    replayed in DuckDB with the identical FULL OUTER JOIN + IS NOT
    DISTINCT FROM fold."""
    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    right = (
        e.where(F.col("event_id") % 29 != 3)
        .withColumn(
            "value",
            F.col("value")
            + F.when(F.col("event_id") % 13 == 0, F.lit(1.0)).otherwise(0.0),
        )
        .unionByName(
            e.where(F.col("event_id") % 41 == 0).select(
                (-F.col("event_id")).alias("event_id"), "event_type", "value"
            )
        )
    )
    got = {
        (r["metric"], r["column"]): r["value"]
        for r in reconcile_summary(e, right, "event_id").collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    exp = con.execute(
        """
        WITH e AS (SELECT event_id, event_type, value FROM events),
        r AS (
          SELECT event_id, event_type,
                 value + CASE WHEN event_id % 13 = 0 THEN 1.0 ELSE 0.0 END AS value
          FROM e WHERE event_id % 29 != 3
          UNION ALL
          SELECT -event_id, event_type, value FROM e WHERE event_id % 41 = 0
        ),
        j AS (
          SELECT l.event_id AS lid, r.event_id AS rid,
                 (l.event_type IS NOT DISTINCT FROM r.event_type) AS et_eq,
                 (l.value IS NOT DISTINCT FROM r.value) AS v_eq
          FROM e l FULL OUTER JOIN r ON l.event_id = r.event_id
        )
        SELECT
          count(*) FILTER (lid IS NOT NULL) AS rows_left,
          count(*) FILTER (rid IS NOT NULL) AS rows_right,
          count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL) AS keys_matched,
          count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND et_eq AND v_eq) AS rows_equal,
          count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT (et_eq AND v_eq)) AS rows_differing,
          count(*) FILTER (lid IS NULL) AS missing_left,
          count(*) FILTER (rid IS NULL) AS missing_right,
          count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT et_eq) AS mm_event_type,
          count(*) FILTER (lid IS NOT NULL AND rid IS NOT NULL AND NOT v_eq) AS mm_value
        FROM j
        """
    ).fetchone()
    names = [
        ("rows_left", None),
        ("rows_right", None),
        ("keys_matched", None),
        ("rows_equal", None),
        ("rows_differing", None),
        ("missing_left", None),
        ("missing_right", None),
        ("column_mismatch", "event_type"),
        ("column_mismatch", "value"),
    ]
    assert {n: v for n, v in zip(names, exp)} == got
    # the perturbation planted real work: every status class is non-empty
    assert got[("rows_differing", None)] > 0
    assert got[("missing_left", None)] > 0
    assert got[("missing_right", None)] > 0


def test_plan_is_one_sortmerge_join_no_cartesian(sides):
    left, right = sides
    plan = reconcile_summary(left, right, "id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_reserved_alias_names_rejected(spark):
    left = spark.createDataFrame([(1, "x", "y")], "id int, l__present string, v string")
    right = spark.createDataFrame([(1, "x", "y")], "id int, l__present string, v string")
    with pytest.raises(ValueError, match="internal aliases"):
        reconcile_rows(left, right, "id")
    with pytest.raises(ValueError, match="duplicate compare columns"):
        reconcile_rows(left.drop("l__present"), right.drop("l__present"), "id", ["v", "v"])


def test_float_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, None), (4, 10.0)], "id int, v double"
    )
    right = spark.createDataFrame(
        [(1, 10.0 + 1e-13), (2, 10.5), (3, 0.0), (4, None)],
        "id int, v double",
    )
    strict = {
        r["id"]: r["status"] for r in reconcile_rows(left, right, "id").collect()
    }
    assert strict == {1: "differing", 2: "differing", 3: "differing", 4: "differing"}

    tol = {
        r["id"]: r["status"]
        for r in reconcile_rows(left, right, "id", float_tol=1e-9).collect()
    }
    # within-tol float equal; NULL-vs-value never rescued by the tolerance
    assert tol == {1: "equal", 2: "differing", 3: "differing", 4: "differing"}

    got = {
        (r["metric"], r["column"]): r["value"]
        for r in reconcile_summary(left, right, "id", float_tol=1e-9).collect()
    }
    assert got[("rows_equal", None)] == 1
    assert got[("column_mismatch", "v")] == 3

    with pytest.raises(ValueError, match=">= 0"):
        reconcile_rows(left, right, "id", float_tol=-1)


def test_float_tolerance_does_not_touch_strings(spark):
    left = spark.createDataFrame([(1, "10.0")], "id int, s string")
    right = spark.createDataFrame([(1, "10.0000000001")], "id int, s string")
    out = reconcile_rows(left, right, "id", float_tol=1.0).collect()[0]
    assert out["status"] == "differing"
