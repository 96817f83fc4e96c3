"""Tests for stats / uniqueness / referential / drift operators and the
deterministic transcripts generator (FIXTURES.md §§1-3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators import drift
from ndap_data_validator_spark.operators.referential import (
    ri_violation_counts,
    ri_violations,
)
from ndap_data_validator_spark.operators.stats import column_stats, merge_hll_to_global
from ndap_data_validator_spark.operators.uniqueness import (
    duplicate_keys,
    duplicate_rows,
    latest_per_key,
)
from ndap_data_validator_spark.sources.datagen import tool_catalog, transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts(spark, n_rows=5_000, n_convs=200, seed=42).cache()


# ---------------------------------------------------------------- datagen

def test_transcripts_schema_matches_input_hint(tdf):
    assert [(f.name, f.dataType.simpleString()) for f in tdf.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_transcripts_deterministic(spark, tdf):
    again = transcripts(spark, n_rows=5_000, n_convs=200, seed=42)
    assert tdf.exceptAll(again).count() == 0
    assert again.exceptAll(tdf).count() == 0


def test_transcripts_skewed_conversation(tdf):
    top = (
        tdf.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    )
    assert top["conv_id"] == "conv-000000"
    assert top["count"] >= 0.18 * 5_000  # ~20% of rows


def test_transcripts_has_injected_violations(tdf):
    assert tdf.where(F.col("conv_id").isNull()).count() > 0
    assert tdf.where(F.col("turn_idx") < 0).count() > 0
    assert tdf.where(~F.col("role").isin("user", "assistant", "tool")).count() > 0
    assert duplicate_keys(tdf, ["conv_id", "turn_idx"]).count() > 0


def test_per_turn_text_equality_under_stable_ordering(spark, tdf):
    # north_rule invariant: text is a pure function of (conv_id, turn_idx)
    a = (
        tdf.where(F.col("conv_id").isNotNull() & F.col("text").isNotNull())
        .select("conv_id", "turn_idx", "text")
        .distinct()
    )
    per_key = a.groupBy("conv_id", "turn_idx").agg(
        F.count_distinct("text").alias("n")
    )
    assert per_key.where(F.col("n") > 1).count() == 0


# ---------------------------------------------------------------- uniqueness

def test_duplicate_keys_and_rows(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1), (None, 1), (None, 1)],
        "conv_id string, turn_idx int",
    )
    dk = {(r["conv_id"], r["turn_idx"]): r["dup_count"] for r in duplicate_keys(df, ["conv_id", "turn_idx"]).collect()}
    assert dk == {("a", 1): 2, (None, 1): 2}
    dr = duplicate_rows(df, ["conv_id", "turn_idx"])
    assert dr.count() == 4
    assert {r["occurrence"] for r in dr.collect()} == {1, 2}


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [("t1", 1, "old"), ("t1", 3, "new"), ("t2", 2, "only")],
        "token string, created_at int, v string",
    )
    got = {r["token"]: r["v"] for r in latest_per_key(df, ["token"], "created_at").collect()}
    assert got == {"t1": "new", "t2": "only"}


# ---------------------------------------------------------------- referential

def test_ri_violations(spark, tdf):
    cat = tool_catalog(spark)
    viol = ri_violations(tdf, "tool", cat, "tool_id")
    bad = viol.select("tool").distinct().collect()
    assert all(r["tool"].startswith("tool-9") for r in bad)
    assert viol.count() > 0
    # null tool references are not violations
    assert viol.where(F.col("tool").isNull()).count() == 0
    counts = ri_violation_counts(tdf, "tool", cat, "tool_id")
    assert counts.agg(F.sum("violation_count")).first()[0] == viol.count()


def test_ri_clean_dimension(spark):
    facts = spark.createDataFrame([("tool-001",), (None,)], "tool string")
    cat = tool_catalog(spark)
    assert ri_violations(facts, "tool", cat, "tool_id").count() == 0


# ---------------------------------------------------------------- stats

def test_column_stats_shape_and_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "x int, s string"
    )
    st = column_stats(df, with_hll=True)
    rows = {r["column"]: r.asDict() for r in st.collect()}
    assert rows["x"]["nulls"] == 0 and rows["s"]["nulls"] == 1
    assert rows["x"]["min"] == "1" and rows["x"]["max"] == "3"
    assert abs(rows["x"]["mean"] - 2.25) < 1e-9
    assert rows["s"]["mean"] is None  # non-numeric: no mean/stddev
    assert rows["x"]["approx_distinct"] == 3


def test_hll_merge_partitions(spark):
    df = spark.createDataFrame(
        [(i % 4, f"v{i % 10}") for i in range(1000)], "p int, s string"
    )
    st = column_stats(df, ["s"], partition_by="p")
    assert st.count() == 4
    merged = merge_hll_to_global(st).first()
    assert merged["rows"] == 1000
    assert abs(merged["distinct_estimate"] - 10) <= 1


# ---------------------------------------------------------------- drift

def test_drift_trips_on_shift_not_on_clean(spark):
    base_df = transcripts(spark, 5_000, 200, seed=41, inject_violations=False)
    snap = drift.snapshot(base_df, ["turn_idx"], n_bins=32)
    clean = transcripts(spark, 5_000, 200, seed=42, inject_violations=False)
    # binned KS sees shifts at bin resolution only: the grid spans the skewed
    # conversation's turn range (~0..1000 here), so the shift must cross bin
    # edges (width ≈ 31) to register — shift by ~multiple bins.
    shifted = transcripts(
        spark, 5_000, 200, seed=42, inject_violations=False,
        turn_shift=300, shift_fraction=0.3,
    )
    (r_clean,) = drift.drift_check(clean, snap)
    (r_shift,) = drift.drift_check(shifted, snap)
    assert not r_clean.drifted(), (r_clean.ks, r_clean.psi)
    assert r_shift.drifted(), (r_shift.ks, r_shift.psi)
    assert r_shift.ks > r_clean.ks and r_shift.psi > r_clean.psi


def test_drift_identical_is_zero(spark):
    df = transcripts(spark, 2_000, 100, seed=7, inject_violations=False)
    snap = drift.snapshot(df, ["turn_idx"])
    (r,) = drift.drift_check(df, snap)
    assert r.ks == 0.0 and abs(r.psi) < 1e-12
