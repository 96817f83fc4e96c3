"""Property/fuzz tests (SURVEY.md §5.4/§5.6): seeded random frames must
match the pandas oracle field-for-field; engine invariants hold; salted
(skew-mitigated) plans produce identical results to unsalted ones."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.uniqueness import duplicate_keys
from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.oracle_pandas import oracle_validate
from ndap_data_validator_spark.plans.pipeline import salt_repartition
from ndap_data_validator_spark.rules.model import ColumnAssignment
from ndap_data_validator_spark.sources.datagen import transcripts

_TIME_POOL = [
    "2021", "1999", "2021-22", "Mar-2021", "mar-2021", "Jan-Mar, 2021",
    "Jan - Mar, 2021", "05-Mar-2021", "Q1 2021", "", "  ", "March-2021", None,
]
_NUM_POOL = ["1", "-5", "0", "2.5", "-3.5", "1e2", "N/A", "junk", " 7 ", "", None]
_STR_POOL = ["alpha", "beta", "", "  x  ", None]

ASSIGNS = [
    ColumnAssignment("loc", "Location"),
    ColumnAssignment("t", "Time"),
    ColumnAssignment("mi", "Measures", "integer"),
    ColumnAssignment("mf", "Measures", "float"),
    ColumnAssignment("o", "Others"),
]


def _random_frame(seed: int, n: int = 120) -> pd.DataFrame:
    rng = random.Random(seed)
    return pd.DataFrame(
        {
            "loc": [rng.choice(_STR_POOL) for _ in range(n)],
            "t": [rng.choice(_TIME_POOL) for _ in range(n)],
            "mi": [rng.choice(_NUM_POOL) for _ in range(n)],
            "mf": [rng.choice(_NUM_POOL) for _ in range(n)],
            "o": [rng.choice(_STR_POOL) for _ in range(n)],
        }
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fuzz_matches_oracle(spark, seed):
    pdf = _random_frame(seed)
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    res = ValidationEngine().validate(sdf, ASSIGNS)
    oracle = oracle_validate(pdf, ASSIGNS)
    got = {r["column"]: r.asDict() for r in res.per_column_report.collect()}
    for col, exp in oracle["per_column"].items():
        g = got[col]
        assert (g["nulls"], g["conversion_errors"], g["passed"], list(g["reasons"])) == (
            exp["nulls"], exp["conversion_errors"], exp["passed"], exp["reasons"]
        ), (seed, col)
    s = res.summary.first()
    assert list(s["failed_columns"]) == oracle["failed_columns"], seed
    assert s["passed"] == oracle["passed"], seed


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_invariants(spark, seed):
    pdf = _random_frame(seed, n=200)
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    res = ValidationEngine().validate(sdf, ASSIGNS)
    rows = res.per_column_report.collect()
    assert len(rows) == len(pdf.columns)  # report rows == column count
    non_null = {c: int(pdf[c].notna().sum()) for c in pdf.columns}
    for r in rows:
        assert 0 <= r["conversion_errors"] <= non_null[r["column"]] + 1_000_000
        assert 0 <= r["nulls"] <= len(pdf)
        assert (len(r["reasons"]) == 0) == r["passed"]


def test_coercion_idempotent(spark):
    # coercing an already-coerced integer column is a no-op with 0 errors
    pdf = pd.DataFrame({"mi": ["1", "2.5", "N/A", None, "7"]})
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    eng = ValidationEngine()
    once = eng.validate(sdf, [ColumnAssignment("mi", "Measures", "integer")])
    coerced = once.coerced
    twice = eng.validate(coerced, [ColumnAssignment("mi", "Measures", "integer")])
    r = twice.per_column_report.first()
    assert r["conversion_errors"] == 0
    assert [x["mi"] for x in twice.coerced.collect()] == [
        x["mi"] for x in coerced.collect()
    ]


def test_salted_path_identical_results(spark):
    # SURVEY §5.6: one conversation holds ~20% of rows; the salted
    # repartition path must produce identical duplicate-key results
    df = transcripts(spark, 4_000, 100, seed=42)
    plain = duplicate_keys(df, ["conv_id", "turn_idx"])
    salted = duplicate_keys(
        salt_repartition(df, "conv_id", num_partitions=8), ["conv_id", "turn_idx"]
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_validation_identical_reports(spark):
    df = transcripts(spark, 4_000, 100, seed=42)
    assigns = [
        ColumnAssignment("conv_id", "Location"),
        ColumnAssignment("turn_idx", "Measures", "integer"),
    ]
    eng = ValidationEngine()
    a = eng.validate(df, assigns).per_column_report
    b = eng.validate(
        salt_repartition(df, "conv_id", num_partitions=8), assigns
    ).per_column_report
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salt_is_deterministic_per_row(spark):
    """Task retries recompute salts: the same row must always get the same
    salt value (content-derived, never monotonically_increasing_id)."""
    from pyspark.sql import functions as F

    df = transcripts(spark, 2_000, 50, seed=42)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    a = df.select(F.col("conv_id"), F.col("turn_idx"), salt.alias("s"))
    b = df.select(F.col("conv_id"), F.col("turn_idx"), salt.alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # salted plan evaluated twice → identical outputs (stability proxy)
    r1 = duplicate_keys(
        salt_repartition(df, "conv_id", num_partitions=8), ["conv_id", "turn_idx"]
    ).collect()
    r2 = duplicate_keys(
        salt_repartition(df, "conv_id", num_partitions=8), ["conv_id", "turn_idx"]
    ).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_violation_cap_matches_python_oracle(spark, seed):
    """Capped violations == full violations group-headed in Python: for
    every (partition, column, reason) group, sort by the stable key
    (NULLS FIRST, value tiebreak) and keep the first K."""
    t = transcripts(spark, 1_500, 20, seed=seed)
    assigns = [
        ColumnAssignment("conv_id", "Location"),
        ColumnAssignment("role", "Others", regex=r"^(user|assistant|tool)$"),
        ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
    ]
    eng = ValidationEngine()
    part = F.substring("conv_id", 6, 1)
    order = ["conv_id", "turn_idx"]
    k = 2 + seed % 3
    full = eng.validate(t, assigns, partition_by=part, order_by=order)
    capped = eng.validate(
        t, assigns, partition_by=part, order_by=order,
        max_violations_per_rule=k,
    )

    def sort_key(r):
        return (
            r["conv_id"] is not None, r["conv_id"] or "",
            r["turn_idx"] is not None,
            r["turn_idx"] if r["turn_idx"] is not None else 0,
            r["value"] is not None, r["value"] or "",
        )

    from collections import defaultdict

    groups = defaultdict(list)
    for r in full.violations.collect():
        groups[(r["partition_id"], r["column"], r["reason"])].append(r)
    want = set()
    for key, rows in groups.items():
        for r in sorted(rows, key=sort_key)[:k]:
            want.add((key, r["conv_id"], r["turn_idx"], r["value"]))
    got = {
        ((r["partition_id"], r["column"], r["reason"]),
         r["conv_id"], r["turn_idx"], r["value"])
        for r in capped.violations.collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [21, 22])
def test_profile_matches_python_oracle(spark, seed):
    """profile_columns == an independent pandas/re oracle on a seeded
    random frame: null fractions, min/max, regex-candidate fractions over
    non-null values, and exact small domains."""
    import re

    from ndap_data_validator_spark.rules.inference import (
        _REGEX_CANDIDATES,
        profile_columns,
    )

    rng = random.Random(seed)
    s_pool = ["7", "-3", "2.5", "1e3", "2024-01-02", "true", "xyz", "", None]
    rows = [
        (rng.choice(s_pool), rng.choice(["a", "b", "c"]),
         rng.randint(-50, 50) if rng.random() > 0.1 else None)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "s string, cat string, num int")
    prof = {p["column"]: p for p in profile_columns(df)}

    s_vals = [r[0] for r in rows]
    nn = [v for v in s_vals if v is not None]
    assert prof["s"]["nulls"] == sum(v is None for v in s_vals)
    for label, pat in _REGEX_CANDIDATES.items():
        # Java (?i) flag sits mid-pattern in the boolean candidate; Python
        # wants it at the start — normalize for the oracle only
        ppat = pat.replace("^(?i)", "(?i)^")
        want = sum(bool(re.search(ppat, v)) for v in nn) / len(nn)
        got = prof["s"]["regex_fracs"][label]
        assert abs(got - want) < 1e-9, (label, got, want)
    assert prof["cat"]["domain"] == ["a", "b", "c"]
    nums = [r[2] for r in rows if r[2] is not None]
    assert prof["num"]["min"] == min(nums)
    assert prof["num"]["max"] == max(nums)
    assert prof["num"]["null_frac"] == sum(r[2] is None for r in rows) / 300


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_fuzz_quarantine_conservation(spark, tmp_path, seed):
    """Quarantine-policy invariants over seeded random frames (which
    naturally produce mixed-format Time partitions, i.e. the aggregate-
    only withheld class): published + quarantined + withheld == source,
    and the quarantined rid set is EXACTLY the distinct violating rids of
    the non-withheld partitions (the violations report and flag_rows
    compile the same predicates)."""
    from ndap_data_validator_spark.plans.pipeline import run_validation
    from ndap_data_validator_spark.rules.model import (
        REASON_INCONSISTENT_TIME,
    )

    rng = random.Random(seed)
    n = 120
    pdf = _random_frame(seed, n)
    pdf["part"] = [f"p{rng.randrange(4)}" for _ in range(n)]
    pdf["rid"] = list(range(n))
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    assigns = ASSIGNS + [ColumnAssignment("part", "Others")]
    out = run_validation(
        spark,
        sdf,
        assigns,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        report_path=str(tmp_path / "rep"),
        publish_path=str(tmp_path / "pub"),
        order_by=["rid"],
        row_policy="quarantine",
    )

    withheld = {
        r["partition_id"]
        for r in out.result.per_column_report.collect()
        if REASON_INCONSISTENT_TIME in list(r["reasons"])
    }

    def _rids(path):
        try:
            return {r["rid"] for r in spark.read.parquet(str(path)).collect()}
        except Exception:
            return set()

    pub = _rids(tmp_path / "pub")
    quar = _rids(tmp_path / "pub_quarantine")
    withheld_rids = set(pdf[pdf["part"].isin(withheld)]["rid"])
    # conservation: the three routes partition the source exactly
    assert pub | quar | withheld_rids == set(range(n)), seed
    assert not (pub & quar) and not (pub & withheld_rids) and not (
        quar & withheld_rids
    ), seed
    # routing agrees with the violations report on non-withheld partitions
    viol = spark.read.parquet(str(tmp_path / "rep") + "/violations").collect()
    viol_rids = {
        r["rid"] for r in viol if r["partition_id"] not in withheld
    }
    assert quar == viol_rids, seed
