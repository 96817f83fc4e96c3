"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_registry_consistency():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unknown query"
    assert len(qs) >= 20
    # every oracle-checked query is a distinct operator family exemplar
    assert len(oracles) >= 15


def test_entry_runs_and_has_rows(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) == 7  # one per derived column
    assert set(df.columns) == {
        "partition_id", "column", "role", "nulls",
        "conversion_errors", "passed", "reasons",
    }
    byc = {r["column"]: r for r in rows}
    assert byc["int_m"]["conversion_errors"] > 0
    assert not byc["year_str"]["passed"]  # injected invalid formats
    assert byc["tag"]["passed"]
