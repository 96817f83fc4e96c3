from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.dedup import (
    dedup_against_index,
    dedup_incremental_batch,
    minhash_index,
    minhash_near_duplicates,
)

B1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark structured streaming handles late data with watermarks and "
        "event time windows"),
    (3, "completely different content about tokenizer training and merge "
        "tables for byte pair encoding"),
]
B2 = [
    # exact clone of doc 1 (cross-batch duplicate)
    (10, "the quick brown fox jumps over the lazy dog near the river bank"),
    # near-dup of doc 2 (one word changed)
    (11, "spark structured streaming handles late data with watermarks and "
         "processing time windows"),
    # fresh
    (12, "entirely novel discussion of broadcast joins adaptive execution "
         "and shuffle partition coalescing"),
]


@pytest.fixture(scope="module")
def batches(spark):
    b1 = spark.createDataFrame(B1, "doc_id long, text string")
    b2 = spark.createDataFrame(B2, "doc_id long, text string")
    return b1, b2


def test_incremental_flags_cross_batch_dups(spark, batches):
    b1, b2 = batches
    idx = minhash_index(b1, num_hashes=16, bands=8)
    report, new_rows = dedup_incremental_batch(
        b2, idx, num_hashes=16, bands=8, threshold=0.5
    )
    rep = {r["doc_id"]: r for r in report.collect()}
    assert rep[10]["matched_hist_id"] == 1 and rep[10]["est_jaccard"] == 1.0
    assert not rep[10]["is_unique"]
    assert rep[11]["matched_hist_id"] == 2 and rep[11]["est_jaccard"] >= 0.5
    assert rep[12]["is_unique"] and rep[12]["matched_hist_id"] is None
    # only the unique doc enters the index: bands rows for doc 12 alone
    ids = {r["doc_id"] for r in new_rows.select("doc_id").distinct().collect()}
    assert ids == {12}
    # appended rows have the index schema
    assert set(new_rows.columns) == {"doc_id", "band_idx", "band_hash", "sig"}


def test_incremental_agrees_with_full_corpus_mining(spark, batches):
    """Cross-batch exact clones found incrementally == the cross-batch
    pairs a one-shot near-dup mine over the union finds."""
    b1, b2 = batches
    idx = minhash_index(b1, num_hashes=16, bands=4)
    inc = {
        (r["hist_id"], r["new_id"])
        for r in dedup_against_index(
            b2, idx, num_hashes=16, bands=4, threshold=0.99
        ).collect()
    }
    full = minhash_near_duplicates(
        b1.unionByName(b2), num_hashes=16, bands=4, threshold=0.99
    )
    cross = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] < 10 and r["id_b"] >= 10
    }
    assert inc == cross == {(1, 10)}


def test_hist_bucket_cap_limits_flood(spark):
    """A boilerplate band bucket accumulated over many crawls must not
    quadratic-blow a delta run: with the cap, each new doc meets at most
    max_bucket_size historical candidates per band."""
    boiler = "identical boilerplate footer text repeated across the site"
    hist = spark.createDataFrame(
        [(i, boiler) for i in range(40)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1000, boiler)], "doc_id long, text string"
    )
    idx = minhash_index(hist, num_hashes=16, bands=4)
    capped = dedup_against_index(
        new, idx, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=5
    )
    n = capped.count()
    assert 1 <= n <= 5  # flood capped, but the duplicate is still caught
    uncapped = dedup_against_index(
        new, idx, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=None
    )
    assert uncapped.count() == 40


def test_incremental_deterministic_under_repartition(spark, batches):
    b1, b2 = batches
    idx = minhash_index(b1, num_hashes=16, bands=4)
    a, _ = dedup_incremental_batch(b2, idx, threshold=0.5)
    b, _ = dedup_incremental_batch(
        b2.repartition(7), idx.repartition(5), threshold=0.5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
