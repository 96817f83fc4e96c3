"""Dedup operators: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  Quick Brown  Fox jumps over the lazy dog"),  # normalized dup
        (3, "the quick brown fox leaps over the lazy dog"),  # near-dup (1 word)
        (4, "completely different text about spark aggregation engines"),
        (5, "another unrelated document mentioning iceberg tables only"),
        (6, "the quick brown fox jumps over the lazy cat today"),  # near-dup-ish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicate_groups(corpus):
    groups = D.exact_duplicate_groups(corpus).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 0 and groups[0]["dup_count"] == 3


def test_dedup_exact_keeps_min_id(corpus):
    kept = sorted(r["doc_id"] for r in D.dedup_exact(corpus).collect())
    assert kept == [0, 3, 4, 5, 6]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    got = df.select(D.shingles(F.col("t"), 2).alias("s")).first()["s"]
    assert got == ["a b", "b c", "c d"]
    # short text falls back to whole-string shingle
    df2 = spark.createDataFrame([("a b",)], "t string")
    assert df2.select(D.shingles(F.col("t"), 3).alias("s")).first()["s"] == ["a b"]


def test_minhash_signatures_shape(corpus):
    sigs = D.minhash_signatures(corpus, num_hashes=8)
    rows = sigs.collect()
    assert len(rows) == 7
    assert all(len(r["sig"]) == 8 for r in rows)
    # identical text → identical signature
    by_id = {r["doc_id"]: r["sig"] for r in rows}
    assert by_id[0] == by_id[1]


def test_minhash_near_duplicates(corpus):
    pairs = D.minhash_near_duplicates(
        corpus, num_hashes=16, bands=8, shingle_n=2, threshold=0.5
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # exact dups are certainly found; near-dup 0-3 shares most 2-shingles
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all(a != 4 and b != 4 for a, b in got)  # unrelated doc not paired


def test_simhash_similar_texts_close(spark, corpus):
    sh = corpus.select("doc_id", D.simhash(F.col("text")).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in sh}
    assert by_id[0] == by_id[1]  # identical text → identical simhash

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(by_id[0], by_id[3]) < hamming(by_id[0], by_id[4])


def test_simhash_buckets_find_near_dups(corpus):
    # bands=8 (8-bit bands): hamming(0,3)=6 flips can unluckily touch all 4
    # 16-bit bands, but 8 bands guarantee a collision for hamming ≤ 7
    pairs = {(r["id_a"], r["id_b"]) for r in D.simhash_buckets(corpus, bands=8).collect()}
    assert (0, 1) in pairs
    assert (0, 3) in pairs


def test_ngram_jaccard_pairs(corpus):
    pairs = D.ngram_jaccard_pairs(corpus, n=1, threshold=0.7)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 3)] >= 0.7  # 8/10 words shared (distinct-set jaccard)
    assert (0, 4) not in got


def test_minhash_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # append an exact copy of doc 0 with a new id → must be found
    clone = docs.where(F.col("doc_id") == 0).withColumn(
        "doc_id", F.lit(100000).cast("long")
    )
    aug = docs.unionByName(clone)
    pairs = D.minhash_near_duplicates(aug, num_hashes=16, bands=8, threshold=0.9)
    assert (0, 100000) in {(r["id_a"], r["id_b"]) for r in pairs.collect()}
