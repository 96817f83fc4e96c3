from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.dsir import (
    dsir_select,
    fit_importance_weights,
    gumbel_key,
    ngram_features,
    score_importance,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target: "science" vocabulary; raw: half science-like, half spam-like
    target = spark.createDataFrame(
        [(i, "the atom splits and the electron moves with energy") for i in range(8)]
        + [(8, "quantum field theory explains the electron energy levels")],
        "doc_id long, text string",
    )
    sci = [
        (i, "electron energy in the atom follows quantum rules")
        for i in range(20)
    ]
    spam = [
        (100 + i, "buy cheap pills now click here win money fast")
        for i in range(20)
    ]
    raw = spark.createDataFrame(sci + spam, "doc_id long, text string")
    return target, raw


def test_ngram_features_shape(spark):
    rows = spark.createDataFrame(
        [("a b c",), ("solo",), ("",), (None,)], "text string"
    ).select(ngram_features(F.col("text")).alias("f")).collect()
    assert rows[0]["f"] == ["a", "b", "c", "a b", "b c"]
    assert rows[1]["f"] == ["solo"]
    assert rows[2]["f"] == []
    assert rows[3]["f"] == []


def test_importance_weights_favor_target_vocabulary(corpora):
    target, raw = corpora
    w, c = fit_importance_weights(target, raw, n_buckets=512)
    scored = score_importance(raw, w, c, n_buckets=512)
    by_id = {r["doc_id"]: r for r in scored.collect()}
    sci_w = [by_id[i]["log_w"] for i in range(20)]
    spam_w = [by_id[100 + i]["log_w"] for i in range(20)]
    # every science doc outscores every spam doc
    assert min(sci_w) > max(spam_w)
    # identical texts → identical log weights
    assert len(set(sci_w)) == 1 and len(set(spam_w)) == 1
    # n_features = tokens + bigrams = 8 + 7
    assert by_id[0]["n_features"] == 15


def test_dsir_select_keeps_target_like_fraction(corpora):
    target, raw = corpora
    out = dsir_select(raw, target, keep_fraction=0.5, n_buckets=512)
    kept = {r["doc_id"] for r in out.collect() if r["keep"]}
    # the vocabulary gap dwarfs Gumbel noise: the kept half IS the
    # science half
    assert kept == set(range(20))
    # all rows reported, keep is a flag not a filter
    assert out.count() == 40


def test_dsir_deterministic_under_repartition(corpora):
    target, raw = corpora
    a = dsir_select(raw, target, keep_fraction=0.5, n_buckets=512)
    b = dsir_select(
        raw.repartition(7), target.repartition(3), keep_fraction=0.5,
        n_buckets=512,
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_gumbel_key_matches_closed_form(spark):
    rows = (
        spark.range(5)
        .select(F.col("id"), gumbel_key(F.col("id"), seed=97).alias("g"))
        .collect()
    )
    import hashlib

    for r in rows:
        h = int(hashlib.md5(f"97:{r['id']}".encode()).hexdigest()[:15], 16)
        u = (h % (1 << 20) + 0.5) / float(1 << 20)
        assert r["g"] == pytest.approx(-math.log(-math.log(u)), rel=1e-12)


def test_empty_doc_competes_on_gumbel_alone(spark, corpora):
    target, raw = corpora
    raw2 = raw.unionByName(
        raw.sparkSession.createDataFrame(
            [(999, "")], "doc_id long, text string"
        )
    )
    w, c = fit_importance_weights(target, raw2, n_buckets=512)
    scored = score_importance(raw2, w, c, n_buckets=512)
    row = scored.where(F.col("doc_id") == 999).first()
    assert row["n_features"] == 0 and row["log_w"] == 0.0
    assert row["priority"] is not None
