"""Hashing-trick NB log-odds quality classifier (functions/quality_clf.py):
separability on planted data, unseen-bucket fallback, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.quality_clf import (
    score_quality,
    train_quality_classifier,
)

_GOOD = [
    "the quick brown fox jumps over the lazy dog",
    "a well formed english sentence with common words and structure",
    "this is another fluent document that reads like normal prose",
    "people write text with the usual words in the usual order",
]
_BAD = [
    "zzq qqz xkcd vwxyz qqqq zzzz xxxx",
    "qx qx qx qx qx qx qx qx",
    "wvut zyxw qponm lkjih gfedc",
    "xz zx xz zx qq zz qq zz",
]


def _labeled(spark):
    rows = [(i, t, True) for i, t in enumerate(_GOOD)] + [
        (100 + i, t, False) for i, t in enumerate(_BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_classifier_separates_planted_classes(spark):
    train = _labeled(spark)
    w, c = train_quality_classifier(train, "label", n_buckets=128, seed=3)
    test = spark.createDataFrame(
        [
            (0, "the quick dog jumps over the fox"),  # good-ish vocabulary
            (1, "qqz zzq vwxyz qx qx zzzz"),  # bad-ish vocabulary
            (2, ""),  # empty → prior only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in score_quality(
        test, w, c, n_buckets=128, seed=3, round_digits=6
    ).collect()}
    assert out[0]["predicted"] is True and out[0]["score"] > 0
    assert out[1]["predicted"] is False and out[1]["score"] < 0
    assert out[2]["n_tokens"] == 0
    # balanced classes → prior 0 → empty doc scores exactly the prior
    assert abs(out[2]["score"]) < 1e-9


def test_classifier_unseen_tokens_fall_back(spark):
    train = _labeled(spark)
    w, c = train_quality_classifier(train, "label", n_buckets=4096, seed=3)
    # with 4096 buckets and tiny vocab, a novel token lands in an unseen
    # bucket with overwhelming probability → w_unseen path, no crash
    test = spark.createDataFrame(
        [(0, "completely novel unhashed tokenxyz")], "doc_id long, text string"
    )
    row = score_quality(test, w, c, n_buckets=4096, seed=3).first()
    assert row["n_tokens"] == 3 + 1
    assert row["score"] is not None


def test_classifier_deterministic_across_partitioning(spark):
    train = _labeled(spark)
    w, c = train_quality_classifier(train, "label", n_buckets=128, seed=3)
    test = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_GOOD + _BAD)], "doc_id long, text string"
    )
    a = sorted(map(tuple, score_quality(
        test, w, c, n_buckets=128, seed=3, round_digits=6
    ).collect()))
    b = sorted(map(tuple, score_quality(
        test.repartition(7), w, c, n_buckets=128, seed=3, round_digits=6
    ).collect()))
    assert a == b


def test_classifier_prior_with_imbalanced_labels(spark):
    rows = [(i, t, True) for i, t in enumerate(_GOOD)] + [
        (100, _BAD[0], False)
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    w, c = train_quality_classifier(train, "label", n_buckets=128, seed=3)
    prior = c.first()["prior"]
    import math

    assert abs(prior - math.log(4.0)) < 1e-12  # ln(4/1)
