"""Unigram-LM cross-entropy scoring (functions/lm.py): hand-computed
fixtures + invariants (fluent < gibberish, unseen-token floor, empty doc)."""

from __future__ import annotations

import math

import pytest

from ndap_data_validator_spark.functions.lm import doc_cross_entropy, unigram_lm

ALPHA = 0.5


def _expected_ce(doc_tokens, ref_counts, total, vocab):
    denom = total + ALPHA * (vocab + 1)
    lps = []
    for t in doc_tokens:
        c = ref_counts.get(t, None)
        if c is None:
            lps.append(math.log(ALPHA / denom))
        else:
            lps.append(math.log((c + ALPHA) / denom))
    return -sum(lps) / len(lps)


def test_unigram_lm_hand_computed(spark):
    ref = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat")], "doc_id long, text string"
    )
    lm, consts = unigram_lm(ref, alpha=ALPHA)
    c = consts.first()
    assert c["total_tokens"] == 6 and c["vocab_size"] == 4
    probs = {r["token"]: r["logp"] for r in lm.collect()}
    denom = 6 + ALPHA * 5
    assert probs["the"] == pytest.approx(math.log(2.5 / denom))
    assert probs["cat"] == pytest.approx(math.log(1.5 / denom))
    assert c["unk_logp"] == pytest.approx(math.log(ALPHA / denom))

    docs = spark.createDataFrame(
        [(10, "the cat"), (11, "zebra quux"), (12, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in doc_cross_entropy(docs, lm, consts).collect()
    }
    counts = {"the": 2, "sat": 2, "cat": 1, "dog": 1}
    assert out[10]["cross_entropy"] == pytest.approx(
        _expected_ce(["the", "cat"], counts, 6, 4)
    )
    assert out[11]["cross_entropy"] == pytest.approx(
        _expected_ce(["zebra", "quux"], counts, 6, 4)
    )
    # fluent-in-domain scores lower than all-unknown
    assert out[10]["cross_entropy"] < out[11]["cross_entropy"]
    # empty doc: present, zero tokens, NULL score
    assert out[12]["n_tokens"] == 0 and out[12]["cross_entropy"] is None
    assert out[10]["n_tokens"] == 2


def test_lm_case_folding_and_rounding(spark):
    ref = spark.createDataFrame([(0, "The THE the")], "doc_id long, text string")
    lm, consts = unigram_lm(ref, alpha=ALPHA)
    assert lm.count() == 1  # case-folded to one vocab entry
    docs = spark.createDataFrame([(1, "THE the")], "doc_id long, text string")
    row = doc_cross_entropy(docs, lm, consts, round_digits=6).first()
    denom = 3 + ALPHA * 2
    assert row["cross_entropy"] == pytest.approx(
        round(-math.log(3.5 / denom), 6)
    )


def test_perplexity_buckets_split_by_corpus_thirds(spark):
    from ndap_data_validator_spark.functions.lm import perplexity_buckets

    scored = spark.createDataFrame(
        [(i, 10, float(i)) for i in range(9)] + [(9, 0, None)],
        "doc_id long, n_tokens int, cross_entropy double",
    )
    out = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(scored).collect()}
    # cuts at p33/p67 of 0..8: head <= 2.64, middle <= 5.36, tail above
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert out[9] is None  # NULL ce stays NULL


def test_perplexity_buckets_all_null(spark):
    from ndap_data_validator_spark.functions.lm import perplexity_buckets

    scored = spark.createDataFrame(
        [(1, 0, None)], "doc_id long, n_tokens int, cross_entropy double"
    )
    assert perplexity_buckets(scored).first()["ppl_bucket"] is None
