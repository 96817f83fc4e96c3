"""Curation funnel: composed quality/lang/dedup/decontamination gates with
planted fixtures for every stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.curate import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs along the river "
    "with a friend in the warm morning light of this day"
)


def _docs(spark):
    rows = [
        (0, GOOD),                                  # survives everything
        (1, GOOD + " extra tail words here today"),  # survives, distinct
        (2, "zzz qqq xxx"),                          # fails quality (short, no stopwords)
        (3, "der hund und die katze ist mit dem ball und der hund ist da "
            "und das ist gut und der tag ist lang und die nacht ist kurz"),  # german
        (4, GOOD),                                   # exact dup of 0 → loses keeper
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_funnel_gates_and_counts(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(99, GOOD)], "doc_id long, text string"
    )  # contaminates docs 0/4 (verbatim) and 1 (shared 8-grams)
    curated, funnel = curate_corpus(
        docs, bench, min_quality=0.5, languages=("en",),
        decontaminate_n=8, hash_fn="md5",
    )
    f = {r["stage"]: r["survivors"] for r in funnel.collect()}
    assert f["ingested"] == 5
    assert f["quality_gate"] == 4          # doc 2 out
    assert f["language_gate"] == 3         # doc 3 out
    assert f["dedup_gate"] == 2            # doc 4 (dup of 0) out
    assert f["decontamination_gate"] == 0  # 0 and 1 overlap the benchmark
    assert curated.count() == 0

    # without a benchmark, 0 and 1 survive with redacted text + signals
    curated2, funnel2 = curate_corpus(
        docs, None, min_quality=0.5, languages=("en",)
    )
    ids = {r["doc_id"] for r in curated2.collect()}
    assert ids == {0, 1}
    f2 = {r["stage"]: r["survivors"] for r in funnel2.collect()}
    assert f2["decontamination_gate"] == 2
    cols = set(curated2.columns)
    assert cols == {"doc_id", "text", "quality", "lang"}


def test_curation_redacts_pii_in_survivors(spark):
    docs = spark.createDataFrame(
        [(0, GOOD + " contact me at someone@example.com for details")],
        "doc_id long, text string",
    )
    curated, _ = curate_corpus(docs, None, min_quality=0.3)
    out = curated.first()["text"]
    assert "<EMAIL>" in out and "@" not in out


def test_corpus_mixture_report(spark):
    from ndap_data_validator_spark.operators.curate import corpus_mixture_report

    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog is with that thing"),   # en, 9 ws tokens
            (1, "the sun and the moon is up with that"),     # en, 9
            (2, "der hund und die katze ist mit dem ball"),  # de, 9
        ],
        "doc_id long, text string",
    )
    rows = {r["lang"]: r for r in corpus_mixture_report(docs).collect()}
    assert set(rows) == {"en", "de"}
    assert rows["en"]["n_docs"] == 2 and rows["de"]["n_docs"] == 1
    assert rows["en"]["tokens_ws"] == 18 and rows["de"]["tokens_ws"] == 9
    assert rows["en"]["token_share"] == 0.6667
    assert rows["de"]["token_share"] == 0.3333
    assert rows["en"]["tokens_bpe"] >= rows["en"]["tokens_ws"]
    assert 0.0 <= rows["en"]["avg_quality"] <= 1.0


def test_funnel_with_trained_quality_classifier(spark):
    """VERDICT r03 #8: the funnel optionally gates on the trained
    hashed-feature classifier instead of the heuristic — mangled docs are
    filtered out, clean ones survive, and the heuristic quality score is
    still reported on survivors."""
    from ndap_data_validator_spark.functions.quality_clf import (
        train_quality_classifier,
    )
    from ndap_data_validator_spark.operators.curate import curate_corpus

    good = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog and runs")
        for i in range(20)
    ]
    bad = [(100 + i, "zzq qqz xkcd qx " * 4) for i in range(10)]
    docs = spark.createDataFrame(good + bad, "doc_id long, text string")
    train = spark.createDataFrame(
        [(t, True) for _, t in good] + [(t, False) for _, t in bad],
        "text string, label boolean",
    )
    model = train_quality_classifier(train, "label", n_buckets=256, seed=3)
    curated, funnel = curate_corpus(
        docs, quality_model=model, clf_n_buckets=256, clf_seed=3,
    )
    stages = {r["stage"]: r["survivors"] for r in funnel.collect()}
    assert stages["ingested"] == 30
    assert stages["quality_gate"] == 20  # classifier drops every mangled doc
    kept = {r["doc_id"] for r in curated.collect()}
    assert kept == {i for i, _ in good}
    assert "quality" in curated.columns  # heuristic still reported


def test_corpus_mixture_temperature_weights(spark):
    from ndap_data_validator_spark.operators.curate import corpus_mixture_report

    # ~9:1 en:und token split
    docs = spark.createDataFrame(
        [(i, "the quick brown fox and the lazy dog again") for i in range(9)]
        + [(9, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9")],
        "doc_id long, text string",
    )
    out = {
        r["lang"]: r.asDict()
        for r in corpus_mixture_report(docs, alpha=0.3).collect()
    }
    shares = {k: v["token_share"] for k, v in out.items()}
    weights = {k: v["mixture_weight"] for k, v in out.items()}
    assert shares["en"] == 0.9 and shares["und"] == 0.1
    # temperature flattens: minority lang is upsampled, majority down
    assert weights["und"] > shares["und"]
    assert weights["en"] < shares["en"]
    assert abs(sum(weights.values()) - 1.0) < 1e-6
    expected_und = (9 ** 0.3) / (9 ** 0.3 + 81 ** 0.3)
    assert weights["und"] == round(expected_und, 4)
    # alpha omitted: column absent (back-compat)
    assert "mixture_weight" not in corpus_mixture_report(docs).columns


def test_funnel_calibrated_keep_fraction(spark):
    """VERDICT r04 #7: quality_keep_fraction calibrates the gate threshold
    to the score distribution (exact distributed percentile) so the
    quality gate keeps ~the target fraction regardless of where the raw
    scores sit."""
    from ndap_data_validator_spark.functions.quality_clf import (
        train_quality_classifier,
    )
    from ndap_data_validator_spark.operators.curate import curate_corpus

    # graded quality: doc i repeats a filler word i times -> scores vary
    # continuously; no planted pass/fail split
    docs = spark.createDataFrame(
        [
            (
                i,
                "the quick brown fox jumps over the lazy dog "
                + " ".join(["zxqj"] * (i % 20)),
            )
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    labeled = docs.withColumn("label", (F.col("doc_id") % 20 < 10))
    model = train_quality_classifier(
        labeled, text_col="text", label_col="label", n_buckets=256, seed=3
    )
    _, funnel = curate_corpus(
        docs, quality_model=model, clf_n_buckets=256, clf_seed=3,
        quality_keep_fraction=0.3,
    )
    stages = {r["stage"]: r["survivors"] for r in funnel.collect()}
    assert stages["ingested"] == 40
    # >= threshold keeps the target fraction up to score ties (scores here
    # cluster by i%20, so ties can round the cut to a neighbouring group)
    assert 8 <= stages["quality_gate"] <= 16
    # heuristic path: same knob without a trained model
    _, funnel2 = curate_corpus(docs, quality_keep_fraction=0.5)
    stages2 = {r["stage"]: r["survivors"] for r in funnel2.collect()}
    assert 16 <= stages2["quality_gate"] <= 24
