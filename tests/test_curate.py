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
