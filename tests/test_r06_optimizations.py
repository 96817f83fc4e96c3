"""Focused tests for the r06 optimization-round internals: every rewrite
that changed HOW an operator computes (never WHAT) gets an equivalence
check against the path it replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.stats import (
    exact_percentiles_distributed,
    exact_percentiles_plan,
)


@pytest.fixture(scope="module")
def spark():
    from ndap_data_validator_spark.session import get_spark

    return get_spark(app_name="r06-opt-tests", master="local[4]")


def test_percentiles_plan_matches_eager(spark):
    """The lazy in-plan interpolation twin must be BIT-identical to the
    eager driver-side interpolation (same doubles, same op order)."""
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 541).cast("double").alias("v")
    )
    eager = exact_percentiles_distributed(df, "v", ps=(0.25, 0.5, 0.9)).first()
    lazy = exact_percentiles_plan(df, "v", ps=(0.25, 0.5, 0.9)).first()
    assert eager["column"] == lazy["column"] == "v"
    for name in ("p25", "p50", "p90"):
        assert eager[name] == lazy[name]  # exact, not approx


def test_percentiles_plan_empty_input(spark):
    """Empty / all-null input → NULL percentiles in both twins."""
    df = spark.range(0, 5).select(F.lit(None).cast("double").alias("v"))
    eager = exact_percentiles_distributed(df, "v", ps=(0.5,)).first()
    lazy = exact_percentiles_plan(df, "v", ps=(0.5,)).first()
    assert eager["p50"] is None and lazy["p50"] is None


def test_score_threshold_plan_matches_eager(spark):
    from ndap_data_validator_spark.operators.curate import (
        _score_threshold,
        _score_threshold_plan,
    )

    df = spark.range(0, 200).select(
        (F.col("id") % 17).cast("double").alias("score")
    )
    t_eager = _score_threshold(df, "score", 0.25)
    t_lazy = _score_threshold_plan(df, "score", 0.25).first()["__thr"]
    assert t_eager == t_lazy
    # empty input → -inf fallback (keep everything) in both
    empty = df.where(F.lit(False))
    assert _score_threshold(empty, "score", 0.25) == float("-inf")
    assert (
        _score_threshold_plan(empty, "score", 0.25).first()["__thr"]
        == float("-inf")
    )


def test_embedding_neardup_broadcast_equivalent(spark):
    """broadcast_vectors=True is a join-STRATEGY opt-in: identical pairs
    and cosines to the default shuffle-attach path."""
    from ndap_data_validator_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    dim = 8
    base = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.pmod(F.xxhash64(F.col("id") % 10, i), F.lit(100))
                       .cast("double") / 50.0 - 1.0),
        ).alias("embedding"),
    )
    kw = dict(dim=dim, threshold=0.99, n_planes=4, n_tables=2, seed=7)
    a = sorted(
        tuple(r) for r in embedding_near_duplicates(base, **kw).collect()
    )
    b = sorted(
        tuple(r)
        for r in embedding_near_duplicates(
            base, broadcast_vectors=True, **kw
        ).collect()
    )
    assert a == b and len(a) > 0


def test_duplicate_keys_hashed_isin_and_join_paths_agree(spark):
    """The r06 bounded-isin phase 2 ≡ the join fallback ≡ the exact
    groupBy census (max_exact_hashes=0 forces the fallback)."""
    from ndap_data_validator_spark.operators.uniqueness import (
        duplicate_keys,
        duplicate_keys_hashed,
    )

    df = spark.range(0, 500).select(
        F.concat(F.lit("k-"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("sub"),
    )
    exact = sorted(tuple(r) for r in duplicate_keys(df, ["k", "sub"]).collect())
    via_isin = sorted(
        tuple(r) for r in duplicate_keys_hashed(df, ["k", "sub"]).collect()
    )
    via_join = sorted(
        tuple(r)
        for r in duplicate_keys_hashed(
            df, ["k", "sub"], max_exact_hashes=0
        ).collect()
    )
    assert exact == via_isin == via_join and len(exact) > 0


def test_duplicate_keys_hashed_no_duplicates(spark):
    """All-unique keys → empty result via the constant-false filter."""
    from ndap_data_validator_spark.operators.uniqueness import (
        duplicate_keys_hashed,
    )

    df = spark.range(0, 100).select(F.col("id").alias("k"))
    assert duplicate_keys_hashed(df, ["k"]).count() == 0


def test_bpe_train_minby_argmax_matches_sorted_top1(spark):
    """The min_by struct-ordered argmax must reproduce the old
    orderBy(desc count, asc lhs, asc rhs).limit(1) winner each round —
    checked by replaying training against a brute-force driver-side
    implementation of the same tie-break."""
    from ndap_data_validator_spark.functions.bpe import bpe_train_merges

    rows = [
        (0, "the cat and the hat and the bat",),
        (1, "the cat and the mat",),
        (2, "a hat and a bat and a cat",),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    merges = bpe_train_merges(docs, "text", num_merges=4)
    assert len(merges) == 4
    # re-derive round 1's argmax by brute force over the corpus state
    import collections

    def pairs_of(texts, applied):
        cnt = collections.Counter()
        for t in texts:
            import re

            # fixture is lowercase ASCII words + single spaces, where the
            # GPT-2-ish pretokenizer reduces to ' ?[a-z]+' (\p{L} classes
            # are not Python-re syntax)
            for pt in re.findall(r" ?[a-z]+", t):
                syms = list(pt)
                for a, b in applied:
                    out, i = [], 0
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == a
                            and syms[i + 1] == b
                        ):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                for x, y in zip(syms, syms[1:]):
                    cnt[(x, y)] += 1
        return cnt

    applied = []
    texts = [t for _, t in rows]
    for lhs, rhs, c in merges:
        cnt = pairs_of(texts, applied)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        assert (lhs, rhs) == best[0] and c == best[1]
        applied.append((lhs, rhs))
