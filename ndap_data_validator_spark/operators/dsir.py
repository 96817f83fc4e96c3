"""DSIR — Data Selection with Importance Resampling (Xie et al., NeurIPS
2023), distributed and pure-Catalyst.

The production question: given a huge RAW web corpus and a small TARGET
corpus that looks like the data you wish you had (wiki+books, a curated
domain mix), pick the raw documents most target-like. DSIR's answer is
importance weighting in a hashed n-gram feature space:

  1. featurize every document as a bag of unigrams + bigrams hashed into
     ``n_buckets`` slots (the hashing trick — fixed-size model regardless
     of vocabulary);
  2. fit two smoothed categorical distributions over buckets — p (target)
     and q (raw);
  3. per raw document, the importance log-weight is
     ``log w(x) = Σ_features [ln p(b) − ln q(b)]``;
  4. resample without replacement via Gumbel-top-k: rank on
     ``priority = log w + Gumbel(0,1)`` and keep the top ``keep_fraction``
     — the noisy rank IS the importance-resampling step (deterministic
     here: the Gumbel variate derives from a hash of the document key, the
     same hash-gate philosophy as ``operators/sample.py``).

Plan shape at 100 TB:

  * featurization is a per-row array expression (no shuffle);
  * each distribution fit is explode → groupBy(bucket) — ONE token-sized
    shuffle that collapses map-side to ≤ ``n_buckets`` rows per map
    partition; the target corpus is small by definition;
  * the bucket→weight table is ≤ ``n_buckets`` rows — broadcast for
    scoring, so the raw corpus is never shuffled to be scored; the only
    corpus-sized exchange is the per-doc groupBy(id) sum, which partial
    aggregation collapses to ~one row per document per map partition;
  * the keep threshold is the exact distributed order statistic of the
    priority column (``stats.exact_percentiles_distributed`` — no
    all-values buffer, no global sort), so selection is a broadcast-scalar
    filter, not a rank window.

Every log term is kept as a ``ln(a) − ln(b)`` difference (the ``lm.py``
bit-parity formulation) and the hash is the md5-portable one when
``hash_fn='md5'``, so DuckDB replays fit → score → Gumbel → threshold end
to end. Production swaps in ``xxhash64``.

No counterpart in the reference (tabular validation only); this is a
north-star training-data op alongside the quality classifier
(``functions/quality_clf.py``) and the unigram-LM filter
(``functions/lm.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.porthash import portable_hash64
from ndap_data_validator_spark.functions.textstats import words

_GUMBEL_MOD = 1 << 20


def ngram_features(col: Column) -> Column:
    """Unigram + bigram feature array (bag — duplicates kept; DSIR counts
    occurrences) of the casefolded whitespace tokens. Empty text → empty
    array."""
    toks = F.transform(words(col), F.lower)
    k = F.size(toks) - 1
    bigrams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        )
    )
    return F.concat(toks, bigrams)


def _bucket(feat: Column, n_buckets: int, seed: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        h = portable_hash64(feat, seed=seed)
    else:
        h = F.abs(F.xxhash64(feat, F.lit(seed)))
    return F.pmod(h, F.lit(n_buckets))


def _doc_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str | None,
    n_buckets: int,
    seed: int,
    hash_fn: str,
) -> DataFrame:
    cols = [F.col(id_col)] if id_col else []
    ex = df.select(
        *cols, F.explode(ngram_features(F.col(text_col))).alias("__feat")
    )
    return ex.select(
        *([id_col] if id_col else []),
        _bucket(F.col("__feat"), n_buckets, seed, hash_fn).alias("bucket"),
    )


def fit_importance_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    seed: int = 13,
    hash_fn: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """Fit p (target) and q (raw) over hashed-n-gram buckets. Returns
    ``(weights, consts)`` (the ``lm.py`` shape):

    * ``weights`` — (bucket, w) for every bucket observed in EITHER
      corpus, with ``w[b] = (ln(cnt_t[b]+α) − ln(T+α·B)) −
      (ln(cnt_r[b]+α) − ln(R+α·B))``; a bucket unseen on one side takes
      cnt=0 (the smoothing floor). ≤ ``n_buckets`` rows — always
      broadcastable.
    * ``consts`` — ONE row (total_target, total_raw, w_unseen) where
      ``w_unseen`` is the both-unseen floor weight, the scoring fallback
      for buckets outside the table."""
    tc = (
        _doc_buckets(target, text_col, None, n_buckets, seed, hash_fn)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    rc = (
        _doc_buckets(raw, text_col, None, n_buckets, seed, hash_fn)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_r"))
    )
    joined = tc.join(rc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
        F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
    )
    # Materialize the bucket-count table (≤ n_buckets rows) ONCE. Both
    # derived frames below — `weights` and `consts` — are broadcast by the
    # scorer, and each broadcast would otherwise re-run the whole fit:
    # two explode→groupBy passes over BOTH corpora per consumer. At 100 TB
    # that re-explodes the raw token stream three times for one fit; the
    # checkpoint caps it at exactly one pass. LAZY (r06): the first
    # consumer's job materializes it — an eager checkpoint paid one extra
    # driver round-trip purely for scheduling.
    joined = joined.localCheckpoint(eager=False)
    a, b = F.lit(float(alpha)), F.lit(float(alpha * n_buckets))
    consts = joined.agg(
        F.sum("cnt_t").alias("total_target"),
        F.sum("cnt_r").alias("total_raw"),
    ).select(
        "total_target",
        "total_raw",
        (
            (F.log(a) - F.log(F.col("total_target") + b))
            - (F.log(a) - F.log(F.col("total_raw") + b))
        ).alias("w_unseen"),
    )
    weights = joined.crossJoin(
        F.broadcast(
            consts.select(
                F.col("total_target").alias("__T"),
                F.col("total_raw").alias("__R"),
            )
        )
    ).select(
        "bucket",
        (
            (F.log(F.col("cnt_t") + a) - F.log(F.col("__T") + b))
            - (F.log(F.col("cnt_r") + a) - F.log(F.col("__R") + b))
        ).alias("w"),
    )
    return weights, consts


def gumbel_key(key: Column, seed: int = 97) -> Column:
    """Deterministic standard-Gumbel variate from a hash of ``key``:
    u = (h mod 2^20 + 0.5) / 2^20 ∈ (0,1) exactly dyadic, g = −ln(−ln u).
    A pure function of the key — stable under repartition/retry and
    replayable by any engine with the md5-portable hash."""
    u = (
        F.pmod(portable_hash64(key, seed=seed), F.lit(_GUMBEL_MOD)) + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_MOD))
    return -F.log(-F.log(u))


def gumbel_key_sql(key_expr: str, seed: int = 97) -> str:
    """DuckDB rendering of :func:`gumbel_key`."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql

    h = portable_hash64_sql(key_expr, seed)
    return (
        f"-ln(-ln((({h}) % {_GUMBEL_MOD} + 0.5) / {float(_GUMBEL_MOD)}))"
    )


def score_importance(
    docs: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    seed: int = 13,
    hash_fn: str = "md5",
    gumbel_seed: int = 97,
    round_digits: int = 6,
) -> DataFrame:
    """Score every document against the fitted weight table →
    (id, n_features, log_w, priority). Empty documents carry log_w = 0
    (empty product) and compete on their Gumbel draw alone.

    The weight table is broadcast (≤ n_buckets rows); the corpus never
    shuffles except the per-doc sum."""
    feats = _doc_buckets(docs, text_col, id_col, n_buckets, seed, hash_fn)
    unseen = F.broadcast(consts.select(F.col("w_unseen").alias("__unseen")))
    scored = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .crossJoin(unseen)
        .select(
            id_col, F.coalesce(F.col("w"), F.col("__unseen")).alias("__w")
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"),
        F.round(F.sum("__w"), round_digits).alias("log_w"),
    )
    all_ids = docs.select(id_col).distinct()
    base = all_ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )
    return base.withColumn(
        "priority",
        F.round(
            F.col("log_w") + gumbel_key(F.col(id_col), seed=gumbel_seed),
            round_digits,
        ),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_fraction: float = 0.25,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    seed: int = 13,
    hash_fn: str = "md5",
    gumbel_seed: int = 97,
    round_digits: int = 6,
) -> DataFrame:
    """End-to-end DSIR: fit → score → Gumbel-top-(keep_fraction·n) →
    (id, n_features, log_w, priority, keep). ``keep`` is
    ``priority >= t`` where ``t`` is the exact (1−keep_fraction) percentile
    of the priority distribution, computed by the distributed
    order-statistic plan (no all-values buffer, no global rank window) —
    ties at the threshold are kept, so the selected count is ≥ the target
    (deterministically, in every engine)."""
    from ndap_data_validator_spark.operators.curate import (
        _score_threshold_plan,
    )

    weights, consts = fit_importance_weights(
        target, raw, text_col, n_buckets, alpha, seed, hash_fn
    )
    scored = score_importance(
        raw, weights, consts, text_col, id_col, n_buckets, seed, hash_fn,
        gumbel_seed, round_digits,
    )
    # The threshold chain and the returned frame both consume `scored`;
    # without a materialization the whole fit+score pipeline runs twice.
    # localCheckpoint stores the doc-sized (id, log_w, priority) frame —
    # far smaller than the token stream it derives from — which is exactly
    # what a production two-pass (threshold, then filter) would persist.
    # LAZY checkpoint + IN-PLAN threshold (r06): the exact-percentile cut
    # rides the returned plan as a broadcast scalar, so end-to-end DSIR is
    # ZERO driver actions until the caller's own (was: two eager
    # checkpoints + an eager percentile chain).
    scored = scored.localCheckpoint(eager=False)
    thr = _score_threshold_plan(scored, "priority", keep_fraction)
    return scored.crossJoin(F.broadcast(thr)).select(
        *scored.columns,
        (F.col("priority") >= F.col("__thr")).alias("keep"),
    )
