"""CCNet-style language-model quality scoring, distributed.

A unigram LM with add-alpha smoothing is trained over a reference corpus
(one token explode + groupBy — a single shuffle on the token), then every
document is scored by its mean negative log-likelihood (cross-entropy in
nats). Low cross-entropy ≈ fluent in-domain prose; high ≈ gibberish or
off-domain — the classic wiki-LM filter signal from CCNet/RefinedWeb, here
reduced to its unigram core so the whole computation stays inside Catalyst
(no external LM, no Python in the hot path).

Plan shape at 100 TB:

  * training is explode → groupBy(token) → one global agg for the totals —
    partial aggregation makes the shuffle carry one row per distinct token
    per map partition, not one per occurrence;
  * scoring is explode → join(lm) → groupBy(doc). The LM table is
    vocabulary-sized (language-bounded, millions of rows at web scale, far
    smaller than the corpus) — AQE broadcasts it when it fits and falls
    back to a shuffle join when it does not, so we do NOT force
    ``broadcast()`` here;
  * unknown tokens get the smoothed floor probability via ``coalesce`` after
    a left join — no second pass.

No counterpart in the reference (it validates tabular CSVs); this extends
its per-column quality checks to the document domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.textstats import words


def _tokens(df: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """Lower-cased whitespace tokens, one row per occurrence."""
    cols = [F.col(id_col)] if id_col else []
    return df.select(
        *cols,
        F.explode(F.transform(words(F.col(text_col)), F.lower)).alias("token"),
    )


def unigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Train the smoothed unigram LM on ``reference``.

    Returns ``(lm, consts)``:

    * ``lm``     — (token, logp) with logp = ln((count + alpha) / denom);
    * ``consts`` — ONE row (total_tokens, vocab_size, unk_logp) where
      ``unk_logp = ln(alpha / denom)`` is the floor for unseen tokens and
      ``denom = total + alpha * (vocab + 1)`` (the +1 reserves the UNK
      event).

    Both frames are exact aggregates — at 100 TB, ``lm`` is the only
    vocabulary-sized artifact and would be persisted as the model.
    """
    counts = _tokens(reference, text_col, None).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # Materialize the vocabulary counts ONCE: `consts` and `lm` both get
    # broadcast downstream, and each broadcast would otherwise re-run the
    # whole reference-corpus token explode+groupBy. The checkpointed frame
    # is vocabulary-sized — exactly the artifact a production run persists
    # as the model.
    counts = counts.localCheckpoint()
    consts = counts.agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
    ).select(
        "total_tokens",
        "vocab_size",
        (
            F.log(F.lit(alpha))
            - F.log(
                F.col("total_tokens")
                + F.lit(alpha) * (F.col("vocab_size") + F.lit(1))
            )
        ).alias("unk_logp"),
    )
    denom = (
        F.col("__total") + F.lit(alpha) * (F.col("__vocab") + F.lit(1))
    )
    lm = (
        counts.crossJoin(
            F.broadcast(
                consts.select(
                    F.col("total_tokens").alias("__total"),
                    F.col("vocab_size").alias("__vocab"),
                )
            )
        )
        .select(
            "token",
            (F.log(F.col("cnt") + F.lit(alpha)) - F.log(denom)).alias("logp"),
        )
    )
    return lm, consts


def doc_cross_entropy(
    docs: DataFrame,
    lm: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the unigram LM →
    (id, n_tokens, cross_entropy). Empty documents score NULL.

    ``round_digits`` rounds the mean (sum order varies across engines, so a
    raw double is not byte-comparable; the rounded value is).
    """
    toks = _tokens(docs, text_col, id_col)
    unk = F.broadcast(consts.select(F.col("unk_logp").alias("__unk")))
    scored = (
        toks.join(lm, "token", "left")
        .crossJoin(unk)
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("__unk")).alias("__lp"),
        )
    )
    ce = -F.avg("__lp")
    if round_digits is not None:
        ce = F.round(ce, round_digits)
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        ce.alias("cross_entropy"),
    )
    # docs with zero tokens never reach the groupBy — restore them as NULLs
    all_ids = docs.select(id_col).distinct()
    return (
        all_ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "cross_entropy",
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    ce_col: str = "cross_entropy",
    cuts: tuple[float, float] = (0.33, 0.67),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by where their LM
    cross-entropy falls in the CORPUS distribution — 'head' is the most
    fluent third, 'tail' the least; CCNet trains on head+middle and drops
    or down-weights tail.

    The cut points are exact distributed percentiles of ``ce_col``
    (``stats.exact_percentiles_distributed`` — one order-statistic pass,
    no all-values buffer), then the labeling is a broadcast-scalar CASE —
    the corpus is never re-shuffled. NULL cross-entropy (empty docs)
    stays NULL."""
    from ndap_data_validator_spark.operators.stats import (
        exact_percentiles_plan,
    )

    # the percentile chain and the returned frame both consume `scored` —
    # checkpoint the doc-sized score frame once instead of re-running the
    # token-explode scoring pipeline for each. LAZY checkpoint + IN-PLAN
    # cuts (r06): the two percentile values ride the returned plan as a
    # broadcast scalar row, so bucketing adds ZERO driver actions (was:
    # one eager checkpoint job + an eager percentile chain).
    scored = scored.localCheckpoint(eager=False)
    plan = exact_percentiles_plan(scored, ce_col, ps=cuts)
    cuts_df = plan.select(
        F.col(plan.columns[1]).alias("__t1"),
        F.col(plan.columns[2]).alias("__t2"),
    )
    ce = F.col(ce_col)
    return scored.crossJoin(F.broadcast(cuts_df)).select(
        *scored.columns,
        # __t1 NULL ⇔ no non-null scores (the old all-NULL-label branch)
        F.when(F.col("__t1").isNull(), F.lit(None).cast("string"))
        .when(ce.isNull(), F.lit(None).cast("string"))
        .when(ce <= F.col("__t1"), F.lit(labels[0]))
        .when(ce <= F.col("__t2"), F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
        .alias(out_col),
    )


def perplexity(ce_col) -> "F.Column":
    """exp(cross_entropy) — convenience for thresholding in ppl space."""
    return F.exp(ce_col)


__all__ = [
    "unigram_lm",
    "doc_cross_entropy",
    "perplexity",
]
