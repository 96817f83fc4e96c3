"""Generate PLANS.md: formatted physical plans for the engine's key
operators with the properties we iterate on (single scan, partial agg,
pushdown, broadcast, no stray exchanges) asserted in prose.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import io
import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ndap_data_validator_spark.session import get_spark
from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.operators.uniqueness import duplicate_keys_hashed
from ndap_data_validator_spark.operators.referential import ri_violations
from ndap_data_validator_spark.rules.model import ColumnAssignment
from ndap_data_validator_spark.sources.datagen import tool_catalog, transcripts

SF = "/root/testdata/sf0.01"


def fmt(df, max_lines: int = 60) -> str:
    """Capture explain('formatted'), keeping the operator tree + scan
    details and trimming the long expression dumps."""
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return "\n".join(buf.getvalue().splitlines()[:max_lines])


def _ks_lazy_plan(df):
    """Rebuild the lazy KS aggregate (per-value counts → _ks_agg_plan) the
    way ks_exact_distributed does internally, without executing it."""
    from ndap_data_validator_spark.operators.drift import _ks_agg_plan

    a = df.where(F.col("turn_idx") % 2 == 0).select(
        F.col("turn_idx").cast("double").alias("v"),
        F.lit(1).alias("__a"), F.lit(0).alias("__b"),
    )
    b = df.where(F.col("turn_idx") % 2 == 1).select(
        F.col("turn_idx").cast("double").alias("v"),
        F.lit(0).alias("__a"), F.lit(1).alias("__b"),
    )
    counts = a.unionByName(b).groupBy("v").agg(
        F.sum("__a").alias("a_cnt"), F.sum("__b").alias("b_cnt")
    )
    return _ks_agg_plan(counts, 32)


def _decontam(spark, df):
    from ndap_data_validator_spark.operators.decontaminate import (
        benchmark_ngram_hashes,
        decontaminate,
    )

    docs = df.select(F.col("conv_id").alias("doc_id"), F.col("text"))
    bench = docs.limit(50)
    return decontaminate(docs, benchmark_ngram_hashes(bench, n=5), n=5)


def _curation_funnel(spark, df):
    from ndap_data_validator_spark.operators.curate import curate_corpus

    docs = df.where(F.col("text").isNotNull()).select(
        F.col("conv_id").alias("doc_id"), F.col("text")
    )
    _, funnel = curate_corpus(docs, None)
    return funnel


def _lm_score(spark, df):
    from ndap_data_validator_spark.functions.lm import doc_cross_entropy, unigram_lm

    docs = df.where(F.col("text").isNotNull()).select(
        F.col("conv_id").alias("doc_id"), F.col("text")
    )
    lm, consts = unigram_lm(docs)
    return doc_cross_entropy(docs, lm, consts)


def _dsir(spark, df):
    from ndap_data_validator_spark.operators.dsir import (
        fit_importance_weights,
        score_importance,
    )

    docs = df.where(F.col("text").isNotNull()).select(
        F.col("conv_id").alias("doc_id"), F.col("text")
    )
    target = docs.where(F.col("doc_id").endswith("0")).select("text")
    weights, consts = fit_importance_weights(target, docs, n_buckets=4096)
    return score_importance(docs, weights, consts, n_buckets=4096)


def _jaccard(spark, df):
    from ndap_data_validator_spark.operators.dedup import ngram_jaccard_pairs

    docs = df.where(F.col("turn_idx") == 0).select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    return ngram_jaccard_pairs(docs, id_col="doc_id", n=3, threshold=0.5)


def _training_order(spark, df):
    from ndap_data_validator_spark.operators.order import training_order

    docs = df.where(F.col("turn_idx") == 0).select(
        F.col("conv_id").alias("doc_id"),
        F.when(F.col("tool").isNotNull(), "tooled").otherwise("plain").alias(
            "source"
        ),
    )
    return training_order(
        docs, {"tooled": 2.5, "plain": 1.0}, order_partitions=8
    )


def _json_report(spark, df):
    from ndap_data_validator_spark.operators.jsonschema import (
        json_schema_report,
    )

    jdf = df.where(F.col("tool").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.concat(
            F.lit('{"name":"'), F.col("tool"), F.lit('","retries":1}')
        ).alias("payload"),
    )
    return json_schema_report(
        jdf,
        "payload",
        "name string, retries int",
        required=("name", "retries"),
        id_cols=("conv_id", "turn_idx"),
    )


def _bpe_ids(spark, df):
    from ndap_data_validator_spark.functions.bpe import bpe_encode_ids, bpe_vocab

    docs = df.where(F.col("turn_idx") == 0).select(
        F.col("conv_id").alias("doc_id"), "text"
    )
    vocab_df, _ = bpe_vocab(docs.limit(200), "text")
    return bpe_encode_ids(docs, "doc_id", "text", vocab_df)


def main() -> None:
    spark = get_spark(app_name="dump-plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import os
    path = "/tmp/plans_transcripts"
    if not os.path.exists(path + "/_SUCCESS"):
        transcripts(spark, 200_000, 500, seed=42, num_partitions=16).write.mode(
            "overwrite"
        ).parquet(path)
    df = spark.read.parquet(path)
    assigns = [
        ColumnAssignment("conv_id", "Location", regex=r"^conv-\d{6}$"),
        ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
        ColumnAssignment("role", "Others", regex=r"^(user|assistant|tool)$"),
        ColumnAssignment("text", "Location"),
        ColumnAssignment("tool", "Others"),
        ColumnAssignment("ts", "Others"),
    ]
    res = ValidationEngine().validate(
        df, assigns,
        partition_by=F.pmod(F.xxhash64("conv_id"), F.lit(16)),
        order_by=["conv_id", "turn_idx"], cache_aggregates=False,
    )
    res_cap = ValidationEngine().validate(
        df, assigns,
        partition_by=F.pmod(F.xxhash64("conv_id"), F.lit(16)),
        order_by=["conv_id", "turn_idx"], cache_aggregates=False,
        max_violations_per_rule=10,
    )

    def _profile_agg(spark, frame):
        from ndap_data_validator_spark.rules.inference import profile_agg_frame

        return profile_agg_frame(
            frame.select("conv_id", "turn_idx", "role", "ts")
        )

    sections = [
        (
            "Validation shared scan → per-column report",
            res.per_column_report,
            "One parquet scan → partial HashAggregate (all rule counters "
            "map-side) → tiny Exchange on partition_id → final HashAggregate "
            "→ report expressions. No second pass, no per-column jobs.",
        ),
        (
            "Violations (row-level output)",
            res.violations,
            "Same compiled predicates as filters; repartition(partition_id) "
            "+ sortWithinPartitions — no global range sort / sampling pass.",
        ),
        (
            "Hashed uniqueness (two-phase)",
            duplicate_keys_hashed(df, ["conv_id", "turn_idx"]),
            "Phase 1 shuffles 8-byte xxhash64 keys only; the suspicious set "
            "joins back semi-style with AQE choosing broadcast vs shuffle "
            "from its runtime size; phase 2 exact-verifies on real keys.",
        ),
        (
            "Sessionization (lag → run-sum → rollup)",
            __import__(
                "ndap_data_validator_spark.operators.sessions", fromlist=["s"]
            ).session_rollup(
                df.where(F.col("ts").isNotNull()),
                key_col="conv_id", ts_col="ts", timeout_sec=600,
                order_tiebreak="turn_idx",
            ),
            "ONE Exchange on the key; one Sort feeds BOTH windows (lag and "
            "running sum share the ordering); the (key, session_id) rollup "
            "aggregates with NO second exchange — HashPartitioning(key) "
            "already satisfies the clustered distribution of the superset "
            "group keys.",
        ),
        (
            "Sequence checks (one window, five rules)",
            __import__(
                "ndap_data_validator_spark.operators.convchecks", fromlist=["c"]
            ).sequence_checks(
                df, key_col="conv_id", order_col="turn_idx", ts_col="ts",
                role_col="role", expected_step=1, max_gap_sec=600,
                allowed_transitions=frozenset(
                    [("user", "assistant"), ("assistant", "tool"),
                     ("tool", "user")]
                ),
            ),
            "All five conversation-order rules (turn contiguity, ts "
            "monotonicity, role alternation, max silence, role-transition "
            "FSM whitelist) compile into ONE window over (conv_id, "
            "turn_idx): a single Exchange on the conversation key and a "
            "single Sort feed every lag; the checks — including the FSM's "
            "literal-pair disjunction — are array_compact+explode in the "
            "same projection. Adding a rule adds zero passes and zero "
            "shuffles.",
        ),
        (
            "Violation-row cap (bounded report sink)",
            res_cap.violations,
            "max_violations_per_rule adds ONE hash Exchange on (partition, "
            "column, reason) over the already-filtered violation stream — "
            "and Catalyst inserts WindowGroupLimit on BOTH sides of it "
            "(the rank-limit pushdown): each map task locally keeps only "
            "its first K per group BEFORE the shuffle, so even the "
            "exchange is bounded at K x groups x tasks, and the final "
            "output at K x rules x partitions however badly a rule "
            "breaks. The aggregate counts never see the cap.",
        ),
        (
            "Rule-bootstrap profile (one aggregate pass)",
            _profile_agg(spark, df),
            "Every per-column profile statistic (null counts, "
            "approx_count_distinct sketches, min/max, regex-candidate "
            "match fractions) rides ONE partial HashAggregate over the "
            "scan — a single 1-row agg no matter how many columns or "
            "candidates; the exact-domain follow-up runs only for "
            "sketch-small string columns.",
        ),
        (
            "Deterministic hash-gate sample (pure filter)",
            __import__(
                "ndap_data_validator_spark.operators.sample", fromlist=["s"]
            ).deterministic_sample(df, "conv_id", 0.1, seed=7),
            "The gate is a scan-level Filter — no shuffle, no sampling "
            "operator state; partitioning/engine-independent by "
            "construction.",
        ),
        (
            "Exact two-sample KS (distributed)",
            _ks_lazy_plan(df),
            "groupBy(value) partial counts → window partitioned by the "
            "deterministic range id (each task sorts one slice) → broadcast "
            "offsets → max |ΔCDF|. The only single-partition window is over "
            "the ≤33 per-slice totals — partition-count-sized, never "
            "data-sized. (The public ks_exact_distributed materializes this "
            "plan eagerly so its per-value-counts cache is always released.)",
        ),
        (
            "Referential integrity (broadcast anti-join)",
            ri_violations(df, "tool", tool_catalog(spark), "tool_id"),
            "Dimension broadcast → BroadcastHashJoin LeftAnti; the fact side "
            "never shuffles.",
        ),
        (
            "Benchmark decontamination (n-gram collision)",
            _decontam(spark, df),
            "The benchmark's distinct n-gram hash set is BROADCAST (eval "
            "suites are MBs); the corpus side is one projection (tokenize → "
            "n-gram → hash) + explode + a single groupBy(doc) with map-side "
            "partial aggregation — the shuffle carries (doc_id, two longs), "
            "never text. No corpus-sized join state anywhere.",
        ),
        (
            "Stratified hash-gate sample (pure filter)",
            __import__(
                "ndap_data_validator_spark.operators.sample", fromlist=["s"]
            ).stratified_sample(
                df, "role", {"user": 0.5, "assistant": 0.1}, "conv_id", seed=3
            ),
            "Per-stratum integer thresholds fold into ONE scan-level Filter "
            "(CASE over the rate map + the hash gate) — no shuffle, no "
            "sampling state, pushdown applies.",
        ),
        (
            "Curation funnel (single-scan survivor report)",
            _curation_funnel(spark, df),
            "All per-stage gate FLAGS (quality, language, dedup-keeper) are "
            "computed in one projection over one scan; the only exchange is "
            "the fingerprint window for the exact-dedup keeper bit; the "
            "5-stage survivor table is ONE aggregate over the flags "
            "(map-side partial), exploded to rows — counting survivors per "
            "stage costs no extra passes over the corpus.",
        ),
        (
            "Merge-table BPE encode (pure-Catalyst replace chain)",
            df.select(
                "conv_id",
                __import__(
                    "ndap_data_validator_spark.functions.bpe", fromlist=["b"]
                ).bpe_token_count(F.col("text")).alias("n")
            ),
            "The entire tokenizer — pretokenize regex, sentinel wrap, ~44 "
            "merge replaces, count — is ONE Project inside whole-stage "
            "codegen: no shuffle, no Python, no UDF. At 100 TB this is a "
            "scan-level projection persisted as an index column.",
        ),
        (
            "No-split packing (one exchange + per-shard Arrow sweep)",
            __import__(
                "ndap_data_validator_spark.operators.pack", fromlist=["p"]
            ).pack_nosplit(
                df.select(F.col("conv_id").alias("doc_id"),
                          (F.col("turn_idx") + 1).alias("n_tokens")),
                budget=256, n_shards=8,
            ),
            "Exactly ONE Exchange (hashpartitioning on the shard key) "
            "feeding FlatMapGroupsInPandas — the greedy bin fold is "
            "sequential per shard, Arrow-batched, and shards are the "
            "parallelism unit; nothing global, nothing driver-side.",
        ),
        (
            "Hashed-feature quality classifier (broadcast weights)",
            (lambda qc, docs: qc.score_quality(
                docs,
                *qc.train_quality_classifier(
                    docs.withColumn("label", F.col("doc_id").endswith("0")),
                    "label", n_buckets=128,
                ),
                n_buckets=128,
            ))(
                __import__(
                    "ndap_data_validator_spark.functions.quality_clf",
                    fromlist=["q"],
                ),
                df.where(F.col("turn_idx") == 0).select(
                    F.col("conv_id").alias("doc_id"), F.col("text")
                ),
            ),
            "Training is explode → groupBy(bucket) with map-side partial "
            "aggregation (bucket-count-sized shuffle). Scoring joins the "
            "bucket→weight table via an explicit BroadcastHashJoin (the "
            "table is n_buckets rows by construction) — the corpus never "
            "shuffles to be scored; the per-doc sum is one groupBy(doc).",
        ),
        (
            "Fuzzy decontamination (cross-corpus LSH, broadcast benchmark)",
            (lambda dc, d: dc.decontaminate_fuzzy(
                d, d.where(F.col("doc_id").endswith("0")), shingle_n=2
            ))(
                __import__(
                    "ndap_data_validator_spark.operators.decontaminate",
                    fromlist=["d"],
                ),
                df.where(F.col("turn_idx") == 0).select(
                    F.col("conv_id").alias("doc_id"), F.col("text")
                ),
            ),
            "Both sides share the one-shuffle minhash signature plan; the "
            "benchmark's banded index and shingle sets ride "
            "BroadcastHashJoins (benchmark is eval-suite-sized by "
            "contract), so the corpus is never shuffled to be matched; "
            "the verify joins shingle sets for candidates only and the "
            "rollup is one groupBy(doc).",
        ),
        (
            "Unigram-LM cross-entropy (train + score)",
            _lm_score(spark, df),
            "Training is explode → groupBy(token) with map-side partial "
            "aggregation (the shuffle carries one row per distinct token "
            "per map partition). Scoring joins the vocabulary-sized LM "
            "table — AQE picks broadcast when it fits — and the per-doc "
            "mean is one groupBy(doc). The smoothed UNK floor rides a "
            "1-row broadcast; no second pass, no Python.",
        ),
        (
            "DSIR importance scoring (fit + score)",
            _dsir(spark, df),
            "Each distribution fit is explode → groupBy(bucket), "
            "collapsing map-side to ≤ n_buckets rows per map partition. "
            "The bucket→weight table (≤ n_buckets rows) and the 1-row "
            "unseen-floor consts are explicit broadcasts, so the raw "
            "corpus is never shuffled to be scored — its only exchange "
            "is the per-doc partial-aggregated sum. Gumbel priority is a "
            "scan-level expression on the result.",
        ),
        (
            "Training-order manifest (epoch explode + range-ordered stream)",
            _training_order(spark, df),
            "The epoch plan rides a broadcast join (plan table is "
            "source-count-sized); the copy expansion is a scan-level "
            "Generate over sequence(0, n_copies-1) with the fractional "
            "epoch a pure hash-gate predicate — no shuffle to expand. The "
            "only exchange is the final repartitionByRange on the hash "
            "order key (Spark samples range bounds), so the global "
            "training order never funnels through one reducer.",
        ),
        (
            "Exact n-gram Jaccard verify (inline Generate, sizes post-agg)",
            _jaccard(spark, df),
            "The shingle expression is exploded INLINE in the Generate — "
            "never a pre-aliased array column, which would let "
            "InferFiltersFromGenerate clone the whole (CodegenFallback) "
            "shingle tree into a per-scan-row Filter (measured 15x). The "
            "token self-join shuffle carries (id, tok) only; per-doc set "
            "sizes (one row per doc) join onto the candidate-pair "
            "aggregate, which is orders of magnitude smaller than the "
            "token stream.",
        ),
        (
            "Key-skew heavy-hitter report (TakeOrdered, no global sort)",
            (lambda sk: sk.key_skew_report(df, "conv_id", top_n=5))(
                __import__(
                    "ndap_data_validator_spark.operators.skew",
                    fromlist=["s"],
                )
            ),
            "Per-key counts are one map-side-combined shuffle, "
            "localCheckpoint'ed because two consumers (top-N, stats row) "
            "would each re-run the corpus shuffle otherwise. Top-N plans "
            "as TakeOrderedAndProject — per-task n-row heaps merged on "
            "the driver, never an Exchange rangepartitioning — and the "
            "1-row stats aggregate rides a BroadcastNestedLoopJoin onto "
            "≤ top_n rows. The only Sort is inside the ≤ top_n-row "
            "window stage.",
        ),
        (
            "Row-level CHECK constraints (scan-level, zero shuffles)",
            (lambda ck, cr: ck.check_violations(
                df,
                [
                    cr("turn_nonneg", "turn_idx >= 0"),
                    cr("text_or_tool",
                       "text IS NOT NULL OR tool IS NOT NULL"),
                ],
                key_cols=("conv_id", "turn_idx"),
            ))(
                __import__(
                    "ndap_data_validator_spark.operators.checks",
                    fromlist=["c"],
                ),
                __import__(
                    "ndap_data_validator_spark.rules.model",
                    fromlist=["m"],
                ).CheckRule,
            ),
            "Every rule expression evaluates inside the same whole-stage-"
            "codegen projection over the scan (array_compact + Generate "
            "explode); violation rows are a Filter on the array size. NO "
            "Exchange anywhere in the plan — the family costs one shared "
            "pass regardless of rule count, and the summary variant is "
            "the same expressions under ONE partial-aggregated agg.",
        ),
        (
            "JSON payload validation (report)",
            _json_report(spark, df),
            "Well-formedness probe, presence probes, and the typed "
            "from_json parse all evaluate inside one whole-stage-codegen "
            "projection over the scan — NO Exchange anywhere in the "
            "per-row report plan (the summary adds one partial-aggregated "
            "1-row agg).",
        ),
        (
            "BPE integer token ids (encode)",
            _bpe_ids(spark, df),
            "The replace-chain stream and the token posexplode are "
            "projections over the scan (whole-stage codegen, no Python); "
            "the metadata-sized vocab joins as a BroadcastHashJoin (never "
            "shuffles); the ONLY Exchange is the groupBy that reassembles "
            "ids in position order, keyed by the internal row id so "
            "duplicate document keys stay per-row.",
        ),
        (
            "Dataset-level metric expectations (one shared aggregate)",
            (lambda exp: exp.metric_expectations(
                df,
                [
                    exp.MetricRule("rows", "row_count", min_bound=1),
                    exp.MetricRule("text_nulls", "null_fraction",
                                   column="text", max_bound=0.05),
                    exp.MetricRule("turn_mean", "mean", column="turn_idx",
                                   min_bound=0, max_bound=1e6),
                    exp.MetricRule("conv_ratio", "distinct_ratio",
                                   column="conv_id", min_bound=0.0,
                                   max_bound=1.0),
                    exp.MetricRule("roles", "compliance",
                                   expression="role IN ('user','assistant','tool')",
                                   min_bound=0.9),
                ],
                partition_by=F.pmod(F.xxhash64("conv_id"), F.lit(16)),
            ))(
                __import__(
                    "ndap_data_validator_spark.operators.expectations",
                    fromlist=["e"],
                )
            ),
            "Every MetricRule (row count, null fraction, mean, distinct "
            "ratio, compliance) evaluates in ONE HashAggregate pair over "
            "one scan — map-side partials, a single tiny Exchange on the "
            "partition key, verdict booleans as expressions over the "
            "aggregate row (array-of-structs + Generate). No joins, no "
            "second pass, no driver collect; adding rules adds agg "
            "expressions, never stages.",
        ),
        (
            "Keyed snapshot reconciliation (one full-outer join)",
            (lambda rec: rec.reconcile_summary(
                df.select("conv_id", "turn_idx", "role", "text"),
                df.select("conv_id", "turn_idx", "role", "text")
                .where(F.col("turn_idx") % 97 != 3),
                ["conv_id", "turn_idx"],
            ))(
                __import__(
                    "ndap_data_validator_spark.operators.reconcile",
                    fromlist=["r"],
                )
            ),
            "Each side shuffles exactly ONCE into a full-outer sort-merge "
            "join on the key (AQE skew-splits a hot key); every per-column "
            "verdict is a null-safe <=> expression in the join's "
            "projection, and the summary is one map-side-combined "
            "HashAggregate over it. No cartesian, no nested-loop, no "
            "second pass; only compared columns travel.",
        ),
        (
            "Expected-partition completeness census",
            (lambda comp: comp.partition_completeness(
                df.withColumn("p", F.substring("conv_id", 1, 9)),
                "p",
                [f"conv-{i:04d}" for i in range(30)],
            ))(
                __import__(
                    "ndap_data_validator_spark.operators.completeness",
                    fromlist=["c"],
                )
            ),
            "The corpus shrinks to |distinct keys| in one map-side-combined "
            "groupBy; the expected manifest enters as a JVM Range+Generate "
            "literal (never a Python-RDD frame) and joins the counts at "
            "metadata size — AQE picks the join; statuses are projection "
            "CASEs. Output is O(|expected| + |unexpected|).",
        ),
    ]

    out = [
        "# PLANS — physical-plan evidence for the core operators",
        "",
        "Generated by `python tools/dump_plans.py` (sf0.01-scale inputs; the",
        "plan SHAPE is scale-independent). Each section states the property",
        "the plan must exhibit, then the first lines of",
        "`.explain('formatted')` output.",
        "",
    ]
    for title, frame, prose in sections:
        out += [f"## {title}", "", prose, "", "```", fmt(frame), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
