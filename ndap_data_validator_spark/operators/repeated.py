"""Cross-document repeated n-gram detection: for every position in every
document, is the word n-gram starting there shared with at least
``min_docs - 1`` OTHER documents? The per-document rollup (repeated
fraction + longest consecutive repeated run) is the n-gram-granularity
approximation of suffix-array substring deduplication ("Deduplicating
Training Data Makes Language Models Better", Lee et al. 2022): a long
verbatim boilerplate or template span shows up as a run of consecutive
repeated positions, and ``max_repeated_run + n - 1`` bounds its token
length from below.

This is intra-corpus (every document vs the rest) — the companion to
``operators/decontaminate.py`` (corpus vs a broadcast benchmark) and to
``functions/textstats.repetition_ratio`` (WITHIN-document repetition).
No counterpart in the reference (its scope is tabular validation,
utils/validation.py); north-star training-data op.

Plan shape, sized for 100 TB:

  * positional n-grams are ONE scan-level projection + explode; downstream
    frames carry (id, pos, 8-byte hash), never text;
  * the repeated-hash set is ``distinct(id, hash) → groupBy(hash)`` —
    map-side partial aggregation, shuffle keyed on the 8-byte hash; only
    hashes reaching ``min_docs`` survive (typically a small fraction of
    the vocabulary), and AQE broadcasts that side of the marking join
    when it is small enough;
  * the rollup is one window shuffle on the id; the run-length grouping
    ``groupBy(id, run_id)`` and the final ``groupBy(id)`` reuse that same
    hash partitioning (subset-of-keys rule), so no further exchange.

``hash_fn='md5'`` (portable_hash64) makes the whole pipeline replayable by
the DuckDB oracle; production uses xxhash64. A 64-bit collision can only
FLAG an extra position (never unflag), same contract as decontaminate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.dedup import _hash64


def positional_ngrams(col: Column, n: int = 8) -> Column:
    """Array of (pos, ng) structs — the word n-gram starting at each
    1-based token position of the casefolded text. A document shorter than
    ``n`` tokens contributes its whole text as one 'n-gram' at pos 1 (the
    shingles() short-text rule, so the two operators agree on tiny docs)."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    k = F.size(toks) - (n - 1)
    whole = F.array(
        F.struct(F.lit(1).alias("pos"), F.concat_ws(" ", toks).alias("ng"))
    )
    return F.when(k <= 0, whole).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice(toks, i, n)).alias("ng"),
            ),
        )
    )


def repeated_ngram_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    round_digits: int = 4,
) -> DataFrame:
    """Per-document repeated-span report: (id, n_positions, n_repeated,
    repeated_frac, max_repeated_run).

    A position is REPEATED when its n-gram hash occurs in at least
    ``min_docs`` distinct documents (the doc itself included — so the
    default 2 means "shared with any other doc"). ``max_repeated_run`` is
    the longest streak of consecutive repeated positions (0 when none);
    the matching verbatim span is at least ``max_repeated_run + n - 1``
    tokens long. Documents whose text yields no tokens (NULL text) drop
    out, as in every n-gram operator here."""
    hashed = docs.select(
        F.col(id_col),
        F.explode(positional_ngrams(F.col(text_col), n)).alias("__png"),
    ).select(
        id_col,
        F.col("__png.pos").alias("__pos"),
        _hash64(F.col("__png.ng"), seed, hash_fn).alias("__h"),
    )
    repeated = (
        hashed.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h", F.lit(1).alias("__r"))
    )
    marked = hashed.join(repeated, "__h", "left").select(
        id_col, "__pos", F.coalesce(F.col("__r"), F.lit(0)).alias("__r")
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    # run id: pos − cumulative-repeated-count is constant across a streak
    # of consecutive repeated positions; non-repeated rows get NULL (they
    # only contribute to n_positions)
    grouped = marked.select(
        id_col,
        "__r",
        F.when(
            F.col("__r") == 1, F.col("__pos") - F.sum("__r").over(w)
        ).alias("__grp"),
    ).groupBy(id_col, "__grp").agg(F.count(F.lit(1)).alias("__cnt"))
    rep_cnt = F.when(F.col("__grp").isNotNull(), F.col("__cnt")).otherwise(
        F.lit(0)
    )
    return (
        grouped.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_positions"),
            F.sum(rep_cnt).alias("n_repeated"),
            F.coalesce(
                F.max(F.when(F.col("__grp").isNotNull(), F.col("__cnt"))),
                F.lit(0),
            ).alias("max_repeated_run"),
        )
        .select(
            id_col,
            "n_positions",
            "n_repeated",
            F.round(
                F.col("n_repeated").cast("double") / F.col("n_positions"),
                round_digits,
            ).alias("repeated_frac"),
            "max_repeated_run",
        )
    )


# ------------------------------------------------------- line-level dedup

def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    round_digits: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Cross-document LINE deduplication (the RefinedWeb / C4 line-wise
    filter): a line whose casefolded form appears in at least ``min_docs``
    distinct documents is boilerplate (nav bars, cookie banners, footers)
    and is removed from every document; the document survives with its
    remaining lines re-joined in order. Returns ``(cleaned, report)``:

    * ``cleaned`` — (id, text) with the flagged lines removed ('' when
      nothing survives);
    * ``report`` — per doc: (id, n_lines, n_repeated [lines removed],
      repeated_frac, max_repeated_run [longest streak of consecutive
      removed lines], cleaned_md5) — the same rollup shape as
      :func:`repeated_ngram_report` with the reassembly receipt added.

    Empty (whitespace-only) lines are never removal-eligible — they are
    duplicated everywhere by construction and removing them would churn
    every document's layout.

    Plan shape, sized for 100 TB: lines are one scan-level
    ``posexplode``; the repeated-line set is ``distinct(id, hash) →
    groupBy(hash)`` on an 8-byte key (map-side partial agg) and only
    hashes reaching ``min_docs`` survive, so AQE broadcasts the marking
    join's flag side; the reassembly is ONE groupBy on the id carrying
    (pos, line) — no window, no second text shuffle. ``hash_fn='md5'``
    (portable_hash64) makes the whole pipeline oracle-replayable.

    No counterpart in the reference (tabular scope, utils/validation.py);
    north-star training-data op.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).select(
        id_col,
        (F.col("__pos") + 1).alias("__pos"),
        "__line",
        F.lower(F.trim("__line")).alias("__norm"),
    )
    eligible = lines.where(F.col("__norm") != "").select(
        id_col, "__pos", _hash64(F.col("__norm"), seed, hash_fn).alias("__h")
    )
    repeated = (
        eligible.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h", F.lit(1).alias("__r"))
    )
    # null-safe id equality: a NULL id is one (anonymous) document — the
    # plain equi-join would silently never mark its removals
    flags = eligible.join(repeated, "__h").select(
        F.col(id_col).alias("__fid"),
        F.col("__pos").alias("__fpos"),
        "__r",
    )
    marked = (
        lines.join(
            flags,
            F.col(id_col).eqNullSafe(F.col("__fid"))
            & (F.col("__pos") == F.col("__fpos")),
            "left",
        )
        .select(
            id_col,
            "__pos",
            "__line",
            F.coalesce(F.col("__r"), F.lit(0)).alias("__r"),
        )
    )
    kept_struct = F.when(
        F.col("__r") == 0, F.struct(F.col("__pos"), F.col("__line"))
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    grouped = (
        marked.select(
            id_col,
            "__r",
            kept_struct.alias("__kept"),
            F.when(
                F.col("__r") == 1, F.col("__pos") - F.sum("__r").over(w)
            ).alias("__grp"),
        )
        .groupBy(id_col, "__grp")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.collect_list("__kept").alias("__kl"),
        )
    )
    rep_cnt = F.when(F.col("__grp").isNotNull(), F.col("__cnt")).otherwise(
        F.lit(0)
    )
    report = (
        grouped.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_lines"),
            F.sum(rep_cnt).alias("n_repeated"),
            F.coalesce(
                F.max(F.when(F.col("__grp").isNotNull(), F.col("__cnt"))),
                F.lit(0),
            ).alias("max_repeated_run"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.flatten(F.collect_list("__kl"))),
                    lambda s: s["__line"],
                ),
            ).alias("__text"),
        )
        .select(
            id_col,
            "n_lines",
            "n_repeated",
            F.round(
                F.col("n_repeated").cast("double") / F.col("n_lines"),
                round_digits,
            ).alias("repeated_frac"),
            "max_repeated_run",
            F.md5("__text").alias("cleaned_md5"),
            "__text",
        )
    )
    cleaned = report.select(id_col, F.col("__text").alias(text_col))
    return cleaned, report.drop("__text")


# -------------------------------------------------- substring-level dedup

def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    round_digits: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Cross-document SUBSTRING deduplication — the CUT transform of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022) at n-gram granularity: where :func:`repeated_ngram_report`
    only FLAGS repeated spans, this removes them while keeping exactly
    one canonical copy in the corpus.

    Contract (deterministic, oracle-replayable):

    * tokens are the casefolded whitespace-normalized words (the cut
      operates in normalized token space, as suffix-array dedup operates
      on tokenized text);
    * an n-gram position is repeated when its hash occurs in at least
      ``min_docs`` distinct documents; each repeated hash has ONE
      canonical owner — the minimum document id holding it — which keeps
      all its occurrences; every other document cuts every occurrence;
    * a cut at position p removes tokens ``p .. min(p+n-1, n_tokens)``
      (a document shorter than ``n`` tokens is one whole-text 'n-gram'
      at position 1, so a repeated short doc empties entirely unless it
      is the canonical owner); overlapping cut windows union;
    * the document survives as its kept tokens re-joined in order (''
      when nothing survives); docs whose text yields no tokens (NULL
      text) drop out, as in every n-gram operator here.

    Returns ``(cleaned, report)`` — ``cleaned`` is (id, text);
    ``report`` is (id, n_tokens, n_removed, removed_frac,
    max_removed_run, cleaned_md5), the :func:`line_dedup` rollup shape
    in token space with the reassembly receipt.

    Plan shape, sized for 100 TB: positional n-grams and the token
    posexplode are scan-level projections; the repeated set is
    ``distinct(id, hash) → groupBy(hash)`` carrying (count, min(id)) on
    an 8-byte key (map-side partial agg), and only hashes reaching
    ``min_docs`` survive, so AQE broadcasts the marking join's flag
    side; window coverage fans out ``n×`` over CUT positions only (a
    small fraction of the corpus by construction); the reassembly is ONE
    groupBy on the id. ``hash_fn='md5'`` (portable_hash64) makes the
    whole pipeline replayable by the DuckDB oracle; production uses
    xxhash64.

    No counterpart in the reference (tabular scope,
    utils/validation.py); north-star training-data op.
    """
    toks_arr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    base = docs.select(F.col(id_col), toks_arr.alias("__w")).where(
        F.size("__w") > 0
    )
    toks = base.select(
        id_col,
        F.size("__w").alias("__nt"),
        F.posexplode("__w").alias("__tpos", "__tok"),
    ).select(
        id_col, "__nt", (F.col("__tpos") + 1).alias("__tpos"), "__tok"
    )
    hashed = base.select(
        F.col(id_col),
        F.size("__w").alias("__nt"),
        F.explode(positional_ngrams(F.concat_ws(" ", "__w"), n)).alias(
            "__png"
        ),
    ).select(
        id_col,
        "__nt",
        F.col("__png.pos").alias("__pos"),
        _hash64(F.col("__png.ng"), seed, hash_fn).alias("__h"),
    )
    repeated = (
        hashed.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__nd"),
            F.min(id_col).alias("__canon"),
        )
        .where(F.col("__nd") >= min_docs)
        .select("__h", "__canon")
    )
    # a cut position: repeated hash, and this doc is NOT the canonical
    # owner (null-safe — a NULL id is one anonymous document)
    cuts = hashed.join(repeated, "__h").where(
        ~F.col(id_col).eqNullSafe(F.col("__canon"))
    )
    coverage = cuts.select(
        F.col(id_col).alias("__cid"),
        F.explode(
            F.sequence(
                F.col("__pos"), F.least(F.col("__pos") + n - 1, F.col("__nt"))
            )
        ).alias("__ctpos"),
    ).distinct()
    marked = toks.join(
        coverage,
        F.col(id_col).eqNullSafe(F.col("__cid"))
        & (F.col("__tpos") == F.col("__ctpos")),
        "left",
    ).select(
        id_col,
        "__tpos",
        "__tok",
        F.when(F.col("__ctpos").isNotNull(), 1).otherwise(0).alias("__r"),
    )
    kept_struct = F.when(
        F.col("__r") == 0, F.struct(F.col("__tpos"), F.col("__tok"))
    )
    w = Window.partitionBy(id_col).orderBy("__tpos")
    grouped = (
        marked.select(
            id_col,
            "__r",
            kept_struct.alias("__kept"),
            F.when(
                F.col("__r") == 1, F.col("__tpos") - F.sum("__r").over(w)
            ).alias("__grp"),
        )
        .groupBy(id_col, "__grp")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.collect_list("__kept").alias("__kl"),
        )
    )
    rem_cnt = F.when(F.col("__grp").isNotNull(), F.col("__cnt")).otherwise(
        F.lit(0)
    )
    report = (
        grouped.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.sum(rem_cnt).alias("n_removed"),
            F.coalesce(
                F.max(F.when(F.col("__grp").isNotNull(), F.col("__cnt"))),
                F.lit(0),
            ).alias("max_removed_run"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.flatten(F.collect_list("__kl"))),
                    lambda s: s["__tok"],
                ),
            ).alias("__text"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_removed",
            F.round(
                F.col("n_removed").cast("double") / F.col("n_tokens"),
                round_digits,
            ).alias("removed_frac"),
            "max_removed_run",
            F.md5("__text").alias("cleaned_md5"),
            "__text",
        )
    )
    cleaned = report.select(id_col, F.col("__text").alias(text_col))
    return cleaned, report.drop("__text")
