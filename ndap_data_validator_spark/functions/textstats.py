"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These extend the reference's per-column checks to the document domain (no
counterpart in the reference — it validates tabular CSVs). Everything is a
pure Catalyst expression (split / regexp / aggregate over arrays), so the
whole block runs inside whole-stage codegen on the scan: at 100 TB of text
there is no Python in the hot path, and all features for a document come out
of ONE projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-2-style pretokenizer, reduced to RE2/Java-portable syntax:
# contractions | letter runs | digit runs | punctuation runs (no whitespace).
BPE_ISH_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"

_STOPWORDS_EN = [
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
]

# Tiny per-language marker sets for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "mit"],
    "fr": ["le", "la", "les", "et", "est", "avec"],
    "es": ["el", "la", "los", "es", "con", "que"],
}


def words(col: Column) -> Column:
    """Whitespace tokens of the trimmed text; empty text → empty array."""
    trimmed = F.trim(col)
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count_ws(col: Column) -> Column:
    return F.size(words(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count via the pretokenizer regex — the standard cheap
    proxy for LLM token budgets."""
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_TOKEN_RE), F.lit(0)))
    )


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or _STOPWORDS_EN)])
    toks = F.transform(words(col), lambda w: F.lower(w))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(None))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are letters (quality signal)."""
    total = F.length(col)
    alpha = F.length(F.regexp_replace(col, r"[^\p{L}]", ""))
    return F.when(total > 0, alpha.cast("double") / total).otherwise(F.lit(None))


def punct_ratio(col: Column) -> Column:
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(None))


def mean_word_length(col: Column) -> Column:
    toks = words(col)
    n = F.size(toks)
    return F.when(
        n > 0,
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / n,
    ).otherwise(F.lit(None))


def repetition_ratio(col: Column, n: int = 3) -> Column:
    """Gopher/Dolma-style repetition signal: the fraction of word n-grams
    that are DUPLICATES within the document — 1 − distinct/total over the
    (non-distinct) n-gram sequence. 0 for clean prose, → 1 for looping
    boilerplate; NULL when the doc has fewer than n words. Pure Catalyst
    (transform + array_distinct), whole-stage codegen."""
    toks = words(col)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(
        k <= 0, F.lit(None).cast("double")
    ).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / k
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, alphabetic, sane word
    lengths, some stopwords (fluent prose has them)."""
    n = token_count_ws(col)
    len_ok = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    alpha = F.coalesce(alpha_ratio(col), F.lit(0.0))
    sw = F.coalesce(stopword_ratio(col), F.lit(0.0))
    sw_ok = F.least(sw * 4, F.lit(1.0))
    mwl = F.coalesce(mean_word_length(col), F.lit(0.0))
    mwl_ok = F.when((mwl >= 2) & (mwl <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_ok * 0.3 + alpha * 0.3 + sw_ok * 0.2 + mwl_ok * 0.2).cast("double")


def lang_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts; 'und'
    (undetermined) when nothing matches. Deterministic tie-break: first
    language in marker order wins (greatest-by-struct comparison)."""
    markers = markers or LANG_MARKERS
    toks = F.transform(words(col), lambda w: F.lower(w))
    scored = []
    for i, (lang, ws_) in enumerate(markers.items()):
        arr = F.array(*[F.lit(w) for w in ws_])
        score = F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))
        # order: higher score wins; ties → earlier language (larger -i)
        scored.append(F.struct(score.alias("s"), F.lit(-i).alias("o"), F.lit(lang).alias("lang")))
    best = F.greatest(*scored)
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the casefolded,
    whitespace-collapsed text — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All features in one projection (single scan, codegen'd)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        F.length(c).alias("n_chars_computed"),
        mean_word_length(c).alias("mean_word_len"),
        stopword_ratio(c).alias("stopword_ratio"),
        alpha_ratio(c).alias("alpha_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality_score"),
        lang_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
