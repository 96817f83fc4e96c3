"""Distributed TF-IDF: per-document top terms over a corpus — the keyword /
topic-signal op a training-data pipeline uses for mixture analysis and
source fingerprinting (north-star addition; the reference's scope is tabular
validation, utils/validation.py).

Plan shape, sized for a 100 TB corpus:

  * ONE explode of the tokenized text → ``groupBy(doc, term)`` with
    map-side partial counts (the frame shrinks to |postings|, never raw
    text downstream);
  * document frequency is a second aggregate OVER THE POSTINGS FRAME
    (vocabulary-sized output), joined back on ``term`` — AQE picks
    broadcast vs shuffle from the vocabulary's runtime size;
  * the corpus document count rides a broadcast 1-row crossJoin, never a
    driver-side collect in the plan;
  * top-k per document is one window on ``doc`` — ranked on the ROUNDED
    score with a term tie-break, so ordering is well-defined across engines
    (ln() last-ulp noise cannot flip ranks except exactly at a rounding
    boundary).

idf is the smoothed sklearn form ln((1+N)/(1+df)) + 1 — strictly positive,
so single-doc corpora still rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col):
    """Casefolded whitespace tokens (the dedup/minhash tokenization)."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " "
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document →
    (id, term, tf, df, tfidf, rank). ``min_df`` drops hapax noise before
    scoring; ``tf`` is the raw in-document count (postings weight)."""
    postings = (
        docs.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    n_docs = docs.select(
        F.count(F.lit(1)).alias("__n_docs")
    )
    scored = (
        postings.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("__n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                ),
                round_digits,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
