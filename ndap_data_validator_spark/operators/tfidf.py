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
    bm25: bool = False,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document →
    (id, term, tf, df, tfidf, rank). ``min_df`` drops hapax noise before
    scoring; ``tf`` is the raw in-document count (postings weight).

    ``bm25=True`` adds the Lucene-form Okapi BM25 score of the same
    (doc, term) cell — idf = ln(1 + (N − df + 0.5)/(df + 0.5)), saturated
    tf with length normalization against avgdl (average token count over
    ALL ``docs``, empty documents included). Ranking stays on tfidf so the
    row set is identical either way. Cost: ZERO extra shuffles — document
    length is a window sum over the same ``id`` partitioning the top-k
    rank window already exchanges on, and N/avgdl ride one broadcast
    1-row aggregate."""
    postings = (
        docs.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if bm25:
        # document length counts ALL the doc's tokens (hapax included), so
        # it rides the PRE-min_df postings as a window sum — NULL ids form
        # one group exactly as groupBy treats them, and the row set cannot
        # depend on the bm25 flag. One id-exchange of the (vocabulary ×
        # doc)-sized postings frame, never of the corpus.
        postings = postings.withColumn(
            "__dl", F.sum("tf").over(Window.partitionBy(id_col))
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
            "__n_docs",
            *(["__dl"] if bm25 else []),
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
    out_cols = [id_col, "term", "tf", "df", "tfidf"]
    if bm25:
        # avgdl = total corpus tokens / N, on the same broadcast 1-row
        # path N rides (total from the pre-min_df postings)
        tot = postings.agg(F.sum("tf").alias("__tot_tf"))
        scored = scored.crossJoin(F.broadcast(tot))
        dl = F.col("__dl")
        avgdl = F.col("__tot_tf") / F.col("__n_docs")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
        )
        scored = scored.withColumn(
            "bm25", F.round(idf * sat, round_digits)
        )
        out_cols.append("bm25")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols, "rank")
    )
