"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

No counterpart in the reference (it validates, never dedups); these are the
north-star "operations a large-scale training-data pipeline needs". Scale
stance for each:

  * exact        — hash-groupBy on a normalized fingerprint: one shuffle on
                   a 16-byte key, map-side partial agg. The only full-data op.
  * MinHash+LSH  — shingles → k minhashes (ONE groupBy producing all k via
                   min(hash_i) aggregates) → band keys → self-join on band
                   key. Candidate pairs only; the quadratic explosion is
                   confined to same-band buckets.
  * SimHash      — 64-bit signature per doc from token hashes; near-dups =
                   band-equality buckets on signature chunks (Hamming-ball
                   probing without pairwise comparison).
  * n-gram Jaccard — exact verification for candidate pairs (or small
                   corpora): token-set self-join; use AFTER LSH at scale.

All hashing is ``xxhash64`` (JVM-side, seedable); no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.textstats import fingerprint


# ------------------------------------------------------------------- exact

def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) texts:
    (fingerprint, keeper_id, dup_count) for groups with >1 member."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .where(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per normalized-text group. min_by avoids a
    window: single aggregate, no per-row shuffle beyond the groupBy."""
    keepers = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
    )
    return df.join(keepers, on=id_col, how="left_semi")


# ------------------------------------------------------------------ shingles

def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct) of the casefolded text."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


# ------------------------------------------------------------- MinHash + LSH

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]). All k minhashes come from one
    explode + one groupBy: min(xxhash64(shingle, seed_i)) per i — partial
    aggregation collapses each document's shingles map-side."""
    ex = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(seed + i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    id_col_out: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Band the signature (rows = len(sig)/bands), hash each band, self-join
    on (band_idx, band_hash). Returns distinct candidate pairs (a < b).
    Probability a pair with Jaccard s collides: 1-(1-s^r)^b."""
    a_id, b_id = id_col_out
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        b * (F.size("sig") / bands).cast("int") + 1,
                        (F.size("sig") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.select(
        F.col(id_col).alias(a_id), "band_idx", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias(b_id), "band_idx", "band_hash"
    )
    return (
        left.join(right, on=["band_idx", "band_hash"])
        .where(F.col(a_id) < F.col(b_id))
        .select(a_id, b_id)
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline: LSH candidates verified by exact shingle Jaccard →
    (id_a, id_b, jaccard ≥ threshold). Verification joins shingle sets for
    candidate pairs only."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed)
    pairs = lsh_candidate_pairs(sigs, id_col)
    sets_ = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("__set")
    )
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------ SimHash

def simhash(col: Column, seed: int = 42) -> Column:
    """64-bit SimHash of the whitespace tokens: for each bit, sum(+1/−1 over
    token hashes) → sign. Expressed as 64 aggregate-over-array expressions
    folded into one bigint — pure Catalyst."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
    out = F.lit(0).cast("bigint")
    for bit in range(64):
        vote = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << bit if bit < 63 else -(2**63))) != 0, 1).otherwise(-1),
        )
        out = out.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return out


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs by band equality over the 64-bit simhash
    (bands of 16 bits): docs differing in ≤ bands−1 band regions collide in
    at least one band."""
    bits_per = 64 // bands
    sh = df.select(F.col(id_col), simhash(F.col(text_col), seed).alias("__sh"))
    banded = sh.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("__sh"), i * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band_idx", "b.band_val")
    left = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_val")
    right = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ------------------------------------------------------------ n-gram Jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold: float = 0.5,
    broadcast_tokens: bool = True,
) -> DataFrame:
    """Exact all-pairs Jaccard over word n-gram sets via token self-join —
    (id_a, id_b, jaccard). Quadratic in bucket sizes: use on small corpora or
    LSH candidates; at 100 TB this is the VERIFY stage, not the scan stage.
    ``broadcast_tokens`` (default True, matching the verify-stage shape where
    the candidate slice is small) hash-joins against a broadcast token list
    instead of a sort-merge self-join."""
    sets_ = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("s")
    ).withColumn("sz", F.size("s"))
    toks = sets_.select("id", "sz", F.explode("s").alias("tok"))
    a = toks.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = toks.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "tok"
    )
    if broadcast_tokens:
        b = F.broadcast(b)
    inter = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
