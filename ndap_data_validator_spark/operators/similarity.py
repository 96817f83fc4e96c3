"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(|Q|·|C|), with the small query
side BROADCAST so the corpus never shuffles (map-side join + per-partition
top-k before the final k-merge). Scale path: random-hyperplane LSH — bucket
by sign-signature, search only same-bucket candidates; multi-probe via
several independent signature tables.

Dot products are `zip_with` + `aggregate` (JVM-side, no Python). Hyperplanes
are seeded literals generated driver-side, so results are deterministic and
reproducible across cluster sizes. Near-dup-by-embedding = same machinery
with a distance threshold instead of top-k.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(None))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, vec_id, cos, rank).
    Queries are broadcast (they are always the small side); rank ties break
    on corpus id for deterministic output."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).select(
        query_id_col,
        id_col,
        cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded unit hyperplanes (driver-side constants → literal columns)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a bigint bucket key (≤ 63 planes)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: union of per-table bucket joins, then exact cosine
    rank within candidates. Recall grows with n_tables; cost stays
    bucket-local. The corpus signature computation is one projection — at
    100 TB it would be precomputed and stored as an index column."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        csig = corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("__cv"),
            lsh_signature(F.col(vec_col), planes).alias("__bucket"),
        )
        qsig = F.broadcast(
            queries.select(
                F.col(id_col).alias(query_id_col),
                F.col(vec_col).alias("__qv"),
                lsh_signature(F.col(vec_col), planes).alias("__bucket"),
            )
        )
        per_table.append(qsig.join(csig, on="__bucket").drop("__bucket"))
    cands = per_table[0]
    for other in per_table[1:]:
        cands = cands.unionByName(other)
    scored = cands.dropDuplicates([query_id_col, id_col]).select(
        query_id_col, id_col, cosine(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, found via LSH
    self-buckets (no full pairwise pass)."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        sig = df.select(
            F.col(id_col),
            F.col(vec_col).alias("__v"),
            lsh_signature(F.col(vec_col), planes).alias("__bucket"),
        )
        a = sig.select(
            F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "__bucket"
        )
        b = sig.select(
            F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "__bucket"
        )
        per_table.append(
            a.join(b, "__bucket").where(F.col("id_a") < F.col("id_b")).drop("__bucket")
        )
    cands = per_table[0]
    for other in per_table[1:]:
        cands = cands.unionByName(other)
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )
