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
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, vec_id, cos, rank).
    Queries are broadcast (they are always the small side); rank ties break
    on corpus id for deterministic output.

    ``round_digits`` rounds the score BEFORE ranking: near-equal neighbors
    whose raw doubles could order differently across engines (last-ulp FP
    noise) become well-defined ties broken by id — the shape used by the
    oracle-checked entry so an external engine ranks identically."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    score = cosine(F.col("__qv"), F.col("__cv"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = q.crossJoin(c).select(
        query_id_col,
        id_col,
        score.alias("cos"),
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
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: union of per-table bucket joins, then exact cosine
    rank within candidates. Recall grows with n_tables; cost stays
    bucket-local. The corpus signature computation is one projection — at
    100 TB it would be precomputed and stored as an index column.

    ``max_bucket_size`` caps the corpus members any single bucket can
    contribute: a flood of (near-)identical embeddings — the common case
    after a crawl dedup miss — would otherwise put |Q_bucket|·|C_bucket|
    pairs into one join cell. Oversized buckets keep the ``max_bucket_size``
    members with the smallest xxhash64(id) (deterministic, unbiased by
    insertion order); the dropped members are near-duplicates of the kept
    ones by construction, so top-k recall degrades gracefully.

    The default is ``None`` (cap OFF) — the original pre-cap behavior,
    restored per r03 ADVICE after one round where the default was 1024:
    results from that round's default callers change back, and dense
    corpora must now OPT IN (1024 is a good production value; without a
    cap, 10^4 near-identical vectors in one bucket build a ~10^8-pair
    join cell). Toggling the cap changes which members dense buckets
    contribute and therefore previously-produced top-k rows."""
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        csig = corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("__cv"),
            lsh_signature(F.col(vec_col), planes).alias("__bucket"),
        )
        if max_bucket_size is not None:
            wb = Window.partitionBy("__bucket").orderBy(
                F.xxhash64(F.col(id_col).cast("string")), F.col(id_col)
            )
            csig = (
                csig.withColumn("__r", F.row_number().over(wb))
                .where(F.col("__r") <= max_bucket_size)
                .drop("__r")
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


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iterations: int = 1,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """IVF coarse quantizer: deterministic pseudo-random seed centroids —
    the ``n_centroids`` corpus vectors minimizing ``hash(id, seed)``
    (TakeOrderedAndProject: a distributed top-k, no count job, no global
    sort, any id type) — refined by a few Lloyd iterations done as
    joins+groupBy — distributed k-means-lite, no driver-side data.
    Returns (cell_id, centroid: array<double>).

    ``hash_fn='md5'`` (portable_hash64) with ``lloyd_iterations=0`` makes
    the whole quantizer a pure SQL-expressible function — the configuration
    the oracle-checked entry uses; production keeps xxhash64 + Lloyd."""
    from pyspark.sql import Window as W

    if hash_fn == "md5":
        from ndap_data_validator_spark.functions.porthash import portable_hash64

        order = portable_hash64(F.col(id_col), seed=seed)
    else:
        order = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    cents = (
        corpus.orderBy(order)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("__seed_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
        .withColumn(
            "cell_id",
            F.row_number().over(W.orderBy(F.col("__seed_id"))) - 1,
        )
        .select("cell_id", "centroid")
    )
    for _ in range(lloyd_iterations):
        assigned = assign_cells(corpus, cents, id_col, vec_col)
        # mean vector per cell: explode components, avg, re-assemble
        comp = assigned.select(
            "cell_id",
            F.posexplode(F.col("__v")).alias("i", "x"),
        )
        cents = (
            comp.groupBy("cell_id", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("s"))
            .select(
                "cell_id",
                F.transform(F.col("s"), lambda e: e["m"]).alias("centroid"),
            )
        )
        # Truncate lineage each round (same guard as connected_components,
        # dedup.py pointer jumping): without it, every Lloyd iteration
        # nests the full previous plan inside assign_cells' crossJoin and
        # a 20-iteration run compiles an exponentially deep tree. The
        # checkpointed frame is centroid-count-sized — trivially cheap.
        cents = cents.localCheckpoint(eager=True)
    return cents


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment via broadcast crossJoin + max_by — at
    production scale this is precomputed once and stored as an index column.
    Returns (id, __v: array<double>, cell_id)."""
    v = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    scored = v.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "__v",
        "cell_id",
        cosine(F.col("__v"), F.col("centroid")).alias("__cos"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.first("__v").alias("__v"),
            F.max_by("cell_id", F.struct(F.col("__cos"), -F.col("cell_id"))).alias(
                "cell_id"
            ),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    lloyd_iterations: int = 1,
    hash_fn: str = "xxhash64",
    round_digits: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells per query,
    exact cosine rank within the probed cells only. Recall rises with
    n_probe (n_probe = n_centroids ≡ brute force). ``round_digits`` ranks on
    the rounded score (id tie-breaks) for cross-engine determinism."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(
            corpus, n_centroids, id_col, vec_col,
            lloyd_iterations=lloyd_iterations, hash_fn=hash_fn,
        )
    )
    cells = assign_cells(corpus, cents, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    q_scored = q.crossJoin(F.broadcast(cents)).select(
        query_id_col,
        "__qv",
        "cell_id",
        cosine(F.col("__qv"), F.col("centroid")).alias("__cos"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("__cos"), F.asc("cell_id"))
    q_cells = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= n_probe)
        .select(query_id_col, "__qv", "cell_id")
    )
    score = cosine(F.col("__qv"), F.col("__v"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    cand = F.broadcast(q_cells).join(cells, on="cell_id").select(
        query_id_col,
        F.col(id_col),
        score.alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int = 512,
    lloyd_iterations: int = 1,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    round_digits: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with the IVF coarse quantizer, then inside each cell
    prune every vector that has a LOWER-id cell-mate with cosine ≥
    ``threshold``. Returns (id, cell_id, is_keeper) for every input row.

    This is the deterministic distributed reduction of SemDeDup's greedy
    ε-ball sweep: "exists an earlier keeper within ε in my cluster" is
    order-free (no sequential dependence), so it parallelizes as one
    within-cell candidate-pair join. Differences from the sequential greedy
    are confined to chains (a~b, b~c, a̸~c keeps {a, c}; greedy may keep
    {a, c} or {a, b} depending on visit order — ours is the fixed id
    order).

    Plan shape at 100 TB: centroids broadcast; assignment is one groupBy;
    the within-cell self-join moves only (id, cell_id) — vectors re-join by
    id afterwards — and cells over ``max_cell_size`` degrade to O(n)
    anchor-star pairs (``_bucket_pairs``), so an embedding flood cannot
    create a quadratic join cell. Star-capping can miss a prune edge whose
    anchor is dissimilar (recall, not correctness, degrades — pruned set
    shrinks, never grows wrongly).

    ``hash_fn='md5'`` + ``lloyd_iterations=0`` + ``round_digits`` is the
    pure-SQL verification configuration (same contract as ``ivf_topk``).
    """
    from ndap_data_validator_spark.operators.dedup import _bucket_pairs

    cents = ivf_centroids(
        df, n_centroids, id_col, vec_col,
        lloyd_iterations=lloyd_iterations, seed=seed, hash_fn=hash_fn,
    )
    cells = assign_cells(df, cents, id_col, vec_col).select(id_col, "cell_id")
    pairs = _bucket_pairs(
        cells, id_col, ["cell_id"], ("id_a", "id_b"), max_cell_size
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    score = cosine(F.col("__va"), F.col("__vb"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    pruned = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .where(score >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return cells.join(pruned, id_col, "left").select(
        id_col,
        "cell_id",
        F.coalesce(~F.col("__pruned"), F.lit(True)).alias("is_keeper"),
    )


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 512,
    broadcast_vectors: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, found via LSH
    self-buckets (no full pairwise pass).

    The self-join is SKEW-CAPPED via the same star-pair degradation the
    text-dedup side uses (``dedup._bucket_pairs``): a bucket of 10^3
    identical embeddings — routine after a crawl dedup miss — would
    otherwise put 10^6 pairs in one join cell. Buckets over
    ``max_bucket_size`` degrade to O(n) anchor-star pairs, preserving
    connectivity for downstream clustering. Candidate pairs carry only ids;
    vectors are joined back afterwards, so the bucket shuffle moves 16-byte
    keys, not embeddings.

    ``broadcast_vectors=True`` is the verified-small opt-in (same contract
    as ``ngram_jaccard_pairs(broadcast_tokens=True)``): when the VECTOR
    table fits in a broadcast (the candidate-pair set may still be huge),
    both attach joins become broadcast-hash — without it the second attach
    shuffles every candidate pair WITH its already-attached ~dim×8-byte
    ``__va`` payload (guide §8's heavy-payload-through-a-shuffle trap;
    measured 4× on the bench fixture, whose in-memory vector table lands
    just above the 10 MB auto-broadcast estimate). Default OFF: a 100 TB
    corpus's vectors cannot broadcast and must shuffle-attach."""
    from ndap_data_validator_spark.operators.dedup import _bucket_pairs

    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        banded = df.select(
            F.col(id_col),
            lsh_signature(F.col(vec_col), planes).alias("__bucket"),
        )
        per_table.append(
            _bucket_pairs(
                banded, id_col, ["__bucket"], ("id_a", "id_b"), max_bucket_size
            )
        )
    cands = per_table[0]
    for other in per_table[1:]:
        cands = cands.unionByName(other)
    if n_tables > 1:
        # single-table candidates are already distinct (_bucket_pairs ends
        # in one); the cross-table dedup only exists for the union (r06)
        cands = cands.dropDuplicates(["id_a", "id_b"])
    # ONE structurally-identical vector subtree for both attach sides —
    # the physical (broadcast) exchange canonicalizes identically, so the
    # second join reuses the first's exchange instead of building its own
    # (r06; the former per-side renamed projections defeated reuse)
    vecs = df.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v")
    )
    if broadcast_vectors:
        vecs = F.broadcast(vecs)
    a = cands.join(vecs, F.col("id_a") == F.col("__vid")).select(
        "id_a", "id_b", F.col("__v").alias("__va")
    )
    return (
        a.join(vecs, F.col("id_b") == F.col("__vid"))
        .select(
            "id_a", "id_b", cosine(F.col("__va"), F.col("__v")).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )
