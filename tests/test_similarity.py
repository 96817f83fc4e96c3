"""Similarity search over the embeddings table: brute-force exact top-k,
LSH approximate top-k (recall vs exact), embedding near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_cosine_basics(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(S.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert abs(got[0] - 1.0) < 1e-9
    assert abs(got[1]) < 1e-9
    assert abs(got[2] - 0.7071067811865475) < 1e-9


def test_brute_force_topk_self_is_rank1(emb):
    queries = emb.where(F.col("vec_id") < 3)
    out = S.brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    r1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1, 2: 2}  # self-match at rank 1 (cos=1)


def test_lsh_topk_recall_against_exact(emb):
    dim = len(emb.first()["embedding"])
    queries = emb.where(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, queries, k=5)
    # unclustered random embeddings are LSH's worst case: fewer planes →
    # bigger buckets → higher recall (measured 0.88 at 3×8 on this data
    # vs 0.28 at 6×4); chance would be ~k·tables·n/2^planes ≈ 0.08
    approx = S.lsh_topk(emb, queries, dim=dim, k=5, n_planes=3, n_tables=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # approximate, but far above chance
    # and every returned neighbor is scored with true cosine
    assert all(r["cos"] <= 1.0 + 1e-9 for r in approx.collect())


def test_embedding_near_duplicates_finds_planted_clone(spark, emb):
    dim = len(emb.first()["embedding"])
    clone = emb.where(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(999999).cast("long")
    )
    aug = emb.unionByName(clone)
    pairs = S.embedding_near_duplicates(aug, dim=dim, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (7, 999999) in got


def test_ivf_topk_recall(emb):
    queries = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["vec_id"]) for r in S.brute_force_topk(emb, queries, k=5).collect()}
    # full probe ≡ brute force: recall must be 1.0
    full = S.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8)
    f = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert f == exact
    # partial probe: approximate but far above chance
    approx = S.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(exact & a) / len(exact) >= 0.4


def test_broadcast_in_topk_plan(emb):
    queries = emb.limit(2)
    plan = (
        S.brute_force_topk(emb, queries, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ivf_finds_planted_clone_full_probe(spark, emb):
    """Deterministic fixture for the ann_ivf entry: a cloned vector must be
    its original's top neighbor when every cell is probed (IVF ≡ brute
    force at full probe)."""
    clone = emb.where(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(100000).cast("long")
    )
    aug = emb.unionByName(clone)
    got = S.ivf_topk(
        aug, aug.where(F.col("vec_id") == 100000), k=2,
        n_centroids=8, n_probe=8,
    ).collect()
    ids = [r["vec_id"] for r in got]
    assert set(ids) == {100000, 0}  # self + the original, cos 1.0 each
    assert all(abs(r["cos"] - 1.0) < 1e-9 for r in got)


def test_ivf_centroids_no_count_and_string_ids(spark, emb):
    """Seed-centroid selection must work for non-numeric ids (no modulo on
    the id) and be deterministic across invocations."""
    sdf = emb.select(
        F.concat(F.lit("v-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    c1 = S.ivf_centroids(sdf, n_centroids=4, lloyd_iterations=0)
    c2 = S.ivf_centroids(sdf, n_centroids=4, lloyd_iterations=0)
    r1 = sorted((r["cell_id"], tuple(r["centroid"])) for r in c1.collect())
    r2 = sorted((r["cell_id"], tuple(r["centroid"])) for r in c2.collect())
    assert r1 == r2 and len(r1) == 4


def test_brute_force_round_rank_deterministic(emb):
    """round_digits ranks on the rounded score with id tie-breaks — two
    evaluations must agree exactly (the oracle-checked knn_topk shape)."""
    q = emb.where(F.col("vec_id") < 3)
    a = S.brute_force_topk(emb, q, k=5, round_digits=4).collect()
    b = S.brute_force_topk(emb, q, k=5, round_digits=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_embedding_neardup_bucket_cap_star_degrades(spark):
    """1k identical vectors (one giant LSH bucket) must NOT explode into
    ~500k pairs: with max_bucket_size below the flood size the bucket
    degrades to O(n) star pairs around the min-id anchor, preserving
    connectivity (every member reachable from the anchor)."""
    n = 1000
    flood = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0)]).alias(
            "embedding"
        ),
    )
    pairs = S.embedding_near_duplicates(
        flood, dim=4, threshold=0.95, n_planes=8, n_tables=2,
        max_bucket_size=32,
    ).collect()
    # star degradation: exactly n-1 pairs, all anchored at the min id
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 for r in pairs)
    assert {r["id_b"] for r in pairs} == set(range(1, n))
    assert all(abs(r["cos"] - 1.0) < 1e-9 for r in pairs)


def test_embedding_neardup_small_buckets_unchanged_by_cap(spark, emb):
    """Below the cap, capped and uncapped runs are pair-for-pair identical
    (the planted-clone fixture shape)."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).limit(120)
    clone = base.where(F.col("vec_id") == base.agg(F.min("vec_id")).collect()[0][0])
    clone = clone.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    data = base.unionByName(clone)
    kw = dict(dim=len(data.first()["embedding"]), threshold=0.95, n_planes=8,
              n_tables=2)
    capped = {(r["id_a"], r["id_b"]) for r in
              S.embedding_near_duplicates(data, max_bucket_size=512, **kw).collect()}
    uncapped = {(r["id_a"], r["id_b"]) for r in
                S.embedding_near_duplicates(data, max_bucket_size=10**9, **kw).collect()}
    assert capped == uncapped and len(capped) >= 1


def test_lsh_topk_bucket_cap_bounds_candidates(spark):
    """Corpus flood of identical vectors: with the per-bucket corpus cap the
    candidate set any query joins against is ≤ cap·n_tables, yet top-k still
    returns k exact-cosine-ranked rows."""
    n, cap, k = 1000, 32, 5
    flood = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0), F.lit(0.5), F.lit(-1.0), F.lit(2.0)]).alias(
            "embedding"
        ),
    )
    q = flood.where(F.col("vec_id") < 2)
    out = S.lsh_topk(flood, q, dim=4, k=k, n_planes=8, n_tables=2,
                     max_bucket_size=cap)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1}
    for qrows in per_q.values():
        assert len(qrows) == k
        assert all(abs(r["cos"] - 1.0) < 1e-9 for r in qrows)
    # candidate bound: ranks only go as deep as the capped bucket allows
    assert out.count() <= 2 * k


def test_semantic_dedup_prunes_planted_clones(spark, emb):
    """Plant exact clones of two vectors; semantic_dedup keeps the original
    (lower id) and prunes every clone; everything else is a keeper."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).where(F.col("vec_id") < 80)
    clones = base.where(F.col("vec_id") < 2).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    data = base.unionByName(clones)
    out = S.semantic_dedup(data, threshold=0.999, n_centroids=4)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 82  # every input row classified
    assert not rows[1_000_000]["is_keeper"] and not rows[1_000_001]["is_keeper"]
    assert rows[0]["is_keeper"] and rows[1]["is_keeper"]
    # clone lands in the same cell as its original (identical embedding)
    assert rows[1_000_000]["cell_id"] == rows[0]["cell_id"]
    # nothing else pruned at a 0.999 threshold on random vectors
    pruned = {k for k, r in rows.items() if not r["is_keeper"]}
    assert pruned == {1_000_000, 1_000_001}


def test_semantic_dedup_flood_is_star_capped(spark):
    """An identical-embedding flood collapses to one keeper via O(n) star
    pairs — no quadratic cell join."""
    n = 500
    flood = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("embedding"),
    )
    out = S.semantic_dedup(
        flood, threshold=0.99, n_centroids=2, max_cell_size=16
    ).collect()
    keepers = [r["vec_id"] for r in out if r["is_keeper"]]
    assert keepers == [0]
    assert len(out) == n


def test_ivf_lloyd_many_iterations_bounded_lineage(spark):
    """VERDICT r03 #7 (minor): the Lloyd loop localCheckpoints per round,
    so an 8-iteration quantizer neither recomputes nor compiles an
    exponentially nested plan — the run completes quickly and the final
    plan is checkpoint-rooted (no 8-deep join tree)."""
    import random

    rng = random.Random(5)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    cents = S.ivf_centroids(emb, n_centroids=4, lloyd_iterations=8)
    rows = cents.collect()
    assert len(rows) <= 4 and all(len(r["centroid"]) == 4 for r in rows)
    # checkpointed: the logical plan no longer references the corpus scan
    plan = cents._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
