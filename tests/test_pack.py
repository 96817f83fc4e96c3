"""Chunking + concat-and-cut packing (operators/pack.py): hand-computed
fixtures for chunk boundaries, overlap strides, bin/offset/split math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.pack import chunk_documents, pack_manifest


def test_chunk_documents_exact_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}  # empty/null docs produce no rows
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in c1] == [4, 4, 2]
    assert c1[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c1[2]["chunk_text"] == "t8 t9"
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2]
    assert by_doc[2][0]["chunk_text"] == "a b"


def test_chunk_documents_overlap_stride(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(docs, max_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 3: starts 0,3,6 — NOT 9: a chunk starting at 9 would hold only
    # t9, already covered by the chunk at 6 (overlap-contained duplicate)
    assert [r["n_tokens"] for r in out] == [4, 4, 4]
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_chunk_documents_no_contained_final_chunk(spark):
    # 26 tokens, max 32, overlap 8: the old floor((n-1)/stride)+1 emitted a
    # second chunk of tokens 25-26, fully inside chunk 0 (r03 ADVICE)
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(26)))], "doc_id long, text string"
    )
    out = chunk_documents(docs, max_tokens=32, overlap=8).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 26
    # and every emitted chunk still contributes tokens beyond the overlap
    docs2 = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40)))], "doc_id long, text string"
    )
    out2 = sorted(
        chunk_documents(docs2, max_tokens=32, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_tokens"] for r in out2] == [32, 16]  # starts 0, 24


def test_pack_manifest_bins_offsets_splits(spark):
    rows = [(1, 5), (2, 4), (3, 3)]
    chunks = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = {
        r["doc_id"]: r
        for r in pack_manifest(chunks, budget=6, n_shards=1).collect()
    }
    assert out[1]["bin_id"] == 0 and out[1]["offset"] == 0 and not out[1]["split"]
    assert out[2]["bin_id"] == 0 and out[2]["offset"] == 5 and out[2]["split"]
    assert out[3]["bin_id"] == 1 and out[3]["offset"] == 3 and not out[3]["split"]
    assert all(r["shard"] == 0 for r in out.values())


def test_pack_manifest_sharded_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "w " * (i % 7)) for i in range(200)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, max_tokens=5)
    a = sorted(map(tuple, pack_manifest(chunks, budget=16, n_shards=8).collect()))
    b = sorted(map(tuple, pack_manifest(chunks, budget=16, n_shards=8).collect()))
    assert a == b and len(a) > 0
    # every (shard, bin) holds at most budget tokens of non-split starts:
    # offsets stay inside the budget by construction
    assert all(0 <= r[5] < 16 for r in a)  # offset column
    # token-conservation: total tokens in == total tokens in manifest
    tot_in = chunks.agg(F.sum("n_tokens")).first()[0]
    assert sum(r[4] for r in a) == tot_in  # n_tokens column


def test_pack_manifest_md5_portable_routing(spark):
    chunks = spark.createDataFrame(
        [(i, 3) for i in range(50)], "doc_id long, n_tokens int"
    )
    out = pack_manifest(chunks, budget=9, n_shards=4, hash_fn="md5").collect()
    assert len(out) == 50
    assert {r["shard"] for r in out} <= {0, 1, 2, 3}


def test_pack_nosplit_never_splits_and_conserves(spark):
    """VERDICT r03 #4: doc-boundary-respecting packing — every doc appears
    exactly once, bins never exceed the budget (except a single oversized
    doc alone in its bin), offsets are the running fill."""
    from ndap_data_validator_spark.operators.pack import pack_nosplit

    rows = [(i, 10 + (i * 37) % 90) for i in range(200)] + [(999, 500)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_nosplit(docs, budget=128, n_shards=8).collect()

    # every doc exactly once — nothing split, nothing dropped
    assert sorted(r["doc_id"] for r in out) == sorted(r[0] for r in rows)
    assert sum(r["n_tokens"] for r in out) == sum(r[1] for r in rows)

    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for members in by_bin.values():
        s = sum(m["n_tokens"] for m in members)
        if s > 128:  # only an oversized doc may overflow, and only alone
            assert len(members) == 1 and members[0]["doc_id"] == 999
        # offsets are the running fill in (n_tokens DESC, id) order
        members.sort(key=lambda m: (-m["n_tokens"], m["doc_id"]))
        fill = 0
        for m in members:
            assert m["offset"] == fill
            fill += m["n_tokens"]


def test_pack_nosplit_deterministic_and_partition_independent(spark):
    from ndap_data_validator_spark.operators.pack import pack_nosplit

    rows = [(i, 5 + i % 60) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    a = sorted(map(tuple, pack_nosplit(docs, budget=100, n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_nosplit(docs.repartition(13), budget=100, n_shards=4).collect(),
        )
    )
    assert a == b and len(a) == 300
