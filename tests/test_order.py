"""Epoch-aware training-order manifest (operators/order.py): copy counts,
fractional-epoch gating, determinism, and physical-ordering contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.order import training_order


def _docs(spark):
    rows = [(f"wiki-{i}", "wiki") for i in range(40)] + [
        (f"web-{i}", "web") for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_integer_epochs_exact_copy_counts(spark):
    out = training_order(
        _docs(spark), {"wiki": 3.0, "web": 1.0}
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("docs"),
        F.max("epoch_idx").alias("max_epoch"),
    )
    r = {x["source"]: x for x in out.collect()}
    assert r["wiki"]["n"] == 120 and r["wiki"]["docs"] == 40
    assert r["wiki"]["max_epoch"] == 2
    assert r["web"]["n"] == 200 and r["web"]["max_epoch"] == 0


def test_fractional_epoch_is_a_fixed_subset(spark):
    docs = _docs(spark)
    a = training_order(docs, {"wiki": 2.5, "web": 0.3})
    # every wiki doc appears exactly 2 or 3 times; the 3-copy subset is
    # ~half and IDENTICAL across runs (hash gate, not a sample)
    per_doc = (
        a.where(F.col("source") == "wiki")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    counts = {r["doc_id"]: r["count"] for r in per_doc}
    assert set(counts.values()) <= {2, 3}
    n3 = sum(1 for v in counts.values() if v == 3)
    assert 10 <= n3 <= 30  # ~20 of 40 under a uniform gate
    b = training_order(docs, {"wiki": 2.5, "web": 0.3})
    assert sorted(a.collect()) == sorted(b.collect())
    # web 0.3: a ~30% subset, one copy each, epoch_idx 0
    web = b.where(F.col("source") == "web")
    assert web.agg(F.max("epoch_idx")).first()[0] == 0
    n_web = web.count()
    assert 40 <= n_web <= 80  # ~60 of 200


def test_unplanned_source_defaults_to_one_epoch_zero_drops(spark):
    out = training_order(_docs(spark), {"wiki": 0.0})
    assert out.where(F.col("source") == "wiki").count() == 0
    assert out.where(F.col("source") == "web").count() == 200


def test_order_keys_shuffle_and_interleave(spark):
    out = training_order(
        _docs(spark), {"wiki": 2.0, "web": 1.0}, order_partitions=4
    )
    rows = out.collect()
    # keys are unique (hash of distinct (id, source, epoch) triples at
    # this scale) so the order is total and reproducible
    keys = [r["order_key"] for r in rows]
    assert len(set(keys)) == len(keys)
    # physical contract: concatenating partitions in order yields the
    # globally sorted stream (range exchange + in-partition sort)
    assert keys == sorted(keys)
    # the shuffled stream interleaves: the first half of the global order
    # contains a nontrivial share of BOTH sources (a sorted-by-source
    # stream would fail this)
    first_half = rows[: len(rows) // 2]
    srcs = {r["source"] for r in first_half}
    assert srcs == {"wiki", "web"}


def test_epoch_copies_get_distinct_positions(spark):
    out = training_order(_docs(spark), {"wiki": 2.0, "web": 1.0})
    wiki = out.where(
        (F.col("source") == "wiki") & (F.col("doc_id") == "wiki-0")
    ).collect()
    assert len(wiki) == 2
    assert wiki[0]["order_key"] != wiki[1]["order_key"]
