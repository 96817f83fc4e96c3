"""Source schemes: parquet dir, csv: (raw-file form), iceberg: seam."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndap_data_validator_spark.sources.tables import load_table


def test_csv_scheme_roundtrip_with_schema(spark, tmp_path):
    base = str(tmp_path / "csvdir")
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "id bigint, s string, v double",
    )
    src.coalesce(1).write.mode("overwrite").option("header", "true").csv(
        f"{base}/t.csv"
    )
    got = load_table(
        spark, f"csv:{base}", "t", schema="id bigint, s string, v double"
    )
    rows = {r["id"]: (r["s"], r["v"]) for r in got.collect()}
    assert rows == {1: ("a", 1.5), 2: (None, None), 3: ("c", -0.25)}


def test_csv_scheme_infers_without_schema(spark, tmp_path):
    base = str(tmp_path / "csvdir2")
    spark.range(5).select(
        F.col("id"), (F.col("id") * 2.0).alias("d")
    ).coalesce(1).write.mode("overwrite").option("header", "true").csv(
        f"{base}/u.csv"
    )
    got = load_table(spark, f"csv:{base}", "u")
    assert got.count() == 5
    assert dict(got.dtypes)["d"] == "double"


# ------------------------------------------------------------ S10 evolution


def test_schema_diff_classification(spark):
    from ndap_data_validator_spark.sources.evolution import schema_diff

    a = spark.createDataFrame([], "x int, y string, z float").schema
    b = spark.createDataFrame([], "x bigint, y int, w string").schema
    d = schema_diff(a, b)
    assert d.added == ["w"] and d.removed == ["z"]
    assert d.widened == ["x"] and d.conflicting == ["y"]
    assert d.is_structure_change


def test_evolved_read_and_structure_change_run(spark, tmp_path):
    """End-to-end S10: files written under two schemas read as one evolved
    frame; validation under load_mode='structure_change' covers both
    batches after align_to_schema."""
    from ndap_data_validator_spark.plans.pipeline import run_validation
    from ndap_data_validator_spark.rules.model import ColumnAssignment
    from ndap_data_validator_spark.sources.evolution import (
        align_to_schema,
        evolved_read,
        schema_diff,
    )

    path = str(tmp_path / "evolving")
    old = spark.createDataFrame(
        [("p0", 1), ("p1", 2)], "part string, m int"
    )
    old.write.mode("overwrite").parquet(path)
    new = spark.createDataFrame(
        [("p2", 3, "x"), ("p3", None, None)], "part string, m int, tag string"
    )
    new.write.mode("append").parquet(path)

    allrows = evolved_read(spark, path)
    assert set(allrows.columns) == {"part", "m", "tag"}
    assert allrows.count() == 4
    # old-batch rows surface the added column as nulls
    assert allrows.where(F.col("part") == "p0").first()["tag"] is None

    d = schema_diff(old.schema, allrows.schema)
    assert d.added == ["tag"] and d.is_structure_change

    aligned = align_to_schema(allrows, allrows.schema)
    out = run_validation(
        spark, aligned,
        [ColumnAssignment("part", "Location"),
         ColumnAssignment("m", "Measures", "integer")],
        "part", checkpoint_path=str(tmp_path / "ckpt"),
        load_mode="structure_change",
    )
    assert sorted(out.processed_partitions) == ["p0", "p1", "p2", "p3"]


def test_align_rejects_conflicting_cast(spark):
    from ndap_data_validator_spark.sources.evolution import align_to_schema

    df = spark.createDataFrame([("a",)], "x string")
    target = spark.createDataFrame([(1,)], "x int").schema
    import pytest

    with pytest.raises(ValueError, match="conflicting"):
        align_to_schema(df, target)


def test_jsonl_scheme_roundtrip(spark, tmp_path):
    base = str(tmp_path / "jsonldir")
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None)], "id bigint, s string, v double"
    )
    src.coalesce(1).write.mode("overwrite").json(f"{base}/t.jsonl")
    got = load_table(
        spark, f"jsonl:{base}", "t", schema="id bigint, s string, v double"
    )
    rows = {r["id"]: (r["s"], r["v"]) for r in got.collect()}
    assert rows == {1: ("a", 1.5), 2: (None, None)}
