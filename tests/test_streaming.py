"""Streaming validation: file-source micro-batches through foreachBatch must
produce the same aggregate report as one batch run over the union."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.rules.model import ColumnAssignment
from ndap_data_validator_spark.streaming.validate_stream import validate_stream

ASSIGNS = [
    ColumnAssignment("loc", "Location"),
    ColumnAssignment("t", "Time"),
    ColumnAssignment("m", "Measures", "integer"),
]


def _batch(i: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "loc": [f"s{i}-{j}" if j != 1 else None for j in range(10)],
            "t": ["2021" if j != 2 else "Q1 bad" for j in range(10)],
            "m": [str(j) if j != 3 else "x" for j in range(10)],
        }
    )


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    for i in range(3):
        pdf = _batch(i)
        spark.createDataFrame(
            pdf.astype(object).where(pd.notna(pdf), None)
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("loc string, t string, m string")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = validate_stream(
        stream,
        ASSIGNS,
        report_path=str(tmp_path / "rep"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    per_col = spark.read.parquet(str(tmp_path / "rep/per_column"))
    assert per_col.select("batch_id").distinct().count() == 3

    # fold per-batch counts and compare to one batch run over everything
    folded = {
        r["column"]: (r["nulls"], r["errs"])
        for r in per_col.groupBy("column")
        .agg(
            F.sum("nulls").alias("nulls"),
            F.sum("conversion_errors").alias("errs"),
        )
        .collect()
    }
    all_df = spark.read.parquet(src)
    batch = ValidationEngine().validate(all_df, ASSIGNS)
    expected = {
        r["column"]: (r["nulls"], r["conversion_errors"])
        for r in batch.per_column_report.collect()
    }
    assert folded == expected

    summary = spark.read.parquet(str(tmp_path / "rep/summary"))
    assert summary.count() == 3
    assert all(not r["passed"] for r in summary.collect())
