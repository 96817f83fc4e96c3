"""Publish-on-pass (S8 parity): only passed partitions' ORIGINAL rows reach
the publish path; failed partitions are withheld (main.py:1206-1249)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ndap_data_validator_spark.plans.pipeline import run_validation
from ndap_data_validator_spark.rules.model import ColumnAssignment


def test_publish_only_passed_partitions(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "part": ["good"] * 5 + ["bad"] * 5,
            "loc": [f"x{i}" for i in range(5)] + ["y0", None, "y2", "y3", "y4"],
            "t": ["2021"] * 10,
            "m": [str(i) for i in range(10)],
        }
    )
    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    assigns = [
        ColumnAssignment("part", "Others"),
        ColumnAssignment("loc", "Location"),
        ColumnAssignment("t", "Time"),
        ColumnAssignment("m", "Measures", "integer"),
    ]
    out = run_validation(
        spark,
        sdf,
        assigns,
        partition_by="part",
        checkpoint_path=str(tmp_path / "ckpt"),
        publish_path=str(tmp_path / "pub"),
    )
    assert not out.passed_all
    pub = spark.read.parquet(str(tmp_path / "pub"))
    assert pub.select("partition_id").distinct().collect()[0][0] == "good"
    assert pub.count() == 5
    # published rows are the originals (unmodified values), not coerced
    assert {r["m"] for r in pub.collect()} == {"0", "1", "2", "3", "4"}
    assert dict(pub.dtypes)["m"] == "string"
