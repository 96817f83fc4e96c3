"""Iceberg integration for the ``iceberg:`` source seam (S10's production
half) — GATED on the Iceberg runtime jar being on the Spark classpath.

This sandbox ships pyspark without the iceberg-spark-runtime jar and has no
network for ``spark.jars.packages``, so these tests SKIP here with a reason;
on a cluster (or any env with the jar) they run for real: create an Iceberg
table, read it through ``load_table('iceberg:db', ...)``, run a checkpointed
validation over it, evolve the schema via real ``ALTER TABLE`` and re-run
in ``structure_change`` mode.

A dedicated session is built per-test because Iceberg catalogs must be
configured at session build time (spark.sql.catalog.* is static).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


def _iceberg_available() -> bool:
    """True iff the Iceberg Spark runtime is importable by the JVM."""
    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _iceberg_available(),
    reason="iceberg-spark-runtime jar not on the classpath (sandbox has no "
    "Iceberg jars and no network for spark.jars.packages); runs on a real "
    "cluster image",
)


@pytest.fixture()
def iceberg_spark(tmp_path):
    """Session with a hadoop-catalog Iceberg warehouse under tmp_path."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-it")
        .config(
            "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_iceberg_load_table_roundtrip(iceberg_spark, tmp_path):
    from ndap_data_validator_spark.sources.tables import load_table

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
    spark.sql(
        "CREATE TABLE it.db.orders (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_totalprice DOUBLE) USING iceberg"
    )
    spark.sql(
        "INSERT INTO it.db.orders VALUES (1, 10, 100.0), (2, 20, 200.0)"
    )
    df = load_table(spark, "iceberg:it.db", "orders")
    assert df.count() == 2
    assert set(df.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_iceberg_validation_run_and_structure_change(iceberg_spark, tmp_path):
    """End-to-end: checkpointed run over an Iceberg table, then a REAL
    ``ALTER TABLE ADD COLUMN`` + structure_change re-validation."""
    from ndap_data_validator_spark.plans.pipeline import run_validation
    from ndap_data_validator_spark.rules.model import ColumnAssignment
    from ndap_data_validator_spark.sources.tables import load_table

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
    spark.sql(
        "CREATE TABLE it.db.tx (part STRING, t STRING, m STRING) "
        "USING iceberg"
    )
    spark.sql(
        "INSERT INTO it.db.tx VALUES ('p0','2021','1'), ('p1','2021','2')"
    )
    assigns = [
        ColumnAssignment("part", "Others"),
        ColumnAssignment("t", "Time"),
        ColumnAssignment("m", "Measures", "integer"),
    ]
    df = load_table(spark, "iceberg:it.db", "tx")
    out = run_validation(
        spark, df, assigns, "part",
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    assert sorted(out.processed_partitions) == ["p0", "p1"]

    # schema evolution on the real table
    spark.sql("ALTER TABLE it.db.tx ADD COLUMN extra STRING")
    spark.sql("INSERT INTO it.db.tx VALUES ('p2','2021','3','x')")
    evolved = load_table(spark, "iceberg:it.db", "tx")
    assert "extra" in evolved.columns
    out2 = run_validation(
        spark, evolved, assigns + [ColumnAssignment("extra", "Others")],
        "part", checkpoint_path=str(tmp_path / "ckpt"),
        load_mode="structure_change",
    )
    assert sorted(out2.processed_partitions) == ["p0", "p1", "p2"]
