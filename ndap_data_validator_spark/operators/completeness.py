"""Partition-completeness census: did every EXPECTED partition actually
arrive, and with enough rows? The dual of per-row validation — a table
whose every row passes every rule can still be missing yesterday's crawl
entirely, and no row-level or dataset-level metric over the rows that DID
land can see that. The check needs the expected key manifest (a calendar
of dates, a list of sources, a shard map) as external input.

The reference has no counterpart (it validates the files it was handed —
``/root/reference/main.py`` iterates uploads); this is engine scope,
north-star: the first gate a 10^12-turn scheduled ingest runs each batch.

Scale shape (100 TB): per-key counts are ONE map-side-combined shuffle
that shrinks the corpus to |distinct keys| rows; the expected manifest is
thousands of entries at most, enters as a JVM literal-array explode over
``spark.range(1)`` (never a Python-RDD-backed ``createDataFrame`` — the
r4 CartesianProduct lesson) and broadcast-joins onto the counts. Output
is O(|expected| + |unexpected keys|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partition_completeness"]


def partition_completeness(
    df: DataFrame,
    key: str,
    expected_keys: list | DataFrame,
    min_rows: int = 1,
) -> DataFrame:
    """Census of ``df``'s partitions (distinct ``key`` values) against the
    ``expected_keys`` manifest.

    Returns one row per expected OR observed key:
    ``(key, n_rows, expected, status)`` with status

      * ``missing``    — expected, zero rows arrived
      * ``undersized`` — expected, ``0 < n_rows < min_rows``
      * ``ok``         — expected, ``n_rows >= min_rows``
      * ``unexpected`` — rows arrived under a key the manifest doesn't know
        (a misroute or schema drift upstream; never silently counted as ok)

    Keys compare as strings (manifests are strings in practice; cast once
    here so int/date keys work unchanged). ``min_rows`` is the cheap
    volume floor — pair with ``MetricRule("row_count", ...)`` bounds when
    the expectation is per-partition-tight rather than a global floor.

    ``expected_keys`` may also be a one-column DataFrame — the form a
    manifest that is itself a table (a calendar dimension, a shard map,
    yesterday's observed keys) arrives in, and the scale path when the
    manifest outgrows a driver list. It is deduplicated here (list
    manifests fail fast on duplicates instead: a hand-written duplicate
    is a bug worth surfacing).
    """
    if min_rows < 1:
        raise ValueError("min_rows must be >= 1")
    if isinstance(expected_keys, DataFrame):
        if len(expected_keys.columns) != 1:
            raise ValueError(
                "a DataFrame manifest must have exactly one column, got "
                f"{expected_keys.columns}"
            )
        expected = (
            expected_keys.select(
                F.col(expected_keys.columns[0]).cast("string").alias("key")
            )
            .where(F.col("key").isNotNull())
            .distinct()
            .withColumn("expected", F.lit(True))
        )
    else:
        if not expected_keys:
            raise ValueError("expected_keys is empty — nothing to check")
        if len(set(str(k) for k in expected_keys)) != len(expected_keys):
            raise ValueError("expected_keys contains duplicates")
        lits = [F.lit(k).cast("string") for k in expected_keys]
        spark = df.sparkSession
        expected = spark.range(1).select(
            F.explode(F.array(*lits)).alias("key"),
            F.lit(True).alias("expected"),
        )
    counts = (
        df.select(F.col(key).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # NO broadcast hint here: FULL OUTER cannot build a broadcast hash
    # side, so the hint would degrade to BroadcastNestedLoopJoin. Both
    # inputs are |keys|-sized (the corpus already shrank in the groupBy);
    # AQE picks a cheap SMJ/shuffled-hash over metadata-sized frames.
    j = counts.join(expected, on="key", how="full_outer")
    n = F.coalesce(F.col("n_rows"), F.lit(0))
    is_exp = F.col("expected").isNotNull()
    status = (
        F.when(~is_exp, F.lit("unexpected"))
        .when(n == 0, F.lit("missing"))
        .when(n < F.lit(min_rows), F.lit("undersized"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "key",
        n.alias("n_rows"),
        is_exp.alias("expected"),
        status.alias("status"),
    )
