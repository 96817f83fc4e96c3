"""Cross-engine portable 60-bit hash.

``xxhash64`` is the production hash everywhere in this engine (one JVM-side
pass, seedable, no string formatting) — but it is Spark-specific, so results
built on it cannot be independently verified by another SQL engine. For
verification paths we expose ``portable_hash64``: the first 15 hex chars of
md5 read as an integer, which any engine can express::

    Spark : CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
    Trino : from_base(substr(to_hex(md5(to_utf8(s))), 1, 15), 16)

15 hex chars = 60 bits, always non-negative, fits signed 64. Seeding is by
prefixing ``"<seed>:"`` to the input so every engine concatenates the same
bytes. md5 costs more than xxhash64 per value — use it for oracle-checked /
cross-engine paths, not the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column, seed: int | None = None) -> Column:
    s = col.cast("string")
    if seed is not None:
        s = F.concat(F.lit(f"{seed}:"), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-dialect rendering of the same hash, for oracle SQL."""
    s = f"'{seed}:' || ({expr})" if seed is not None else f"({expr})"
    return f"CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"
