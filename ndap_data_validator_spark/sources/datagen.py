"""Deterministic synthetic `transcripts` / `tool_catalog` generators.

Shape per BASELINE.json ``input_hint``: transcripts(conv_id string,
turn_idx int, role string, text string, tool string, ts timestamp), with the
injected edge cases from FIXTURES.md §1 (null conv_ids, duplicate
(conv_id, turn_idx) pairs, negative turn_idx, invalid roles, dangling tool
references, null ts, one skewed conversation holding ~20% of rows).

Everything is ``spark.range(n)`` + pure column expressions seeded through
``xxhash64`` — no driver loops, no Python row functions, no RNG state. The
same generator therefore produces the identical table at any scale factor on
any cluster layout, which is what lets bench runs at local[8] and local[32]
share one input definition.

Determinism contract: text depends only on (conv_id, turn_idx, seed), so
"per-turn text equality under stable (conv_id, turn_idx) ordering" holds
between any two generations with the same seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOOL_COUNT = 50
_WORDS = [
    "plan", "scan", "merge", "join", "filter", "agg", "sort", "window",
    "batch", "stream", "shuffle", "spill", "hash", "probe", "build",
    "vector", "column", "row", "key", "value",
]


def _rand(unit: Column, seed: int, tag: int, mod: int) -> Column:
    """Deterministic pseudo-uniform int in [0, mod) from (unit, seed, tag)."""
    return F.pmod(F.xxhash64(unit, F.lit(seed), F.lit(tag)), F.lit(mod))


def transcripts(
    spark: SparkSession,
    n_rows: int = 5_000,
    n_convs: int = 200,
    seed: int = 42,
    inject_violations: bool = True,
    turn_shift: int = 0,
    shift_fraction: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the transcripts table.

    ``inject_violations=False`` + ``seed=41`` is the drift baseline of
    FIXTURES.md §3; ``turn_shift``/``shift_fraction`` deliberately shift the
    turn_idx distribution to trip KS/PSI in drift tests.

    Row→conversation layout (arithmetic, no windows): row ids with
    ``id % 5 == 0`` land in the single skewed conversation (~20% of rows);
    the rest round-robin over ``n_convs - 1`` conversations. ``turn_idx`` is
    unique within each conversation by construction, then ~0.2% of rows are
    remapped onto their predecessor turn to create uniqueness violations.
    """
    m = max(n_convs - 1, 1)
    # explicit numPartitions → generated-table layout is independent of the
    # generating session's core count (no shuffle needed to spread it)
    df = (
        spark.range(0, n_rows, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_rows)
    )  # id: 0..n-1
    rid = F.col("id")

    is_skew = rid % 5 == 0
    conv_no = F.when(is_skew, F.lit(0)).otherwise((rid % m) + 1)
    turn = F.when(is_skew, (rid / 5).cast("int")).otherwise(
        (rid / m).cast("int")
    )

    if inject_violations:
        # ~0.2% duplicate (conv, turn) pairs: collide with the previous turn
        dup = _rand(rid, seed, 1, 1000) < 2
        turn = F.when(dup & (turn > 0), turn - 1).otherwise(turn)
        # a few negative turn indices (range-rule violations)
        neg = _rand(rid, seed, 2, 2000) < 1
        turn = F.when(neg, F.lit(-1)).otherwise(turn)

    if shift_fraction > 0:
        shifted = _rand(rid, seed, 9, 1000) < int(shift_fraction * 1000)
        turn = F.when(shifted, turn + F.lit(turn_shift)).otherwise(turn)

    conv_id = F.concat(F.lit("conv-"), F.lpad(conv_no.cast("string"), 6, "0"))
    if inject_violations:
        conv_id = F.when(_rand(rid, seed, 3, 1000) < 5, F.lit(None)).otherwise(conv_id)

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(turn, 3) + 1).cast("int"),
    )
    if inject_violations:
        role = (
            F.when(_rand(rid, seed, 4, 2000) < 3, F.lit("sys?"))
            .when(_rand(rid, seed, 4, 2000) == 3, F.lit(""))
            .otherwise(role)
        )

    # text: deterministic per (conv, turn) — 8 seeded lorem words
    word_arr = F.array(*[F.lit(w) for w in _WORDS])
    lorem = F.concat_ws(
        " ",
        *[
            F.element_at(
                word_arr,
                (
                    F.pmod(
                        F.xxhash64(conv_no, turn, F.lit(seed), F.lit(100 + k)),
                        F.lit(len(_WORDS)),
                    )
                    + 1
                ).cast("int"),
            )
            for k in range(8)
        ],
    )
    text = F.concat(
        F.lit("turn "), turn.cast("string"), F.lit(" of conv "),
        conv_no.cast("string"), F.lit(": "), lorem,
    )
    if inject_violations:
        text = (
            F.when(_rand(rid, seed, 5, 1000) < 5, F.lit(None))
            .when(_rand(rid, seed, 5, 1000) == 5, F.lit(""))
            .otherwise(text)
        )

    tool_no = _rand(rid, seed, 6, TOOL_COUNT)
    tool = F.when(
        role == "tool",
        F.concat(F.lit("tool-"), F.lpad(tool_no.cast("string"), 3, "0")),
    ).otherwise(F.lit(None).cast("string"))
    if inject_violations:
        # ~0.4% dangling references: tool-9xx outside the catalog
        bad = _rand(rid, seed, 7, 1000) < 4
        tool = F.when(
            (role == "tool") & bad,
            F.concat(F.lit("tool-9"), F.lpad(_rand(rid, seed, 8, 100).cast("string"), 2, "0")),
        ).otherwise(tool)

    ts = F.timestamp_seconds(F.lit(1767225600) + rid)  # 2026-01-01T00:00:00Z + id sec
    if inject_violations:
        ts = F.when(_rand(rid, seed, 10, 1000) < 2, F.lit(None)).otherwise(ts)

    return df.select(
        conv_id.alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def tool_catalog(spark: SparkSession) -> DataFrame:
    """The referenced dimension for RI checks (FIXTURES.md §2): exactly the
    valid tool ids; generator violations point outside this set."""
    return spark.range(TOOL_COUNT).select(
        F.concat(F.lit("tool-"), F.lpad(F.col("id").cast("string"), 3, "0")).alias(
            "tool_id"
        ),
        F.concat(F.lit("Tool "), F.col("id").cast("string")).alias("tool_name"),
    )
