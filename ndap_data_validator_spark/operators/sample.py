"""Deterministic sampling for training-data pipelines.

``df.sample`` is seed-stable only per partitioning — repartition the input
and the sample changes, and no external engine can reproduce it. Hash-gate
sampling is the production-grade alternative: a row is in the sample iff
``hash(key) mod M < fraction·M``. Properties a 100 TB pipeline needs:

  * deterministic under ANY partitioning / retry / engine — the gate is a
    pure function of the key;
  * consistent across tables — the same key samples in or out everywhere,
    so joins between sampled tables stay aligned;
  * incremental — newly arrived rows of a kept key join the sample without
    resampling history.

Built on the md5 portable hash so the DuckDB oracle applies the identical
gate (the xxhash64 variant is available for hot paths where cross-engine
replay is not needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.porthash import portable_hash64

_GATE_MOD = 1_000_000


def sample_gate(
    key: Column, fraction: float, seed: int = 42, hash_fn: str = "md5"
) -> Column:
    """Boolean gate: True for rows inside the deterministic sample."""
    threshold = int(round(fraction * _GATE_MOD))
    if hash_fn == "md5":
        h = portable_hash64(key, seed=seed)
    else:
        h = F.abs(F.xxhash64(key, F.lit(seed)))
    return F.pmod(h, F.lit(_GATE_MOD)) < F.lit(threshold)


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
    hash_fn: str = "md5",
) -> DataFrame:
    """Filter to the deterministic ~``fraction`` sample keyed on
    ``key_col``. Pure filter — predicate pushdown applies, no shuffle."""
    return df.where(sample_gate(F.col(key_col), fraction, seed, hash_fn))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: int = 42,
    hash_fn: str = "md5",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic hash-gate sampling — the training-mix
    composition op (rebalance languages / quality buckets / sources with a
    different keep-rate each). Strata sets are catalog-sized, so the
    rate lookup is a literal map folded into the filter: the whole operator
    stays a pure pushdown-friendly predicate, no shuffle, and keeps every
    hash-gate property (retry/partitioning/engine stable, cross-table
    consistent for the same key).

    Per-stratum thresholds are precomputed INTEGERS (``round(rate·M)``), so
    an external engine replays the gate without float-rounding drift."""
    thresholds = {s: int(round(r * _GATE_MOD)) for s, r in rates.items()}
    thr = F.lit(int(round(default_rate * _GATE_MOD)))
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(thr)
    if hash_fn == "md5":
        h = portable_hash64(F.col(key_col), seed=seed)
    else:
        h = F.abs(F.xxhash64(F.col(key_col), F.lit(seed)))
    return df.where(F.pmod(h, F.lit(_GATE_MOD)) < thr)


def stratified_sample_sql(
    strata_expr: str,
    rates: dict[str, float],
    key_expr: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> str:
    """DuckDB rendering of the stratified gate (same integer thresholds)."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql

    cases = " ".join(
        f"WHEN {strata_expr} = '{s}' THEN {int(round(r * _GATE_MOD))}"
        for s, r in sorted(rates.items())
    )
    thr = f"(CASE {cases} ELSE {int(round(default_rate * _GATE_MOD))} END)"
    return f"({portable_hash64_sql(key_expr, seed)} % {_GATE_MOD}) < {thr}"


def sample_gate_sql(key_expr: str, fraction: float, seed: int = 42) -> str:
    """The DuckDB rendering of the same gate, for oracle SQL."""
    from ndap_data_validator_spark.functions.porthash import portable_hash64_sql

    threshold = int(round(fraction * _GATE_MOD))
    return f"({portable_hash64_sql(key_expr, seed)} % {_GATE_MOD}) < {threshold}"
