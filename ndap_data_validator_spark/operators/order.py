"""Epoch-aware training-order manifest: the step between mixture weighting
(``curate.corpus_mixture_report``) and packing (``operators/pack.py``).

Given a curated corpus and a per-source epoch plan (e.g. wiki ×3.0,
web ×0.8 — the data-card "epochs" column of every modern pretraining mix),
emit the deterministic global training order: each document appears
``floor(epochs)`` times plus a hash-gated fractional epoch, every copy
tagged with its epoch index and a seeded shuffle key, so sorting by
``order_key`` IS the shuffled, interleaved training stream that the packer
consumes. Everything is a pure function of (doc_id, epoch_idx, seed):
stable under repartition, retry, and engine choice — no RNG state.

Plan shape at 100 TB:

  * the epoch expansion is ``explode(sequence(0, n_copies−1))`` — a
    scan-level Generate, no shuffle; the per-source copy count rides in via
    a broadcast join on the (tiny) plan table;
  * the fractional epoch is a hash-gate predicate on the LAST copy (the
    ``operators/sample.py`` philosophy) — no shuffle, pushdown applies;
  * the shuffle key is one hash expression; producing a physically ordered
    stream is ``repartitionByRange(order_key)`` + ``sortWithinPartitions``
    — Spark samples range bounds, so the total order costs ONE exchange
    and never a single-reducer global sort;
  * interleaving needs no bookkeeping: uniform hash keys mix sources in
    proportion to their expanded sizes by construction.

No counterpart in the reference (tabular validation only) — north-star
training-data op alongside DSIR (``operators/dsir.py``) and packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.porthash import portable_hash64

_FRAC_MOD = 1 << 20


def training_order(
    docs: DataFrame,
    epochs: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 41,
    order_partitions: int | None = None,
) -> DataFrame:
    """Expand ``docs`` into the training-order manifest
    ``(source, id, epoch_idx, order_key)``.

    ``epochs[source]`` may be fractional: ``2.5`` repeats every document
    twice and admits a deterministic ~50% of documents a third time (the
    gate hashes (id, source, seed), so the fractional subset is a fixed,
    engine-independent set — NOT a per-run sample). Sources absent from
    the plan default to 1.0; a plan entry ≤ 0 drops the source.

    Pass ``order_partitions`` to also apply the physical ordering
    (range-exchange + in-partition sort); leave ``None`` to get the
    manifest with the key only — e.g. when the packer's shard routing
    supersedes the total order.
    """
    from ndap_data_validator_spark.session import literal_frame

    rows = [(s, float(e)) for s, e in epochs.items()]
    plan = literal_frame(
        docs.sparkSession, rows, f"{source_col} string, __epochs double"
    )
    ex = docs.join(F.broadcast(plan), source_col, "left").withColumn(
        "__epochs", F.coalesce("__epochs", F.lit(1.0))
    )
    n_full = F.floor(F.col("__epochs")).cast("int")
    frac = F.col("__epochs") - F.floor(F.col("__epochs"))
    # deterministic fractional gate: copy n_full (the one PAST the full
    # repeats) exists iff hash(id, source, seed) falls under frac
    gate_h = portable_hash64(
        F.concat_ws(" ", F.col(id_col).cast("string"), F.col(source_col)),
        seed=seed,
    )
    in_frac = (F.pmod(gate_h, F.lit(_FRAC_MOD)) + 0.5) / F.lit(
        float(_FRAC_MOD)
    ) < frac
    n_copies = n_full + F.when(in_frac, 1).otherwise(0)
    out = (
        ex.where(n_copies > 0)
        .select(
            source_col,
            id_col,
            F.explode(
                F.sequence(F.lit(0), n_copies - 1)
            ).alias("epoch_idx"),
        )
        .withColumn(
            "order_key",
            portable_hash64(
                F.concat_ws(
                    " ",
                    F.col(id_col).cast("string"),
                    F.col(source_col),
                    F.col("epoch_idx").cast("string"),
                ),
                seed=seed + 1,
            ),
        )
    )
    if order_partitions is not None:
        out = out.repartitionByRange(
            order_partitions, "order_key"
        ).sortWithinPartitions("order_key")
    return out
