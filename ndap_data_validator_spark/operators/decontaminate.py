"""Benchmark decontamination: flag training documents that overlap an
evaluation suite by word n-grams (the GPT-3 appendix-C / Dolma-style 13-gram
collision check) — a north-star training-data op with no counterpart in the
reference (whose scope is tabular validation, utils/validation.py).

Spark-first shape, sized for 100 TB of documents vs a ~MB benchmark suite:

  * the BENCHMARK side is tiny (eval sets are thousands of documents):
    its distinct n-gram hash set is computed once and BROADCAST — the
    corpus never shuffles for the join;
  * the corpus side is ONE projection (casefold → tokenize → n-gram →
    hash) + explode + a single groupBy(doc) with map-side partial
    aggregation; the shuffle carries (doc_id, two longs), never text;
  * joining on 8-byte hashes, not n-gram strings: a hash collision can only
    FLAG an extra n-gram (never unflag), and at 64 bits the expected extra
    flags over even 10^12 corpus n-grams are negligible.

``hash_fn='md5'`` (portable_hash64) makes the whole pipeline replayable by
the DuckDB oracle; production uses xxhash64 (JVM-side, no md5 cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ndap_data_validator_spark.functions.porthash import portable_hash64
from ndap_data_validator_spark.operators.dedup import _hash64, shingles


def benchmark_ngram_hashes(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 13,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Distinct n-gram hash set of the evaluation suite → (ng_hash). Small
    by construction — the broadcast side of every decontamination join. A
    document shorter than ``n`` tokens contributes its whole text as one
    'n-gram' (the shingles() short-text rule), so tiny benchmark items
    still match verbatim copies."""
    return (
        benchmark.select(
            F.explode(shingles(F.col(text_col), n)).alias("__ng")
        )
        .select(_hash64(F.col("__ng"), seed, hash_fn).alias("ng_hash"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_hit_ratio: float = 0.0,
) -> DataFrame:
    """Per-document contamination report:
    (id, n_ngrams, n_hits, hit_ratio, contaminated).

    ``contaminated`` = hit_ratio > max_hit_ratio; the default 0.0 flags any
    document sharing even one n-gram with the benchmark (the conservative
    pre-training policy). n_grams are DISTINCT per document (shingles()),
    so the ratio is set-overlap, not occurrence-weighted."""
    ex = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("__ng"),
    ).select(
        id_col, _hash64(F.col("__ng"), seed, hash_fn).alias("ng_hash")
    )
    marked = ex.join(
        F.broadcast(benchmark_hashes.withColumn("__hit", F.lit(1))),
        "ng_hash",
        "left",
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_ngrams"), 4
            ).alias("hit_ratio"),
            (
                F.col("n_hits").cast("double") / F.col("n_ngrams")
                > F.lit(max_hit_ratio)
            ).alias("contaminated"),
        )
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """FUZZY benchmark decontamination (the companion to the exact n-gram
    collision check above): flag training documents whose shingle-set
    Jaccard against ANY benchmark item clears ``threshold``, found via a
    cross-corpus MinHash-LSH band join — the Llama/GPT-4-report style
    near-duplicate decontamination that catches paraphrased or lightly
    edited benchmark leakage the exact 13-gram check misses.

    Returns one row per corpus document: (id, n_bench_matches,
    max_jaccard, contaminated) — max_jaccard NULL when no candidate
    survived verification.

    Scale shape, sized for 100 TB corpus vs a ~MB benchmark suite:

      * both sides share the engine's single-shuffle minhash signature
        plan (one explode + one groupBy); the benchmark's banded index AND
        its shingle sets are BROADCAST — the corpus never shuffles to be
        matched, mirroring the exact check's contract;
      * candidate pairs carry (doc_id, bench_id) only; the exact-Jaccard
        verify joins shingle sets for candidates only, with the benchmark
        side again broadcast;
      * a band bucket's join cell is |corpus_bucket| × |bench_bucket| —
        bounded by the benchmark's size on one side by assumption (eval
        suites are thousands of items), so no self-join skew cap is
        needed; the rollup is one groupBy(doc) over matches.

    ``hash_fn='md5'`` makes signatures, banding, and verification
    replayable by the DuckDB oracle."""
    from ndap_data_validator_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
        shingles,
    )

    bench = benchmark.select(
        F.col(id_col).alias(bench_id_col), F.col(text_col)
    )
    csig = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_n, seed, hash_fn=hash_fn
    )
    bsig = minhash_signatures(
        bench, text_col, bench_id_col, num_hashes, shingle_n, seed,
        hash_fn=hash_fn,
    )
    cband = banded_signatures(csig, id_col, bands, hash_fn)
    bband = banded_signatures(bsig, bench_id_col, bands, hash_fn)
    cands = (
        cband.join(F.broadcast(bband), on=["band_idx", "band_hash"])
        .select(id_col, bench_id_col)
        .distinct()
    )
    csets = docs.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("__sa")
    )
    bsets = bench.select(
        F.col(bench_id_col), shingles(F.col(text_col), shingle_n).alias("__sb")
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    matches = (
        cands.join(csets, id_col)
        .join(F.broadcast(bsets), bench_id_col)
        .select(id_col, jac.alias("__j"))
        .where(F.col("__j") >= threshold)
    )
    per_doc = matches.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("__j").alias("max_jaccard"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bench_matches"), F.lit(0)).alias(
                "n_bench_matches"
            ),
            "max_jaccard",
            F.col("n_bench_matches").isNotNull().alias("contaminated"),
        )
    )


# ----------------------------------------------------------- Bloom variant

def bloom_bitset(
    benchmark_hashes: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: int = 101,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pack the benchmark n-gram hash set into a Bloom-filter bitset →
    (word, bits): ``m_bits`` bits as 32-bit words (bit b of word w = bit
    position w·32+b), each n-gram setting ``k`` positions derived by
    re-hashing its 64-bit hash with seeds ``seed..seed+k−1``.

    This is the MEMORY-BOUNDED decontamination index (the Dolma-scale
    shape): the exact hash set grows with the benchmark suite, the Bloom
    bitset is a fixed ``m_bits/8`` bytes no matter how many n-grams go in
    — at the cost of a false-POSITIVE rate ≈ (1−e^(−k·n/m))^k, i.e. it
    can only over-flag, never miss (the safe direction for
    decontamination). ≤ ``m_bits/32`` rows — always broadcastable.

    32-bit words, not 64: ``1 << bit`` stays well inside a signed 64-bit
    in every engine (no sign-bit edge case), so the DuckDB oracle replays
    the exact same integer arithmetic."""
    j_seq = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__j")
    ex = benchmark_hashes.select("ng_hash", j_seq)
    # position_j = hash(j # ng_hash, seed) — the j prefix makes each of
    # the k probes an independent hash function
    if hash_fn == "md5":
        pos = portable_hash64(
            F.concat(F.col("__j").cast("string"), F.lit("#"), F.col("ng_hash").cast("string")),
            seed=seed,
        )
    else:
        pos = F.abs(F.xxhash64(F.col("ng_hash"), F.col("__j"), F.lit(seed)))
    pos = F.pmod(pos, F.lit(m_bits))
    return (
        ex.select(
            (pos / F.lit(32)).cast("long").alias("word"),
            (pos % F.lit(32)).cast("int").alias("__bit"),
        )
        .select(
            "word",
            F.expr("shiftleft(CAST(1 AS BIGINT), __bit)").alias("__mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def decontaminate_bloom(
    docs: DataFrame,
    bitset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: int = 42,
    bloom_seed: int = 101,
    hash_fn: str = "xxhash64",
    max_hit_ratio: float = 0.0,
) -> DataFrame:
    """Per-document contamination report against a Bloom bitset —
    same output contract as :func:`decontaminate`
    (id, n_ngrams, n_hits, hit_ratio, contaminated), where a 'hit' is a
    maybe-in answer (every true overlap hits; false positives possible at
    the documented rate, never false negatives).

    Plan: the corpus side is the SAME single projection + explode as the
    exact path; each of the ``k`` probes is a broadcast hash join against
    the ≤ m_bits/32-row bitset (no explode-by-k, no per-gram rollup), and
    the only corpus-sized exchange is the final per-doc groupBy — byte-size
    identical to the exact method's shuffle."""
    ex = docs.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("__ng"),
    ).select(
        id_col, _hash64(F.col("__ng"), seed, hash_fn).alias("ng_hash")
    )
    hit = F.lit(True)
    cur = ex
    for j in range(k):
        if hash_fn == "md5":
            pos = portable_hash64(
                F.concat(F.lit(f"{j}#"), F.col("ng_hash").cast("string")),
                seed=bloom_seed,
            )
        else:
            pos = F.abs(
                F.xxhash64(F.col("ng_hash"), F.lit(j), F.lit(bloom_seed))
            )
        pos = F.pmod(pos, F.lit(m_bits))
        w = (pos / F.lit(32)).cast("long")
        b = bitset.select(
            F.col("word").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
        )
        cur = (
            cur.withColumn(f"__word{j}", w)
            .withColumn(f"__bit{j}", (pos % F.lit(32)).cast("int"))
            .withColumn(
                f"__mask{j}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), __bit{j})"),
            )
        )
        cur = cur.join(
            F.broadcast(b), cur[f"__word{j}"] == b[f"__w{j}"], "left"
        )
        hit = hit & (
            F.coalesce(F.col(f"__b{j}"), F.lit(0)).bitwiseAND(
                F.col(f"__mask{j}")
            )
            == F.col(f"__mask{j}")
        )
    marked = cur.select(id_col, hit.cast("int").alias("__hit"))
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("__hit").alias("n_hits"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_ngrams"), 4
            ).alias("hit_ratio"),
            (
                F.col("n_hits").cast("double") / F.col("n_ngrams")
                > F.lit(max_hit_ratio)
            ).alias("contaminated"),
        )
    )


# -------------------------------------------- inline gate (streaming shape)

def bloom_words(bitset: DataFrame, m_bits: int = 1 << 20) -> list[int]:
    """Collect a :func:`bloom_bitset` frame into the DENSE driver-side
    word array the inline gate embeds (index = word, 0 for unset words):
    ``m_bits/32`` longs ≈ 256 KiB at the default size — a constant the
    driver holds and ships in the plan once, exactly like the BPE merge
    table. For filters too big to inline, the broadcast-join path
    (:func:`decontaminate_bloom`) is the shape."""
    words = [0] * (m_bits // 32)
    for r in bitset.select("word", "bits").collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_gate(
    text: "F.Column",
    words: list[int],
    n: int = 13,
    m_bits: int = 1 << 20,
    k: int = 3,
    seed: int = 42,
    bloom_seed: int = 101,
    hash_fn: str = "xxhash64",
    max_hit_ratio: float = 0.0,
):
    """Row-local Bloom contamination gate as ONE struct Column
    ``(n_ngrams, n_hits, hit_ratio, contaminated)`` — a pure projection:
    no explode, no join, no shuffle, no state. Bit-identical to
    :func:`decontaminate_bloom` over the same bitset (same shingles,
    same k probe hashes, same 32-bit word arithmetic), but the bitset
    lives as an array LITERAL so membership is ``element_at`` instead of
    a join.

    Because it is stateless it runs unchanged on a STREAMING frame in
    append mode with no watermark — the filter-the-crawl-as-it-arrives
    shape (see :func:`decontaminate_bloom_stream`). NULL text → NULL
    struct (batch explode paths drop such docs; callers filter)."""
    words_lit = F.lit(words)
    masks_lit = F.lit([1 << b for b in range(32)])

    def _hit(h):
        cond = F.lit(True)
        for j in range(k):
            if hash_fn == "md5":
                pos = portable_hash64(
                    F.concat(F.lit(f"{j}#"), h.cast("string")),
                    seed=bloom_seed,
                )
            else:
                pos = F.abs(F.xxhash64(h, F.lit(j), F.lit(bloom_seed)))
            pos = F.pmod(pos, F.lit(m_bits))
            word = F.element_at(
                words_lit, (pos / F.lit(32)).cast("int") + F.lit(1)
            )
            mask = F.element_at(
                masks_lit, (pos % F.lit(32)).cast("int") + F.lit(1)
            )
            cond = cond & (word.bitwiseAND(mask) == mask)
        return cond

    grams = shingles(text, n)
    hashes = F.transform(grams, lambda g: _hash64(g, seed, hash_fn))
    n_ngrams = F.size(grams)
    n_hits = F.size(F.filter(hashes, _hit))
    ratio = F.round(
        n_hits.cast("double") / n_ngrams.cast("double"), 4
    )
    return F.when(
        text.isNull(),
        F.lit(None).cast(
            "struct<n_ngrams:int,n_hits:int,hit_ratio:double,"
            "contaminated:boolean>"
        ),
    ).otherwise(
        F.struct(
            n_ngrams.alias("n_ngrams"),
            n_hits.alias("n_hits"),
            ratio.alias("hit_ratio"),
            (n_hits.cast("double") / n_ngrams.cast("double")
             > F.lit(max_hit_ratio)).alias("contaminated"),
        )
    )


def decontaminate_bloom_stream(
    docs: DataFrame,
    words: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    **gate_kwargs,
) -> DataFrame:
    """:func:`decontaminate_bloom`'s output contract
    (id, n_ngrams, n_hits, hit_ratio, contaminated) from the inline
    :func:`bloom_gate` — works identically on a batch frame and on a
    ``readStream`` frame (stateless projection → append mode, no
    watermark, no state store). Docs with NULL text drop out, matching
    the batch explode paths. At 100 TB of arriving crawl this is the
    production gate: the Bloom constant rides the closure, every
    executor filters its own rows, nothing shuffles."""
    gate = bloom_gate(F.col(text_col), words, **gate_kwargs)
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), gate.alias("__g"))
        .select(
            id_col,
            F.col("__g.n_ngrams").cast("long").alias("n_ngrams"),
            F.col("__g.n_hits").cast("long").alias("n_hits"),
            F.col("__g.hit_ratio").alias("hit_ratio"),
            F.col("__g.contaminated").alias("contaminated"),
        )
    )
