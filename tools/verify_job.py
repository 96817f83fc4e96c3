"""User-style end-to-end job driving the engine via its public API only."""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ndap_data_validator_spark.operators.validate import ValidationEngine
from ndap_data_validator_spark.operators.uniqueness import (
    duplicate_keys,
    duplicate_keys_hashed,
)
from ndap_data_validator_spark.operators.referential import ri_violation_counts
from ndap_data_validator_spark.operators import drift as drift_mod
from ndap_data_validator_spark.plans.pipeline import (
    run_validation,
    salt_repartition,
    new_run_id,
)
from ndap_data_validator_spark.plans.checkpoint import CheckpointStore
from ndap_data_validator_spark.rules.model import ColumnAssignment
from ndap_data_validator_spark.sources.datagen import transcripts

spark = (
    SparkSession.builder.appName("verify-job")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = transcripts(spark, 50_000, 500, seed=42)
assigns = [
    ColumnAssignment("conv_id", "Location"),
    ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
    ColumnAssignment("role", "Others", regex=r"^(user|assistant|tool)$"),
]

res = ValidationEngine().validate(df, assigns, partition_by=F.substring("conv_id", 1, 9))
rep = {r["column"]: r for r in res.per_column_report.where(F.col("partition_id").isNotNull()).collect()[:50]}
print("per-column sample:", {k: (v["nulls"], v["conversion_errors"], v["passed"]) for k, v in list(rep.items())[:6]})

dups = duplicate_keys(df, ["conv_id", "turn_idx"]).count()
dups_h = duplicate_keys_hashed(df, ["conv_id", "turn_idx"]).count()
print("duplicate keys:", dups, "hashed-path:", dups_h)
assert dups == dups_h, "two-phase hashed uniqueness must equal exact"

dups_salted = duplicate_keys(
    salt_repartition(df, "conv_id", num_partitions=8), ["conv_id", "turn_idx"]
).count()
assert dups_salted == dups, "salted plan must be result-identical"

tools = spark.createDataFrame([(f"tool-{k:03d}",) for k in range(50)], "tool_id string")
ri = ri_violation_counts(df.where(F.col("tool").isNotNull()), "tool", tools, "tool_id")
print("RI violating tool ids:", ri.count())

# checkpointed run with report writing on a VANILLA session (no dynamic
# overwrite session conf) — exercises the writer-local overwrite mode fix
import tempfile, os
base = tempfile.mkdtemp(prefix="verify_run_")
run_id = new_run_id()
out1 = run_validation(
    spark, df, assigns, F.substring("conv_id", 1, 9),
    checkpoint_path=os.path.join(base, "ckpt"), run_id=run_id,
    report_path=os.path.join(base, "report"),
)
n_parts = len(out1.processed_partitions)
rows1 = spark.read.parquet(os.path.join(base, "report/per_column")).count()
# resume: everything done → second run must NOT wipe existing report rows
out2 = run_validation(
    spark, df, assigns, F.substring("conv_id", 1, 9),
    checkpoint_path=os.path.join(base, "ckpt"), run_id=run_id,
    report_path=os.path.join(base, "report"),
)
rows2 = spark.read.parquet(os.path.join(base, "report/per_column")).count()
print("report rows after run/resume:", rows1, rows2, "partitions:", n_parts)
assert rows1 == rows2 and rows1 > 0, "resume must not wipe done partitions' reports"
assert out2.skipped_partitions == out1.processed_partitions

# drift: baseline vs shifted-by-multiple-bin-widths current
snap = drift_mod.snapshot(df.where(F.col("turn_idx").isNotNull()), ["turn_idx"], n_bins=32)
shifted = df.withColumn("turn_idx", F.col("turn_idx") + F.lit(2000))
(dr,) = drift_mod.drift_check(shifted, snap)
print("drift ks/psi:", round(dr.ks, 4), round(dr.psi, 4))
assert dr.drifted(), "a multi-bin-width shift must trip drift"

# distributed exact KS vs the binned check on the same split
from ndap_data_validator_spark.operators.drift import ks_exact_distributed
half = df.where(F.col("turn_idx").isNotNull())
ksd = ks_exact_distributed(
    half.where(F.col("turn_idx") % 2 == 0),
    half.where(F.col("turn_idx") % 2 == 1),
    "turn_idx",
).first()
print("distributed exact KS:", round(ksd["ks"], 4), ksd["n_a"], ksd["n_b"])
assert 0.0 <= ksd["ks"] <= 1.0 and ksd["n_a"] > 0

# dedup skew guards end-to-end
from ndap_data_validator_spark.operators.dedup import (
    minhash_near_duplicates, ngram_jaccard_pairs,
)
docs = df.where(F.col("text").isNotNull()).limit(2000).select(
    F.monotonically_increasing_id().alias("doc_id"), "text")
docs = docs.cache()
nd = minhash_near_duplicates(docs, threshold=0.9, max_bucket_size=64)
print("minhash near-dups found:", nd.count())
nj = ngram_jaccard_pairs(docs.limit(150), n=1, threshold=0.95, max_token_df=100)
print("ngram near-dup pairs:", nj.count())

# IVF ANN with the new deterministic seed-centroid path + md5-portable minhash
from ndap_data_validator_spark.operators.similarity import ivf_topk
emb = spark.range(500).select(
    F.col("id").alias("vec_id"),
    F.transform(F.sequence(F.lit(0), F.lit(15)),
                lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0)
               ).alias("embedding"))
ivf = ivf_topk(emb, emb.where(F.col("vec_id") < 3), k=4, n_centroids=6, n_probe=6)
print("ivf rows:", ivf.count())
assert ivf.count() == 12

md5_dups = minhash_near_duplicates(docs.limit(200), threshold=0.9, hash_fn="md5")
print("md5-portable minhash near-dups:", md5_dups.count())

# delta load mode: append rows, delta run validates only the new ones, and
# the folded report equals a full re-run's
d1 = spark.createDataFrame([(f"p{i%3}", i, float(i)) for i in range(300)],
                           "part string, seq long, m double")
d2 = spark.createDataFrame([(f"q{i%2}", i, float(i)) for i in range(300, 500)],
                           "part string, seq long, m double")
massigns = [ColumnAssignment("part", "Location"), ColumnAssignment("m", "Measures", "float")]
dbase = tempfile.mkdtemp(prefix="verify_delta_")
run_validation(spark, d1, massigns, "part", checkpoint_path=f"{dbase}/c",
               report_path=f"{dbase}/r", load_mode="delta", watermark_col="seq")
o2 = run_validation(spark, d1.unionByName(d2), massigns, "part",
                    checkpoint_path=f"{dbase}/c", report_path=f"{dbase}/r",
                    load_mode="delta", watermark_col="seq")
assert sorted(o2.processed_partitions) == ["q0", "q1"], o2.processed_partitions
run_validation(spark, d1.unionByName(d2), massigns, "part",
               checkpoint_path=f"{dbase}/c2", report_path=f"{dbase}/r2",
               load_mode="full_reload")
# delta-mode report dirs carry a delta_batch partition key (r03: batches
# accumulate; retries overwrite only their own batch) — drop it to fold
ra = spark.read.parquet(f"{dbase}/r/per_column").drop("delta_batch")
rb = spark.read.parquet(f"{dbase}/r2/per_column")
assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0
print("delta-vs-full report rows:", ra.count())

# r03: second delta batch into an EXISTING partition must not clobber the
# prior batch's published rows; failed batches keep the watermark
d3 = spark.createDataFrame([(f"q{i%2}", i, float(i)) for i in range(500, 560)],
                           "part string, seq long, m double")
o3 = run_validation(spark, d1.unionByName(d2).unionByName(d3), massigns, "part",
                    checkpoint_path=f"{dbase}/c", report_path=f"{dbase}/r",
                    load_mode="delta", watermark_col="seq")
assert sorted(o3.processed_partitions) == ["q0", "q1"], o3.processed_partitions
rc = spark.read.parquet(f"{dbase}/r/per_column")
assert rc.select("delta_batch").distinct().count() == 3
print("delta batches accumulated:", 3)

# csv: source scheme
from ndap_data_validator_spark.sources.tables import load_table
cbase = tempfile.mkdtemp(prefix="verify_csv_")
d1.coalesce(1).write.mode("overwrite").option("header", "true").csv(f"{cbase}/t.csv")
cback = load_table(spark, f"csv:{cbase}", "t", schema="part string, seq long, m double")
assert cback.count() == 300
print("csv roundtrip rows:", cback.count())

# S10 schema evolution: mergeSchema read + aligned structure_change run
from ndap_data_validator_spark.sources.evolution import (
    align_to_schema, evolved_read, schema_diff)
ebase = tempfile.mkdtemp(prefix="verify_evo_")
spark.createDataFrame([("p0", 1)], "part string, m int").write.mode("overwrite").parquet(f"{ebase}/t")
spark.createDataFrame([("p1", 2, "x")], "part string, m int, tag string").write.mode("append").parquet(f"{ebase}/t")
evo = evolved_read(spark, f"{ebase}/t")
diff = schema_diff(spark.createDataFrame([], "part string, m int").schema, evo.schema)
assert diff.added == ["tag"] and diff.is_structure_change
aligned = align_to_schema(evo, evo.schema)
oevo = run_validation(spark, aligned, [ColumnAssignment("part", "Location")],
                      "part", checkpoint_path=f"{ebase}/c", load_mode="structure_change")
print("structure_change partitions:", sorted(oevo.processed_partitions))
assert sorted(oevo.processed_partitions) == ["p0", "p1"]

# clusters / sessions / deterministic sampling
from ndap_data_validator_spark.operators.dedup import connected_components, dedup_keepers
from ndap_data_validator_spark.operators.sessions import session_rollup
from ndap_data_validator_spark.operators.sample import deterministic_sample
pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
cc = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
ev = df.where(F.col("ts").isNotNull() & F.col("conv_id").isNotNull())
sess = session_rollup(ev, key_col="conv_id", ts_col="ts", timeout_sec=600,
                      order_tiebreak="turn_idx")
print("sessions:", sess.count())
samp = deterministic_sample(df, "conv_id", 0.25, seed=7)
s1, s2 = samp.count(), deterministic_sample(df.repartition(17), "conv_id", 0.25, seed=7).count()
assert s1 == s2
print("deterministic sample rows:", s1)

# stateful streaming: windowed counts + applyInPandasWithState sessions
from ndap_data_validator_spark.streaming.stateful import (
    windowed_event_counts, sessionize_stream)
wbase = tempfile.mkdtemp(prefix="verify_stream_")
ev2 = spark.createDataFrame(
    [(i % 5, ["a","b"][i % 2], f"2026-01-01 00:{i % 60:02d}:00") for i in range(120)],
    "user_id long, event_type string, ts string"
).select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
ev2.coalesce(2).write.mode("overwrite").parquet(f"{wbase}/src")
stream = spark.readStream.schema("user_id long, event_type string, ts timestamp").parquet(f"{wbase}/src")
q1 = (windowed_event_counts(stream).writeStream.format("memory").queryName("vw")
      .outputMode("append").option("checkpointLocation", f"{wbase}/c1")
      .trigger(availableNow=True).start())
q1.awaitTermination(120)
q2 = (sessionize_stream(stream, timeout_sec=600).writeStream.format("memory")
      .queryName("vs").outputMode("update")
      .option("checkpointLocation", f"{wbase}/c2")
      .trigger(availableNow=True).start())
q2.awaitTermination(120)
print("windowed rows:", spark.sql("SELECT count(*) FROM vw").first()[0],
      "session rows:", spark.sql("SELECT count(*) FROM vs").first()[0])
assert spark.sql("SELECT count(*) FROM vs").first()[0] > 0

# jsonl: source scheme
jbase = tempfile.mkdtemp(prefix="verify_jsonl_")
d1.coalesce(1).write.mode("overwrite").json(f"{jbase}/t.jsonl")
jback = load_table(spark, f"jsonl:{jbase}", "t", schema="part string, seq long, m double")
assert jback.count() == 300
print("jsonl roundtrip rows:", jback.count())

# PII scrub over transcript text
from ndap_data_validator_spark.functions.pii import pii_count, redact_pii
ptxt = df.where(F.col("text").isNotNull()).limit(500).select(
    F.concat(F.col("text"), F.lit(" reach me at x.y@example.net or 10.0.0.7")).alias("t"))
prow = ptxt.select(
    F.sum(pii_count(F.col("t"), "email")).alias("e"),
    F.sum(pii_count(F.col("t"), "ipv4")).alias("i"),
    F.sum((F.instr(redact_pii(F.col("t")), "@") > 0).cast("long")).alias("leaks"),
).first()
assert prow["e"] == 500 and prow["i"] == 500 and prow["leaks"] == 0
print("pii scrub: 500 emails + 500 ips redacted, 0 leaks")

# repetition-ratio quality signal
from ndap_data_validator_spark.functions.textstats import repetition_ratio
rr = df.where(F.col("text").isNotNull()).limit(1000).agg(
    F.avg(repetition_ratio(F.col("text"), 3)).alias("avg_rr"),
    F.max(repetition_ratio(F.col("text"), 3)).alias("max_rr"),
).first()
assert rr["avg_rr"] is not None and 0.0 <= rr["avg_rr"] <= 1.0
print("repetition ratio avg/max:", round(rr["avg_rr"], 4), round(rr["max_rr"], 4))

# r03 ops: decontamination, stratified sample, tf-idf, URL filter,
# distributed exact percentiles, checkpoint compaction
from ndap_data_validator_spark.operators.decontaminate import (
    benchmark_ngram_hashes, decontaminate,
)
from ndap_data_validator_spark.operators.sample import stratified_sample
from ndap_data_validator_spark.operators.tfidf import tfidf_top_terms
from ndap_data_validator_spark.functions.urls import domain_blocklist_filter
from ndap_data_validator_spark.operators.stats import (
    exact_percentiles_distributed,
)

# deterministic doc set (limit() picks different rows per job): one text
# per conversation, benchmark = conv ids ending in 00
docs = (
    df.where(F.col("turn_idx") == 0)
    .where(F.col("text").isNotNull())
    .select(F.col("conv_id").alias("doc_id"), "text")
)
bench_set = docs.where(F.col("doc_id").endswith("00"))
n_bench = bench_set.count()
rep = decontaminate(docs, benchmark_ngram_hashes(bench_set, n=5), n=5)
n_cont = rep.where(F.col("contaminated")).count()
assert n_cont >= n_bench > 0, (n_cont, n_bench)
print("decontamination: contaminated docs:", n_cont, "of bench", n_bench)

strat = stratified_sample(df, "role", {"user": 0.5, "assistant": 0.05}, "conv_id", seed=3)
counts = {r["role"]: r["n"] for r in strat.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()}
assert set(counts) <= {"user", "assistant"} and counts.get("user", 0) > counts.get("assistant", 0)
print("stratified sample counts:", counts)

tt = tfidf_top_terms(docs, k=2, min_df=2, bm25=True)
mx = tt.groupBy("doc_id").count().agg(F.max("count")).first()[0]
assert mx is not None and mx <= 2, mx
bstats = tt.agg(F.min("bm25"), F.max("bm25")).first()
assert bstats[0] is not None and bstats[0] >= 0, bstats
print("tfidf top-term rows:", tt.count(), "bm25 range",
      round(bstats[0], 3), "-", round(bstats[1], 3))

urls_df = docs.select(
    "doc_id",
    F.concat(F.col("text"), F.lit(" http://blocked.example.com/x")).alias("text"),
)
assert domain_blocklist_filter(urls_df, ["blocked.example.com"]).count() == 0
print("url blocklist: all planted docs dropped")

pct = exact_percentiles_distributed(df, "turn_idx", ps=(0.5, 0.95)).first()
exact = df.agg(F.expr("percentile(turn_idx, array(0.5, 0.95))")).first()[0]
assert abs(pct["p50"] - exact[0]) < 1e-9 and abs(pct["p95"] - exact[1]) < 1e-9
print("distributed exact percentiles == percentile():", pct["p50"], pct["p95"])

n_files_before = store.file_count() if "store" in dir() else None
from ndap_data_validator_spark.plans.checkpoint import CheckpointStore as _CS
cstore = _CS(spark, f"{dbase}/c")
fb = cstore.file_count()
kept = cstore.compact()
assert cstore.file_count() == 1 and kept > 0
print("checkpoint compaction:", fb, "files ->", cstore.file_count())

# cross-run metrics anomalies over a planted checkpoint history: 4 stable
# runs then a row-count jump in partition p1 must flag, p2 must not
from ndap_data_validator_spark.plans.anomaly import metrics_anomalies

astore = _CS(spark, f"{dbase}/anom")
for _run, _p1 in [("r1", 98), ("r2", 100), ("r3", 102), ("r4", 100)]:
    astore.mark_done_bulk(_run, "d", {"p1": {"rows": _p1},
                                      "p2": {"rows": 50}})
astore.mark_done_bulk("cur", "d", {"p1": {"rows": 200}, "p2": {"rows": 50}})
anom = {r["partition_id"]: r
        for r in metrics_anomalies(astore, "cur", ["$.rows"]).collect()}
assert anom["p1"]["anomalous"] and abs(anom["p1"]["z"]) > 3
assert not anom["p2"]["anomalous"]
print(f"metrics anomalies: p1 z={anom['p1']['z']} flagged, p2 stable")

from ndap_data_validator_spark.operators.curate import curate_corpus

curated, funnel = curate_corpus(docs, bench_set, min_quality=0.2,
                                decontaminate_n=5)
fr = {r["stage"]: r["survivors"] for r in funnel.collect()}
assert fr["ingested"] >= fr["quality_gate"] >= fr["language_gate"] \
       >= fr["dedup_gate"] >= fr["decontamination_gate"]
assert fr["ingested"] - fr["decontamination_gate"] >= n_bench  # bench docs culled
print("curation funnel:", fr)

from ndap_data_validator_spark.functions.lm import doc_cross_entropy, unigram_lm
from ndap_data_validator_spark.operators.curate import corpus_mixture_report

lm, consts = unigram_lm(docs)
scored = doc_cross_entropy(docs.limit(500), lm, consts)
ces = scored.where(F.col("cross_entropy").isNotNull())
lo, hi = ces.agg(F.min("cross_entropy"), F.max("cross_entropy")).first()
assert lo is not None and 0.0 < lo <= hi, (lo, hi)
gibberish = spark.createDataFrame(
    [("g1", "zzqx wvvk pplm qrrt")], "doc_id string, text string"
)
g_ce = doc_cross_entropy(gibberish, lm, consts).first()["cross_entropy"]
med = ces.agg(F.expr("percentile(cross_entropy, 0.5)")).first()[0]
assert g_ce > med, (g_ce, med)  # all-unknown text scores worse than median
print("unigram-LM cross-entropy: median", round(med, 3), "gibberish", round(g_ce, 3))

from ndap_data_validator_spark.functions.lm import perplexity_buckets

pb = perplexity_buckets(scored).groupBy("ppl_bucket").agg(
    F.count(F.lit(1)).alias("n")
)
bn = {r["ppl_bucket"]: r["n"] for r in pb.collect()}
n_scored = sum(v for k, v in bn.items() if k is not None)
# CCNet thirds: each labeled bucket holds ~1/3 of scored docs
for lbl in ("head", "middle", "tail"):
    assert abs(bn.get(lbl, 0) / n_scored - 1 / 3) < 0.05, bn
print("perplexity buckets:", {k: bn[k] for k in sorted(bn, key=str)})

mix = corpus_mixture_report(docs, alpha=0.3)
mrows = mix.collect()
assert abs(sum(r["token_share"] for r in mrows) - 1.0) < 0.01
assert abs(sum(r["mixture_weight"] for r in mrows) - 1.0) < 0.01
assert sum(r["n_docs"] for r in mrows) == docs.count()
if len(mrows) > 1:
    # temperature flattens toward uniform: the minority share is upsampled
    lo = min(mrows, key=lambda r: r["token_share"])
    assert lo["mixture_weight"] >= lo["token_share"], lo
print("corpus mixture:", [(r["lang"], r["n_docs"]) for r in mrows])

from ndap_data_validator_spark.operators.similarity import semantic_dedup

# deterministic subset (limit() re-evaluates differently per branch of the
# multi-reference dedup plan)
vecs = docs.where(
    F.col("doc_id").isNotNull()  # xxhash64(NULL) hashes the seed, not NULL
    & (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
).dropDuplicates(["doc_id"]).select(
    F.col("doc_id").alias("vec_id"),
    F.array(
        F.xxhash64("text").cast("double") % 1000,
        F.xxhash64("text", F.lit(1)).cast("double") % 1000,
        F.xxhash64("text", F.lit(2)).cast("double") % 1000,
    ).alias("embedding"),
)
n_vecs = vecs.count()
sclone = vecs.orderBy("vec_id").limit(1).select(
    F.concat(F.lit("zz-"), F.col("vec_id")).alias("vec_id"), "embedding"
)
sd = semantic_dedup(vecs.unionByName(sclone), threshold=0.999, n_centroids=4)
n_all = sd.count()
n_keep = sd.where("is_keeper").count()
assert n_all == n_vecs + 1 and n_keep < n_all, (n_all, n_vecs, n_keep)
print("semantic dedup:", n_all, "vectors ->", n_keep, "keepers")

from ndap_data_validator_spark.operators.pack import chunk_documents, pack_manifest

chunks = chunk_documents(docs.where(F.col("doc_id").isNotNull()), max_tokens=16)
man = pack_manifest(chunks.drop("chunk_text"), budget=64, n_shards=8)
tot_in = chunks.agg(F.sum("n_tokens")).first()[0]
tot_out = man.agg(F.sum("n_tokens")).first()[0]
assert tot_in == tot_out and tot_in > 0, (tot_in, tot_out)
bad = man.where((F.col("offset") < 0) | (F.col("offset") >= 64)).count()
assert bad == 0
print("chunk+pack:", chunks.count(), "chunks,", tot_in, "tokens,",
      man.select("shard", "bin_id").distinct().count(), "bins")

import tempfile as _tf

from ndap_data_validator_spark.streaming.stateful import dedup_stream

with _tf.TemporaryDirectory() as _sd:
    src = f"{_sd}/src"
    dup_rows = df.where(F.col("conv_id").isNotNull() & F.col("ts").isNotNull()) \
        .select("conv_id", "turn_idx", "ts").limit(500)
    dup_rows.coalesce(1).write.mode("append").parquet(src)
    dup_rows.coalesce(1).write.mode("append").parquet(src)  # every key twice
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_stream(stream).writeStream.format("memory").queryName("vdedup")
        .outputMode("append").option("checkpointLocation", f"{_sd}/ck")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    n_in = dup_rows.count()
    n_out = spark.sql("SELECT COUNT(*) FROM vdedup").first()[0]
    n_keys = spark.sql(
        "SELECT COUNT(*) FROM (SELECT DISTINCT conv_id, turn_idx FROM vdedup)"
    ).first()[0]
    assert n_out == n_keys <= n_in, (n_in, n_out, n_keys)
    print("stream dedup:", 2 * n_in, "arrivals ->", n_out, "unique emissions")

# --- round-4 additions: real BPE, no-split packing, quality classifier ---

from ndap_data_validator_spark.functions.bpe import bpe_token_count, bpe_tokens
from ndap_data_validator_spark.operators.pack import pack_nosplit

bpe_docs = docs.where(F.col("doc_id").isNotNull())
counts = bpe_docs.select(
    "doc_id",
    bpe_token_count(F.col("text")).alias("n_bpe"),
    F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws"),
)
agg = counts.agg(F.sum("n_bpe").alias("b"), F.sum("n_ws").alias("w")).first()
assert agg["b"] > agg["w"] > 0, agg  # BPE budget is finer than ws proxy
recon = bpe_docs.select(
    (F.array_join(bpe_tokens(F.col("text")), "")
     == F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias("ok")
).agg(F.sum(F.col("ok").cast("int")).alias("n"), F.count("*").alias("t")).first()
assert recon["n"] == recon["t"], recon  # lossless reconstruction
print("bpe: ", agg["b"], "bpe tokens vs", agg["w"], "ws tokens, reconstruction ok")

# --- round-5 addition: integer token ids (vocab → encode_ids → decode) ---

from ndap_data_validator_spark.functions.bpe import (
    bpe_decode,
    bpe_encode_ids,
    bpe_vocab,
)

vocab_df, n_base = bpe_vocab(bpe_docs, "text")
n_vocab = vocab_df.count()
assert n_vocab > n_base > 0, (n_vocab, n_base)
ids = bpe_encode_ids(bpe_docs, "doc_id", "text", vocab_df)
idchk = ids.agg(
    F.sum("n_oov").alias("oov"),
    F.sum(
        F.when(
            F.col("token_ids").isNull()
            | (F.size("token_ids") + F.col("n_oov") == F.col("n_tokens")),
            0,
        ).otherwise(1)
    ).alias("bad"),
).first()
assert idchk["oov"] == 0 and idchk["bad"] == 0, idchk  # in-vocab, length-true
rt = (
    bpe_decode(ids, "doc_id", "token_ids", vocab_df)
    .withColumnRenamed("text", "decoded")
    .join(bpe_docs.select("doc_id", "text"), "doc_id")
    .agg(
        F.sum(
            (F.col("decoded")
             == F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
            .cast("int")
        ).alias("n"),
        F.count("*").alias("t"),
    )
    .first()
)
assert rt["n"] == rt["t"], rt  # decode(encode(x)) == pretokenized x
print("bpe ids:", n_vocab, "vocab tokens (", n_base, "base ), id round-trip ok")

sized = counts.where(F.col("n_bpe") > 0).select("doc_id", F.col("n_bpe").alias("n_tokens"))
ns = pack_nosplit(sized, budget=256, n_shards=8)
n_docs_in = sized.count()
n_docs_out = ns.count()
tot_ns = ns.agg(F.sum("n_tokens")).first()[0]
tot_sized = sized.agg(F.sum("n_tokens")).first()[0]
assert n_docs_in == n_docs_out and tot_ns == tot_sized
over = (
    ns.groupBy("shard", "bin_id")
    .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("c"))
    .where((F.col("s") > 256) & (F.col("c") > 1)).count()
)
assert over == 0  # a bin over budget may only hold one oversized doc
print("pack_nosplit:", n_docs_out, "docs ->", ns.select("shard", "bin_id").distinct().count(), "bins, no doc split")

from ndap_data_validator_spark.functions.quality_clf import (
    score_quality,
    train_quality_classifier,
)

mangle = F.regexp_replace(F.col("text"), "[aeiou]", "q")
pos = bpe_docs.select("doc_id", "text", F.lit(True).alias("label"))
neg = bpe_docs.select(
    F.concat(F.lit("neg-"), F.col("doc_id")).alias("doc_id"),
    mangle.alias("text"),
    F.lit(False).alias("label"),
)
wts, consts = train_quality_classifier(pos.unionByName(neg), "label", n_buckets=512, seed=7)
scored = score_quality(
    pos.select("doc_id", "text").unionByName(neg.select("doc_id", "text")),
    wts, consts, n_buckets=512, seed=7, round_digits=6,
)
acc = scored.select(
    (F.col("predicted") == ~F.col("doc_id").startswith("neg-"))
    .cast("int").alias("ok")
).agg(F.avg("ok")).first()[0]
assert acc > 0.95, acc  # planted classes are trivially separable
print(f"quality classifier: holdout-free accuracy {acc:.3f} on planted classes")

from ndap_data_validator_spark.operators.decontaminate import decontaminate_fuzzy

fz_bench = docs.limit(0).unionByName(
    docs.where(F.col("doc_id").endswith("50")).select(
        "doc_id", F.concat(F.col("text"), F.lit(" eval suffix")).alias("text")
    )
)
fz = decontaminate_fuzzy(docs, fz_bench, threshold=0.5, shingle_n=2)
n_flagged = fz.where(F.col("contaminated")).count()
n_bench2 = fz_bench.count()
assert n_flagged >= n_bench2 > 0, (n_flagged, n_bench2)
print("fuzzy decontamination:", n_flagged, "flagged of", fz.count(), "docs,", n_bench2, "bench items")

from ndap_data_validator_spark.operators.repeated import repeated_ngram_report

# plant a shared boilerplate tail on docs whose id ends in '7' — those
# docs must show a repeated run covering the slogan's n-grams
slogan = " standard boilerplate footer all rights reserved"
rdocs = docs.select(
    "doc_id",
    F.when(
        F.col("doc_id").endswith("7"), F.concat(F.col("text"), F.lit(slogan))
    ).otherwise(F.col("text")).alias("text"),
)
rng = repeated_ngram_report(rdocs, n=4, min_docs=2)
planted = rng.join(
    rdocs.where(F.col("doc_id").endswith("7")).select("doc_id"), "doc_id"
)
n_planted = planted.count()
n_with_run = planted.where(F.col("max_repeated_run") >= 3).count()
assert n_planted > 0 and n_with_run == n_planted, (n_planted, n_with_run)
frac = rng.agg(F.round(F.avg("repeated_frac"), 4)).first()[0]
print("repeated ngrams:", n_planted, "planted docs all show runs >= 3; avg repeated_frac", frac)

from ndap_data_validator_spark.operators.decontaminate import (
    benchmark_ngram_hashes as _bnh,
    bloom_bitset,
    decontaminate_bloom,
)

# Bloom decontamination must agree with the exact hash-set check on this
# corpus (FP rate ~ 0 at this load) while its index stays fixed-size
bl_bench = docs.where(F.col("doc_id").endswith("50"))
bl_bh = _bnh(bl_bench, n=8, seed=3)
bl_bs = bloom_bitset(bl_bh, m_bits=1 << 20, k=3)
bl = decontaminate_bloom(docs, bl_bs, n=8, m_bits=1 << 20, k=3, seed=3)
bl_flag = bl.where(F.col("contaminated")).count()
n_bl_bench = bl_bench.count()
assert bl_flag >= n_bl_bench > 0, (bl_flag, n_bl_bench)
n_words = bl_bs.count()
assert n_words <= (1 << 20) // 32
print("bloom decontamination:", bl_flag, "flagged,", n_words, "bitset words")

# the inline (array-literal) gate is the STREAMING shape — batch result
# must be bit-identical to the join path on the same bitset
from ndap_data_validator_spark.operators.decontaminate import (
    bloom_words,
    decontaminate_bloom_stream,
)

bl_words = bloom_words(bl_bs, m_bits=1 << 20)
bl_inline = decontaminate_bloom_stream(
    docs, bl_words, n=8, m_bits=1 << 20, k=3, seed=3
)
mism = (
    bl_inline.withColumnRenamed("contaminated", "c2")
    .select("doc_id", "c2", "n_hits")
    .join(bl.select("doc_id", "contaminated", F.col("n_hits").alias("h1")),
          "doc_id")
    .where((F.col("c2") != F.col("contaminated"))
           | (F.col("n_hits") != F.col("h1")))
    .count()
)
assert mism == 0, mism
print("bloom inline gate: agrees with join path on", bl.count(), "docs")

from ndap_data_validator_spark.operators.dedup import (
    dedup_incremental_batch,
    minhash_index,
)

# incremental (delta-crawl) dedup: batch 2 contains clones of batch 1 —
# they must match the persisted index and stay OUT of the appended rows
inc_b1 = docs.where(F.col("doc_id").endswith("1"))
inc_b2 = docs.where(F.col("doc_id").endswith("2")).unionByName(
    inc_b1.limit(20).select(
        F.concat(F.lit("re-"), F.col("doc_id")).alias("doc_id"), "text"
    )
)
inc_idx = minhash_index(inc_b1, num_hashes=16, bands=8)
inc_rep, inc_new = dedup_incremental_batch(
    inc_b2, inc_idx, num_hashes=16, bands=8, threshold=0.9
)
n_clone = inc_rep.where(
    F.col("doc_id").startswith("re-") & ~F.col("is_unique")
).count()
n_clones_total = inc_b2.where(F.col("doc_id").startswith("re-")).count()
assert n_clone == n_clones_total > 0, (n_clone, n_clones_total)
appended = {r[0] for r in inc_new.select("doc_id").distinct().collect()}
assert not any(d.startswith("re-") for d in appended)
print(f"incremental dedup: {n_clone}/{n_clones_total} cross-batch clones "
      f"matched history; {len(appended)} unique docs appended to index")

from ndap_data_validator_spark.operators.repeated import line_dedup

# line-level dedup: every doc gets the same appended banner line — it is
# boilerplate by construction and must vanish from every cleaned doc
ld_in = docs.dropDuplicates(["doc_id"]).limit(120).select(
    "doc_id",
    F.concat(F.col("text"), F.lit("\nStandard Cookie Banner Accept")).alias(
        "text"
    ),
)
ld_clean, ld_rep = line_dedup(ld_in, min_docs=2)
assert ld_rep.count() == 120
assert ld_rep.where(F.col("n_repeated") < 1).count() == 0
assert ld_clean.where(F.col("text").contains("Cookie Banner")).count() == 0
n_removed = ld_rep.agg(F.sum("n_repeated")).first()[0]
print(f"line dedup: banner removed from all 120 docs; "
      f"{n_removed} repeated lines total")

from ndap_data_validator_spark.operators.repeated import substring_dedup

# substring-level CUT (Lee et al.): the same appended slogan must survive
# in EXACTLY ONE doc (the min-id canonical owner) and be cut everywhere
# else, with every cleaned doc reassembling losslessly around the cut
# deterministic doc set (limit() picks different rows per ACTION, and the
# canonical-owner assertion below compares across actions)
sd_in = docs.dropDuplicates(["doc_id"]).where(
    F.col("doc_id") < "conv-000120"
).select(
    "doc_id",
    F.concat(
        F.col("text"),
        F.lit(" all rights reserved standard footer boilerplate text"),
    ).alias("text"),
)
sd_n = sd_in.count()
sd_clean, sd_rep = substring_dedup(sd_in, n=5, min_docs=2)
assert sd_rep.count() == sd_n > 1
n_keep = sd_clean.where(F.col("text").contains("rights reserved")).count()
assert n_keep == 1, n_keep
canon = sd_in.agg(F.min("doc_id")).first()[0]
keeper = sd_clean.where(F.col("text").contains("rights reserved")).first()
assert keeper["doc_id"] == canon, (keeper["doc_id"], canon)
assert sd_rep.where(
    (F.col("doc_id") != canon) & (F.col("n_removed") < 1)
).count() == 0
print(f"substring dedup: slogan kept only in canonical {canon}; "
      f"{sd_rep.agg(F.sum('n_removed')).first()[0]} tokens cut corpus-wide")

from ndap_data_validator_spark.operators.dsir import dsir_select

# DSIR: target = the clean (pos) class; raw = clean + vowel-mangled clones.
# Importance weights must separate the classes and the Gumbel-top-k keep
# fraction must land near the requested 0.5.
dsir_raw = pos.select("doc_id", "text").unionByName(neg.select("doc_id", "text"))
ds = dsir_select(dsir_raw, pos.select("text"), keep_fraction=0.5, n_buckets=512)
mw = ds.groupBy(F.col("doc_id").startswith("neg-").alias("is_neg")).agg(
    F.avg("log_w").alias("m")
)
means = {r["is_neg"]: r["m"] for r in mw.collect()}
assert means[False] > means[True], means
n_all, n_kept = ds.count(), ds.where(F.col("keep")).count()
assert abs(n_kept / n_all - 0.5) < 0.05, (n_kept, n_all)
kept_neg = ds.where(F.col("keep") & F.col("doc_id").startswith("neg-")).count()
assert kept_neg < n_kept * 0.1, (kept_neg, n_kept)  # kept set is ~all target-like
print(f"dsir: kept {n_kept}/{n_all}, {kept_neg} mangled survivors; "
      f"mean log_w pos {means[False]:.2f} vs neg {means[True]:.2f}")

from ndap_data_validator_spark.operators.order import training_order

# training-order manifest: wiki x2.5 / web x1.0 epoch plan over the docs
# frame — exact copy counts for the integer part, ~half the wiki docs get
# the fractional third copy, and the range-ordered stream interleaves both
# sources in its first slice.
ord_docs = pos.select(
    "doc_id",
    F.when(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0, "wiki")
    .otherwise("web")
    .alias("source"),
)
n_wiki = ord_docs.where(F.col("source") == "wiki").count()
manifest = training_order(
    ord_docs, {"wiki": 2.5, "web": 1.0}, order_partitions=4
)
per = {
    r["source"]: (r["n"], r["docs"])
    for r in manifest.groupBy("source")
    .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("doc_id").alias("docs"))
    .collect()
}
assert per["wiki"][1] == n_wiki and 2 * n_wiki <= per["wiki"][0] <= 3 * n_wiki
head = manifest.orderBy("order_key").limit(50).select("source").distinct().count()
assert head == 2, "ordered stream must interleave both sources"
print(f"training order: wiki {per['wiki'][0]} copies of {n_wiki} docs "
      f"(x2.5 plan), web {per['web'][0]}; interleaved head ok")

from ndap_data_validator_spark.operators.convchecks import (
    sequence_checks,
    sequence_report,
)

# sequence checks on the generated transcripts: the generator injects
# duplicate (conv, turn) pairs, which break turn contiguity — order gaps
# MUST be found; the report rollup must agree with the row-level count
seq = sequence_checks(
    df, key_col="conv_id", order_col="turn_idx",
    ts_col="ts", role_col="role", expected_step=1,
)
seq_counts = {r["check"]: r["n"] for r in
              seq.groupBy("check").agg(F.count(F.lit(1)).alias("n")).collect()}
assert seq_counts.get("order_gap", 0) > 0, seq_counts
rep_counts = {r["check"]: r["n_violations"] for r in sequence_report(
    df, key_col="conv_id", order_col="turn_idx",
    ts_col="ts", role_col="role", expected_step=1,
).collect()}
assert rep_counts == seq_counts, (rep_counts, seq_counts)
print(f"sequence checks: {seq_counts}")

# role-transition FSM: the generator cycles user→assistant→tool, so that
# 3-cycle is the whitelist; injected bad roles ('sys?', ''), duplicate
# turns (self-transitions), and contiguity holes (e.g. user→tool) all
# land outside it — bad_transition MUST fire, and MUST exceed the
# role_repeat count (repeats are a strict subset of FSM breaks here)
fsm = frozenset([("user", "assistant"), ("assistant", "tool"), ("tool", "user")])
fsm_counts = {r["check"]: r["n"] for r in sequence_checks(
    df, key_col="conv_id", order_col="turn_idx", role_col="role",
    allowed_transitions=fsm,
).groupBy("check").agg(F.count(F.lit(1)).alias("n")).collect()}
assert fsm_counts.get("bad_transition", 0) > 0, fsm_counts
assert fsm_counts["bad_transition"] >= fsm_counts.get("role_repeat", 0)
print(f"role-transition FSM: {fsm_counts}")

# data-driven rule bootstrap: ONE aggregate pass profiles the transcript
# table and drafts constraints; the generated roles are low-cardinality so
# the role column must pick up a domain rule, turn_idx the observed range
from ndap_data_validator_spark.rules.inference import profile_and_suggest

sugg, prof = profile_and_suggest(df.select("conv_id", "turn_idx", "role", "ts"))
s_by = {a.column: a for a in sugg}
assert s_by["role"].allowed_values is not None and len(s_by["role"].allowed_values) <= 20
assert s_by["turn_idx"].min_value is not None and s_by["turn_idx"].max_value >= 100
assert s_by["ts"].role == "Time"
p_by = {x["column"]: x for x in prof}
assert 0 < p_by["conv_id"]["null_frac"] < 0.05  # injected null conv ids
print(f"rule bootstrap: role domain {list(s_by['role'].allowed_values)}, "
      f"turn_idx range [{s_by['turn_idx'].min_value}, {s_by['turn_idx'].max_value}], "
      f"conv_id null_frac {p_by['conv_id']['null_frac']:.4f}")

# violation-row cap: the report-sink guard for runs where one broken rule
# floods the sink — first K per (partition, column, reason) by the stable
# key; aggregate counts must be unaffected
cap_eng = ValidationEngine()
cap_assigns = [
    ColumnAssignment("conv_id", "Location"),
    ColumnAssignment("role", "Others", regex=r"^(user|assistant|tool)$"),
    ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
]
cap_res = cap_eng.validate(
    df, cap_assigns, partition_by=F.substring("conv_id", 6, 1),
    order_by=["conv_id", "turn_idx"], max_violations_per_rule=5,
)
cap_sizes = cap_res.violations.groupBy("partition_id", "column", "reason").agg(
    F.count(F.lit(1)).alias("n")
)
assert cap_sizes.where(F.col("n") > 5).count() == 0
full_res = cap_eng.validate(
    df, cap_assigns, partition_by=F.substring("conv_id", 6, 1),
    order_by=["conv_id", "turn_idx"],
)
n_cap, n_full = cap_res.violations.count(), full_res.violations.count()
assert n_cap < n_full, (n_cap, n_full)
assert cap_res.per_column_report.exceptAll(full_res.per_column_report).count() == 0
print(f"violation cap: {n_full} rows -> {n_cap} (first 5 per partition+rule), counts exact")

from ndap_data_validator_spark.operators.drift import categorical_drift

# categorical drift: role distribution between the two halves of the
# transcripts (even vs odd conv hash) must be ~identical → tiny PSI; the
# role column against a turn-skewed split must show drift
half = F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0
flat = categorical_drift(df, "role", half).first()
skew = categorical_drift(df, "role", F.col("turn_idx") % 3 == 0).first()
assert abs(flat["psi_cat"]) < 0.01, flat
assert skew["psi_cat"] > flat["psi_cat"], (skew, flat)
print(f"categorical drift: flat psi {flat['psi_cat']:.5f} "
      f"skewed psi {skew['psi_cat']:.5f} over {flat['n_categories']} roles")

from ndap_data_validator_spark.operators.render import (
    render_conversations,
    render_turn_spans,
)

# chat-template rendering on the generated transcripts: every turn's
# [text_start, text_end) span must slice its raw text back out of the
# rendered conversation, and only assistant turns are loss targets
conv_slice = df.where(F.substring("conv_id", 1, 9) == "conv-0000").select(
    "conv_id", "turn_idx", "role", F.coalesce("text", F.lit("")).alias("text")
).dropDuplicates(["conv_id", "turn_idx"])
rendered = {r["conv_id"]: r["rendered"]
            for r in render_conversations(conv_slice).collect()}
raw = {(r["conv_id"], r["turn_idx"]): r["text"] for r in conv_slice.collect()}
spans = render_turn_spans(conv_slice).collect()
assert spans and len(spans) == len(raw)
bad = [r for r in spans
       if rendered[r["conv_id"]][r["text_start"]:r["text_end"]]
       != raw[(r["conv_id"], r["turn_idx"])]]
assert not bad, bad[:3]
n_target = sum(1 for r in spans if r["is_target"])
assert 0 < n_target < len(spans)
assert all((r["role"] == "assistant") == r["is_target"] for r in spans)
print(f"render: {len(rendered)} convs, {len(spans)} turns, "
      f"{n_target} target spans all slice back to their raw text")

from ndap_data_validator_spark.operators.checks import (
    check_summary,
    check_violations,
)
from ndap_data_validator_spark.rules.model import CheckRule

# row-level CHECK constraints on the generated transcripts: summary counts
# must agree with the violation rows; turn_nonneg must CATCH the
# generator's injected negative turn_idx rows, and a satisfied
# relationship must pass
chk_rules = [
    CheckRule("turn_nonneg", "turn_idx >= 0"),
    CheckRule("turn_bounded", "turn_idx IS NULL OR abs(turn_idx) < 100000"),
]
chk_sum = {r["check"]: r for r in check_summary(df, chk_rules).collect()}
chk_vio = {
    r["check"]: r["count"]
    for r in check_violations(df, chk_rules, key_cols=("conv_id", "turn_idx"))
    .groupBy("check")
    .count()
    .collect()
}
for _name, _row in chk_sum.items():
    assert _row["n_violations"] == chk_vio.get(_name, 0), (_name, _row)
    assert _row["n_violations"] + _row["n_passed"] == df.count()
assert not chk_sum["turn_nonneg"]["passed"]  # injected negative turns
assert chk_sum["turn_nonneg"]["n_violations"] > 0
assert chk_sum["turn_bounded"]["passed"]
print(f"check rules: {chk_sum['turn_nonneg']['n_violations']} injected "
      f"negative turns caught, turn_bounded passed")

from ndap_data_validator_spark.operators.jsonschema import (
    json_schema_report,
    json_schema_summary,
)

# JSON payload conformance: synthesize tool-call arguments from the
# transcript's tool column with planted defects — malformed every 9th
# turn, missing required field every 9th+1, wrong-typed every 9th+2
_jm = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(9))
jdf = df.where(F.col("tool").isNotNull()).select(
    "conv_id",
    "turn_idx",
    F.when(_jm == 0, F.lit('{"name": oops'))
    .when(_jm == 1, F.lit('{"retries": 2}'))
    .when(_jm == 2, F.concat(F.lit('{"name":"'), F.col("tool"),
                             F.lit('","retries":"x"}')))
    .otherwise(F.concat(F.lit('{"name":"'), F.col("tool"),
                        F.lit('","retries":1}')))
    .alias("payload"),
)
jsum = json_schema_summary(
    jdf, "payload", "name string, retries int", required=("name", "retries")
).first()
assert jsum["n_malformed"] > 0 and jsum["n_missing_required"] > 0
assert jsum["n_type_errors"] > 0 and jsum["n_ok"] > 0
assert (jsum["n_ok"] + jsum["n_malformed"] + jsum["n_missing_required"]
        + jsum["n_type_errors"] >= jsum["n_rows"])  # malformed⇒missing too
jrep = json_schema_report(
    jdf, "payload", "name string, retries int",
    required=("name", "retries"), id_cols=("conv_id", "turn_idx"),
)
assert jrep.where(F.col("json_ok")).count() == jsum["n_ok"]
print(f"json payloads: {jsum['n_rows']} checked — {jsum['n_malformed']} "
      f"malformed, {jsum['n_missing_required']} missing-required, "
      f"{jsum['n_type_errors']} type errors, {jsum['n_ok']} ok")

from ndap_data_validator_spark.operators.skew import key_skew_report

# key-skew diagnostic on the generated transcripts: the generator's hot
# conversation (conv-000000, ~10k turns) must surface as the rank-1 heavy
# hitter with a skew factor well above uniform — exactly the case where a
# production run would reach for salt_repartition
skew_rows = key_skew_report(df, "conv_id", top_n=5).collect()
assert skew_rows[0]["key"] == "conv-000000", skew_rows[0]
assert skew_rows[0]["rank"] == 1
assert skew_rows[0]["skew_factor"] > 10, skew_rows[0]["skew_factor"]
assert abs(sum(r["share"] for r in skew_rows)) < 1.0
print(f"key skew: top={skew_rows[0]['key']} n={skew_rows[0]['n_rows']} "
      f"share={skew_rows[0]['share']} factor={skew_rows[0]['skew_factor']}")

from ndap_data_validator_spark.operators.expectations import (
    MetricRule,
    expectations_summary,
    metric_expectations,
)

# dataset-level expectations on the generated transcripts: row count and
# role compliance hold; a deliberately strict warn-severity bound on
# distinct_ratio (conv_id repeats per turn, so ratio << 1) must surface in
# warned_rules without failing the partition; and a failing error rule
# must flip the verdict
exp_rules = [
    MetricRule("rows", "row_count", min_bound=10_000, max_bound=10_000_000),
    MetricRule("roles", "compliance",
               expression="role IN ('user','assistant','tool','system')",
               min_bound=0.99),
    MetricRule("conv_ratio", "distinct_ratio", column="conv_id",
               min_bound=0.9, severity="warn"),
]
exp_rep = metric_expectations(df, exp_rules)
exp_sum = expectations_summary(exp_rep).collect()[0]
assert exp_sum["passed"] is True, exp_sum
assert exp_sum["warned_rules"] == ["conv_ratio"], exp_sum
strict = exp_rules + [MetricRule("impossible", "row_count", max_bound=1)]
strict_sum = expectations_summary(metric_expectations(df, strict)).collect()[0]
assert strict_sum["passed"] is False and "impossible" in strict_sum["failed_rules"]
vals = {r["rule"]: r["value"] for r in exp_rep.collect()}
print(f"metric expectations: rows={vals['rows']:.0f} "
      f"role_compliance={vals['roles']:.4f} conv_ratio={vals['conv_ratio']:.5f} "
      f"(warned, partition still passes); strict rule flips verdict")

# ...and through the checkpointed pipeline: per-partition row-count bounds
# (the hot conv-000000 partition dwarfs the rest, so a max_bound sized for
# ordinary partitions must flip exactly the hot one's verdict and withhold
# it from publish)
exp_base = tempfile.mkdtemp(prefix="verify_exp_")
part_expr = F.substring("conv_id", 1, 9)
part_sizes = sorted(
    r["count"] for r in df.groupBy(part_expr.alias("p")).count().collect()
)
assert len(part_sizes) > 1 and part_sizes[-1] > part_sizes[-2], part_sizes
# cap strictly between the two largest partitions: exactly the hot
# partition (conv-000000's ~10k-turn conversation lives there) fails
cap = (part_sizes[-2] + part_sizes[-1]) // 2
# assignments that satisfy every column rule (all mandatory roles present,
# rules on clean columns) so the publish gate is decided by the
# expectations alone
df_exp = df.withColumn("fy", F.lit("2021"))
assigns_exp = [
    ColumnAssignment("fy", "Time"),
    ColumnAssignment("turn_idx", "Measures", "integer", min_value=0),
]
exp_out = run_validation(
    spark, df_exp, assigns_exp, part_expr,
    checkpoint_path=os.path.join(exp_base, "ckpt"),
    report_path=os.path.join(exp_base, "report"),
    publish_path=os.path.join(exp_base, "pub"),
    metric_rules=[MetricRule("part_size", "row_count", min_bound=1,
                             max_bound=cap)],
)
exp_gate = spark.read.parquet(os.path.join(exp_base, "report/metric_expectations"))
n_over = exp_gate.where("NOT passed").count()
pub_parts = {r["partition_id"] for r in spark.read.parquet(
    os.path.join(exp_base, "pub")).select("partition_id").distinct().collect()}
over_parts = {r["partition_id"] for r in exp_gate.where("NOT passed")
              .select("partition_id").collect()}
assert n_over >= 1, "the hot partition must exceed the sized cap"
assert pub_parts.isdisjoint(over_parts), "failed expectations must not publish"
assert exp_out.passed_all is False
print(f"pipeline expectations: {n_over} partition(s) over cap={cap}, "
      f"withheld from publish ({len(pub_parts)} published)")

# constraint suggestion: a healthy baseline's suggested suite must pass on
# the baseline itself (exact distinct so the HLL-derived key rule can't
# flake) and trip on a corrupted batch
from ndap_data_validator_spark.rules.inference import (
    profile_columns,
    suggest_metric_rules,
)

base_cols = ["conv_id", "turn_idx", "role", "text"]
suite = suggest_metric_rules(profile_columns(df.select(*base_cols)))
self_rep = metric_expectations(
    df.select(*base_cols), suite, approx_distinct=False
)
self_failed = [r["rule"] for r in self_rep.collect() if not r["passed"]]
assert self_failed == [], self_failed
corrupt = df.select(*base_cols).limit(1000).withColumn(
    "turn_idx", F.col("turn_idx") + F.lit(1_000_000)
)
bad = {
    r["rule"]
    for r in metric_expectations(
        corrupt, suite, approx_distinct=False
    ).collect()
    if not r["passed"]
}
assert "rows__row_count" in bad and "turn_idx__max" in bad, bad
print(f"suggested suite: {len(suite)} rules, baseline clean; corrupted "
      f"batch trips {sorted(bad)}")

# drift as a checkpointed rule family: baseline the clean turn_idx
# distribution, then run a batch where ONE partition's turn_idx is shifted
# by many bin widths (range ~0..10000, 32 bins -> width ~312; shift 5000).
# Exactly that partition must drift, be withheld from publish, and the
# snapshot must survive a JSON round-trip with an identical digest.
from ndap_data_validator_spark.operators.drift import (
    DriftRule,
    snapshot,
    snapshot_from_json,
    snapshot_to_json,
)

drift_base = tempfile.mkdtemp(prefix="verify_drift_")
# the drift column must be IDENTICALLY distributed across partitions in
# the clean state (turn_idx is not: the hot conversation's 0..10k tail
# lives in one partition, so every OTHER partition would legitimately
# drift vs a global turn_idx baseline). A hash-derived uniform metric
# gives each ~10k-row partition the same distribution to binned-KS noise
# ~1.36/sqrt(n) ≈ 0.014 << the 0.1 threshold.
# drop the injected null-conv_id rows: they form a ~250-row '<null>'
# partition whose KS sampling noise (~1.36/sqrt(250) ≈ 0.086 + binning)
# straddles the 0.1 threshold — this drive asserts the clean/drifted
# split, not small-sample behavior
df_m = df_exp.where(F.col("conv_id").isNotNull()).withColumn(
    "metric",
    F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1000)).cast("double"),
)
snap = snapshot(df_m, ["metric"])
snap_json = snapshot_to_json(snap)
assert snapshot_to_json(snapshot_from_json(snap_json)) == snap_json
hot_part = F.substring("conv_id", 1, 9) == F.lit("conv-0000")
df_drift = df_m.withColumn(
    "metric",
    F.when(hot_part, F.col("metric") + F.lit(5000)).otherwise(
        F.col("metric")
    ),
)
# assignments every partition SATISFIES (the exp drive's turn_idx
# min_value=0 rule fails almost every partition on the injected negative
# turns, and the null-conv_id partition that used to pass was filtered
# above) — the publish gate must be decided by the drift rule alone
assigns_drift = [
    ColumnAssignment("fy", "Time"),
    ColumnAssignment("metric", "Measures", "float", min_value=0),
]
drift_out = run_validation(
    spark, df_drift, assigns_drift, part_expr,
    checkpoint_path=os.path.join(drift_base, "ckpt"),
    report_path=os.path.join(drift_base, "report"),
    publish_path=os.path.join(drift_base, "pub"),
    drift_rule=DriftRule(snapshot_from_json(snap_json)),
)
drift_gate = spark.read.parquet(os.path.join(drift_base, "report/drift_report"))
drifted_parts = {
    r["partition_id"] for r in drift_gate.where("drifted").collect()
}
assert drifted_parts == {"conv-0000"}, drifted_parts
pub_parts2 = {r["partition_id"] for r in spark.read.parquet(
    os.path.join(drift_base, "pub")).select("partition_id").distinct().collect()}
assert "conv-0000" not in pub_parts2 and len(pub_parts2) > 0
assert drift_out.passed_all is False
ks_hot = drift_gate.where("drifted").select("ks").first()["ks"]
print(f"pipeline drift rule: conv-0000 drifted (ks={ks_hot:.3f}), withheld "
      f"from publish ({len(pub_parts2)} published); snapshot JSON "
      f"round-trip stable")


# ---- r05 late: reconciliation, freshness, completeness --------------------
from ndap_data_validator_spark.operators.completeness import (
    partition_completeness,
)
from ndap_data_validator_spark.operators.expectations import (
    MetricRule,
    metric_expectations,
)
from ndap_data_validator_spark.operators.reconcile import reconcile_summary

# reconcile: transcripts vs a perturbed re-ingest of themselves — drop one
# conversation, damage one text cell; the diff must localize exactly
# NULL join keys never match (SQL), and the != filter below would drop
# the injected null-conv rows from one side only — exclude them upfront
base_r = (
    df.where(F.col("conv_id").isNotNull())
    .dropDuplicates(["conv_id", "turn_idx"])
    .select("conv_id", "turn_idx", "role", "text")
)
perturbed_r = base_r.where(F.col("conv_id") != "conv-000007").withColumn(
    "text",
    F.when(
        (F.col("conv_id") == "conv-000011") & (F.col("turn_idx") == 3),
        F.lit("CORRUPTED"),
    ).otherwise(F.col("text")),
)
rec = {
    (r["metric"], r["column"]): r["value"]
    for r in reconcile_summary(
        base_r, perturbed_r, ["conv_id", "turn_idx"]
    ).collect()
}
n_dropped = base_r.where(F.col("conv_id") == "conv-000007").count()
assert rec[("missing_right", None)] == n_dropped, rec
assert rec[("missing_left", None)] == 0
assert rec[("rows_differing", None)] == 1
assert rec[("column_mismatch", "text")] == 1
assert rec[("column_mismatch", "role")] == 0
assert rec[("rows_equal", None)] == rec[("rows_left", None)] - n_dropped - 1
print(
    f"reconcile: dropped conv ({n_dropped} rows) + 1 damaged cell "
    "localized exactly; per-row text equality holds everywhere else"
)

# freshness: lag vs an explicit now; stale bound must flip the verdict
fr = metric_expectations(
    df.where(F.col("ts").isNotNull()),
    [
        MetricRule("fresh_loose", "freshness", column="ts", max_bound=1e10),
        MetricRule("fresh_tight", "freshness", column="ts", max_bound=1.0),
    ],
    now="2030-01-01T00:00:00",
).collect()
fr_by = {r["rule"]: r for r in fr}
assert fr_by["fresh_loose"]["passed"] is True
assert fr_by["fresh_tight"]["passed"] is False
assert fr_by["fresh_loose"]["value"] == fr_by["fresh_tight"]["value"] > 0
print(f"freshness: lag {fr_by['fresh_loose']['value']:.0f}s vs pinned now; "
      "tight bound flips verdict")

# completeness: expected-partition census over the conv-id prefix key
obs_keys = [r["p"] for r in df.select(
    F.substring("conv_id", 1, 9).alias("p")).where(
    F.col("conv_id").isNotNull()).distinct().collect()]
expected = sorted(obs_keys) + ["conv-9999"]
comp = {
    r["key"]: r["status"]
    for r in partition_completeness(
        df.where(F.col("conv_id").isNotNull()).withColumn(
            "p", F.substring("conv_id", 1, 9)
        ),
        "p",
        expected,
        min_rows=10,
    ).collect()
}
assert comp["conv-9999"] == "missing"
assert all(v == "ok" for k, v in comp.items() if k != "conv-9999"), comp
print(f"completeness: {len(obs_keys)} expected partitions ok, planted "
      "conv-9999 reported missing")

# ...and through the checkpointed run: the ghost partition fails the RUN
# verdict (nothing to withhold — the rows never arrived) and the census
# report lands next to the other report sinks
comp_base = tempfile.mkdtemp(prefix="verify_comp_")
comp_out = run_validation(
    spark,
    df.where(F.col("conv_id").isNotNull()).withColumn("fy", F.lit("2024")),
    [
        ColumnAssignment("fy", "Time"),
        ColumnAssignment("turn_idx", "Measures", "integer"),
    ],
    part_expr,
    checkpoint_path=os.path.join(comp_base, "ckpt"),
    report_path=os.path.join(comp_base, "report"),
    expected_partitions=obs_keys + ["conv-9999"],
)
assert comp_out.passed_all is False
census_rows = spark.read.parquet(
    os.path.join(comp_base, "report/completeness")
).select(F.col("partition_id").cast("string"), "status").collect()
census = {r["partition_id"]: r["status"] for r in census_rows}
assert census["conv-9999"] == "missing"
assert sum(1 for v in census.values() if v == "ok") == len(obs_keys)
print("pipeline completeness: ghost partition fails the run verdict; "
      f"census report written ({len(census)} keys)")

# ---- r05 late: row-granular quarantine publish policy ----------------------
# transcripts carry planted NULL conv_ids, so under the default policy the
# affected partitions are withheld wholesale; under row_policy='quarantine'
# only the offending rows divert (with reasons) and the rest publish.
q_base = tempfile.mkdtemp(prefix="verify_quar_")
q_df = df.withColumn("fy", F.lit("2024")).withColumn(
    "pkey", F.coalesce(F.substring("conv_id", 1, 9), F.lit("conv-null"))
)
q_assigns = [
    ColumnAssignment("conv_id", "Location"),
    ColumnAssignment("fy", "Time"),
    ColumnAssignment("turn_idx", "Measures", "integer"),
]
q_out = run_validation(
    spark,
    q_df,
    q_assigns,
    "pkey",
    checkpoint_path=os.path.join(q_base, "ckpt"),
    publish_path=os.path.join(q_base, "pub"),
    row_policy="quarantine",
)
assert q_out.passed_all is False  # verdicts are policy-independent
q_pub = spark.read.parquet(os.path.join(q_base, "pub"))
q_quar = spark.read.parquet(os.path.join(q_base, "pub_quarantine"))
n_null = q_df.where(F.col("conv_id").isNull()).count()
assert q_quar.count() == n_null, (q_quar.count(), n_null)
assert q_pub.count() + q_quar.count() == q_df.count()
reasons = {
    tuple(r["row_reasons"])
    for r in q_quar.select("row_reasons").distinct().collect()
}
assert all("conv_id: No Nulls allowed" in rs for rs in reasons)
assert "row_reasons" not in q_pub.columns and "row_passed" not in q_pub.columns
print(f"quarantine policy: {q_quar.count()} null-conv rows diverted with "
      f"reasons, {q_pub.count()} clean rows published (conservation holds)")

# ---- r05 late: driver-side rule pre-flight ---------------------------------
from ndap_data_validator_spark.operators.expectations import MetricRule as _MR
from ndap_data_validator_spark.rules.model import CheckRule as _CR
from ndap_data_validator_spark.rules.preflight import preflight_rules

pf_clean = preflight_rules(
    spark,
    df,
    assignments=[ColumnAssignment("conv_id", "Location")],
    check_rules=[_CR("turn_nonneg", "turn_idx >= 0")],
    metric_rules=[_MR("rows", "row_count", min_bound=1)],
)
assert pf_clean == [], pf_clean
pf_bad = preflight_rules(
    spark,
    df,
    assignments=[ColumnAssignment("conv_idd", "Location")],  # typo
    check_rules=[_CR("typo", "turn_idxx >= 0")],
)
assert {(e.family, e.rule) for e in pf_bad} == {
    ("assignment", "conv_idd"),
    ("check", "typo"),
}, pf_bad
print("preflight: clean catalog resolves; typo'd assignment + check "
      "reported driver-side, no job launched")

print("JOB OK")
spark.stop()
