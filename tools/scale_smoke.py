"""Scale smoke: heavy operators at ~10x the bench fixture (sf1-ish).

Not part of the test suite (minutes, writes /tmp); run manually:

    PYTHONPATH=. python tools/scale_smoke.py 2>/dev/null

Measured on local[32] (round 2): window gauntlet 3.6M rows 1.6s,
sessionization 5.1s, quality battery 200k docs 2.1s, LM train+score
2.4s, temperature mix 1.0s, IVF-PQ 100q x 80k corpus 15.3s.
"""
import time
from pyspark.sql import functions as F
from tw_etl_spark.session import get_spark

spark = get_spark(app_name="scale-smoke")

t0 = time.time()
# events x10 of sf0.1: 3.6M rows
ev = (spark.range(0, 3_600_000)
      .select(
          F.col("id").alias("event_id"),
          (F.col("id") % 50_000).alias("user_id"),
          F.timestamp_micros((F.lit(1700000000_000_000) + F.col("id") * 1_000_000 + (F.xxhash64("id") % 900_000_000)).cast("long")).alias("ts"),
          F.element_at(F.array(F.lit("view"), F.lit("click"), F.lit("buy")), (F.col("id") % 3 + 1).cast("int")).alias("event_type"),
          (F.rand(7) * 100).alias("value"),
      ))
ev.write.mode("overwrite").parquet("/tmp/smoke_events")
print(f"gen events: {time.time()-t0:.1f}s")

e = spark.read.parquet("/tmp/smoke_events")

from pyspark.sql.window import Window
t0 = time.time()
w = Window.partitionBy("user_id").orderBy("ts", "event_id")
wr = Window.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-3_600_000_000, 0)
gauntlet = e.select(
    "user_id", "event_id",
    F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run"),
    F.lag("event_type").over(w).alias("prev"),
    F.count(F.lit(1)).over(wr).alias("n_hr"),
)
n = gauntlet.count()
print(f"window gauntlet 3.6M rows: {time.time()-t0:.1f}s ({n} rows)")

t0 = time.time()
sess = (e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("new_sess", (F.col("prev_ts").isNull() | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1_800_000_000)).cast("int"))
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n")))
print(f"sessionization: {sess.count()} sessions in {time.time()-t0:.1f}s")

# docs x40: 200k docs for quality battery + LM + temperature mix
t0 = time.time()
docs = (spark.range(0, 200_000)
        .select(F.col("id").alias("doc_id"),
                F.concat(F.lit("the quick brown fox doc "), F.col("id").cast("string"),
                         F.lit(" with some repeated filler tokens of and that to be have ")).alias("text"),
                F.element_at(F.array(*[F.lit(l) for l in ["en","en","en","de","fr"]]), (F.col("id") % 5 + 1).cast("int")).alias("lang")))
from tw_etl_spark.operators.quality import gopher_flags, c4_clean
q = c4_clean(gopher_flags(docs))
print(f"quality battery 200k docs: kept={q.filter('gopher_keep').count()} in {time.time()-t0:.1f}s")

t0 = time.time()
from tw_etl_spark.operators.text import unigram_lm, lm_score
model, oov = unigram_lm(docs)
print(f"LM train+score 200k docs: {lm_score(docs, model, oov).count()} in {time.time()-t0:.1f}s")

t0 = time.time()
from tw_etl_spark.operators.sampling import temperature_mix
kept, rates = temperature_mix(docs, "lang", id_col="doc_id", alpha=0.5)
print(f"temperature mix: {kept.count()} kept in {time.time()-t0:.1f}s, rates={ {k: round(v,3) for k,v in rates.items()} }")

# embeddings x40: 80k vectors through IVF-PQ
t0 = time.time()
import numpy as np
from pyspark.sql import types as T
emb = (spark.range(0, 80_000)
       .select(F.col("id").alias("vec_id"),
               F.transform(F.sequence(F.lit(1), F.lit(64)),
                           lambda i: F.sin(F.col("id") * i * 0.001)).alias("embedding")))
emb.write.mode("overwrite").parquet("/tmp/smoke_emb")
v = spark.read.parquet("/tmp/smoke_emb")
from tw_etl_spark.operators.similarity import ann_ivfpq_topk
qdf = v.filter(F.col("vec_id") < 100)
res = ann_ivfpq_topk(qdf, v, k=3, n_lists=64, nprobe=4)
print(f"IVF-PQ 100q x 80k corpus: {res.count()} results in {time.time()-t0:.1f}s")

# round 8: portable minhash/simhash + classifier on the 200k-doc corpus
t0 = time.time()
from tw_etl_spark.operators.dedup import minhash_signatures_portable, simhash_portable_expr
sig_n = minhash_signatures_portable(docs, num_hashes=16).count()
print(f"portable minhash signatures 200k docs: {sig_n} in {time.time()-t0:.1f}s")

t0 = time.time()
sh_n = docs.select("doc_id", simhash_portable_expr(F.col("text")).alias("sh")).count()
print(f"portable simhash 200k docs: {sh_n} in {time.time()-t0:.1f}s")

t0 = time.time()
from tw_etl_spark.operators.quality import hashed_linear_score_cols
n_tokens, z, score, keep = hashed_linear_score_cols(F.col("text"))
cls = docs.select("doc_id", z.alias("z"), keep.alias("keep"))
print(f"hashed-linear classifier 200k docs: kept={cls.filter('keep').count()} in {time.time()-t0:.1f}s")

# relational SemDeDup at 80k vectors, k=64 (k scales with n to bound
# within-cluster pair cost: E[pairs] ~ n^2/k). Measured r8: 180 s via
# the blocked-matmul pair kernel (the JVM fold-per-pair join it
# replaced ran >15 min before being killed); this synthetic corpus is
# the worst case — threshold 0.999 with ~every vector a near-dup of
# every other (66 survivors of 80k), so the candidate set is ~10^7 pairs.
t0 = time.time()
from tw_etl_spark.operators.dedup import semantic_dedup_relational
sd = semantic_dedup_relational(v, k=64, threshold=0.999)
print(f"relational SemDeDup 80k vecs k=64: survivors={sd.filter('survived').count()} in {time.time()-t0:.1f}s")

# round 9: portable IVF twin + Bloom decontamination at 10x
t0 = time.time()
from tw_etl_spark.operators.similarity import ann_ivf_portable_topk
rp = ann_ivf_portable_topk(qdf, v, n_lists=8, nprobe=2, k=3)
print(f"portable IVF twin 100q x 80k corpus: {rp.count()} results in {time.time()-t0:.1f}s")

t0 = time.time()
from tw_etl_spark.operators.dedup import bloom_decontaminate
bench_docs = docs.filter(F.col("doc_id") % 97 == 0)
corpus_docs = docs.filter(F.col("doc_id") % 97 != 0)
bd = bloom_decontaminate(corpus_docs, bench_docs, n=3)
print(f"bloom decontaminate 200k docs: dirty={bd.filter('contaminated').count()} in {time.time()-t0:.1f}s")

# round 9 (late): span-rewrite dedup + DSIR weights at 10x. This
# synthetic corpus is dd10's worst case — every doc shares its filler
# chunks, so nearly all chunk occurrences are duplicates and the
# reassembly path (collect/sort/join per doc) runs for all 200k docs.
t0 = time.time()
from tw_etl_spark.operators.dedup import span_dedup_rewrite
sr = span_dedup_rewrite(docs, chunk_tokens=10)
n_dropped = sr.agg(F.sum("n_dropped")).collect()[0][0]
print(f"span-rewrite dedup 200k docs: dropped={n_dropped} chunks in {time.time()-t0:.1f}s")

# round 10: the 100 TB shuffle-key variant — keep-rule window keyed on
# xxhash64(chunk) (8-byte key) instead of the raw ~10-token chunk text
t0 = time.time()
srh = span_dedup_rewrite(docs, chunk_tokens=10, key_by_hash=True)
n_dropped_h = srh.agg(F.sum("n_dropped")).collect()[0][0]
assert n_dropped_h == n_dropped, (n_dropped_h, n_dropped)
print(f"span-rewrite dedup (hash-key) 200k docs: dropped={n_dropped_h} chunks in {time.time()-t0:.1f}s")

t0 = time.time()
from tw_etl_spark.operators.sampling import dsir_importance_weights
dw = dsir_importance_weights(docs, target=F.col("lang") == "en", buckets=1024)
n_pos = dw.filter("dsir_w > 0").count()
print(f"DSIR weights 200k docs: {n_pos} positive-weight docs in {time.time()-t0:.1f}s")
