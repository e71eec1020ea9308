"""Decompose minhash_lsh_pairs at scale: where does the wall go?

Stages timed separately (each min-of-2 after warm):
  sigs      — minhash_signatures + localCheckpoint (the Python pass)
  cand      — banded self-join + distinct (given pinned sigs)
  attach    — sig re-attach joins + est filter + count (given pinned cand)
  full      — the real pipeline end-to-end (what bench times)
Also prints row counts so pair density is visible.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from xltsearch_spark.operators import dedup
from xltsearch_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/synth_sf1")
spark = get_spark("exp_minhash", cores=32, shuffle_partitions=32)
sc = spark.sparkContext

documents = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
n = documents.count()
print(f"docs={n}", flush=True)


def t(name, fn, n_runs=2):
    fn()
    walls = []
    for _ in range(n_runs):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    print(f"{name}: min={min(walls)} walls={walls}", flush=True)


sc.setJobDescription("sigs")
t("sigs(+ckpt)", lambda: dedup._materialize_once(
    dedup.minhash_signatures(documents, num_hashes=64, shingle_n=3)).count())

sigs_p = dedup._materialize_once(
    dedup.minhash_signatures(documents, num_hashes=64, shingle_n=3))
print("sig rows:", sigs_p.count(), flush=True)

sc.setJobDescription("cand")
t("cand(given sigs)", lambda: dedup.minhash_lsh_candidates(
    sigs_p, bands=16, rows_per_band=4).count())
cand_p = dedup.minhash_lsh_candidates(sigs_p, 16, 4).localCheckpoint(eager=True)
print("cand rows:", cand_p.count(), flush=True)


def attach():
    sa = sigs_p.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs_p.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    c = cand_p.join(sa, "a").join(sb, "b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v) / F.lit(64.0)
    return (c.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= 0.5).select("a", "b", "est_jaccard"))


sc.setJobDescription("attach")
t("attach(given cand)", lambda: attach().count())
print("pair rows:", attach().count(), flush=True)

sc.setJobDescription("full")


def full():
    s = dedup.minhash_signatures(documents, num_hashes=64, shingle_n=3)
    dedup.minhash_lsh_pairs(s, bands=16, rows_per_band=4, threshold=0.5).count()


t("full pipeline", full)
spark.stop()
