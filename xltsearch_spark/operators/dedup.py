"""Deduplication operators for large-scale training-data pipelines.

These extend the engine beyond the reference's operator set (the reference's
only dedup-adjacent op is the hashsum change-diff, ``SelectTask.java:63-90``)
with the standard web-scale text-dedup suite, each expressed Spark-first:

* exact dedup            — sha256 groupBy (one shuffle, map-side partial agg)
* minhash + LSH          — shingle -> minhash signature (vectorized numpy
                           pandas UDF) -> banded bucket join (self-join on
                           (band, bucket_hash): candidate pairs only, never
                           O(n^2))
* simhash                — 64-bit weighted-token fingerprint, near-dup =
                           hamming distance <= k via band rotation
* n-gram jaccard         — exact pairwise jaccard over shingle sets, inverted
                           join on shared shingles (candidate pruning)
* embedding cosine       — see operators/similarity.py

At 100 TB each of these is shuffle-bounded by design: signatures/fingerprints
are tiny fixed-width columns; joins key on banded hashes so candidate sets
stay near-linear for real corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

# deterministic 64-bit mixing constants (splitmix64, public domain algorithm)
_MERSENNE = (1 << 61) - 1


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: (hash, n_dups, doc_ids). Exact dedup =
    keep min(doc_id) per group."""
    return (df.withColumn("h", F.sha2(F.col(text_col).cast("binary"), 256))
            .groupBy("h").agg(F.count("*").alias("n_dups"),
                              F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_dups") > 1))


def _shingle_hashes(texts: pd.Series, n: int) -> list[np.ndarray]:
    """Per-row array of 63-bit hashes of word n-gram shingles (vectorized
    pandas split + numpy polynomial rolling hash over the token hash array)."""
    token_lists = texts.fillna("").str.lower().str.findall(r"\w+")
    out = []
    B = np.uint64(1099511628211)
    for toks in token_lists:
        if len(toks) < n:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        th = np.array([hash_str64(t) for t in toks], dtype=np.uint64)
        acc = th[: len(th) - n + 1].copy()
        for k in range(1, n):
            acc = acc * B + th[k: len(th) - n + 1 + k]
        out.append(np.unique(acc & np.uint64((1 << 61) - 1)))
    return out


def hash_str64(s: str) -> int:
    """FNV-1a 64-bit (stable across processes, unlike Python hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_signatures(df: DataFrame, text_col: str = "text", num_hashes: int = 64,
                       shingle_n: int = 3, seed: int = 42) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures — one mapInPandas pass,
    numpy (num_hashes x shingles) min-reduction per doc."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("sig", ArrayType(LongType()))])

    def compute(it):
        for pdf in it:
            shingles = _shingle_hashes(pdf[text_col], shingle_n)
            sigs = []
            for sh in shingles:
                if sh.size == 0:
                    sigs.append(np.full(num_hashes, _MERSENNE, dtype=np.int64).tolist())
                    continue
                # (H, S) permutation values mod mersenne prime, min over shingles
                vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "sig": sigs})

    return df.select("doc_id", text_col).mapInPandas(compute, schema=schema)


def minhash_lsh_pairs(sigs: DataFrame, bands: int = 16, rows_per_band: int = 4,
                      threshold: float = 0.7, sig_df: DataFrame | None = None) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified by signature-estimated
    jaccard >= threshold. Self-join keys on (band, hash(band slice)) so the
    shuffle carries only (key, doc_id, sig) rows and candidates are bucketed."""
    n = bands * rows_per_band
    banded = sigs.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.hash(F.concat_ws(",", F.lit(bnd), *[
                F.col("sig")[bnd * rows_per_band + r] for r in range(rows_per_band)]))
            for bnd in range(bands)])).alias("band", "bucket"))
    left = banded.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"),
                         "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"),
                          "band", "bucket")
    cand = (left.join(right, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
            .select("a", "b", "sig_a", "sig_b").distinct())
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v) / F.lit(float(n))
    return (cand.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("a", "b", "est_jaccard"))


def simhash_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — 64-bit simhash over tf-weighted tokens."""
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", LongType())])

    def compute(it):
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in it:
            token_lists = pdf[text_col].fillna("").str.lower().str.findall(r"\w+")
            out = []
            for toks in token_lists:
                if not toks:
                    out.append(0)
                    continue
                uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
                hs = np.array([hash_str64(t) for t in uniq], dtype=np.uint64)
                bits = ((hs[:, None] & bitcols[None, :]) != 0).astype(np.int64)
                v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                packed = int(((v > 0).astype(np.uint64)
                              << np.arange(64, dtype=np.uint64)).sum())
                # store the uint64 pattern as signed int64 (flip bit 63 for
                # every doc uniformly -> hamming distances preserved)
                out.append(packed - (1 << 63))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "simhash": out})

    return df.select("doc_id", text_col).mapInPandas(compute, schema=schema)


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via the standard
    band trick: any pair within distance d < bands shares at least one of
    `bands` disjoint 16-bit bands — join per band, verify exact distance."""
    width = 64 // bands
    mask = (1 << width) - 1
    banded = fps.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            (F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)))
            for i in range(bands)])).alias("band", "chunk"))
    l = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"),
                      "band", "chunk")
    r = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"),
                      "band", "chunk")
    cand = (l.join(r, ["band", "chunk"]).filter(F.col("a") < F.col("b"))
            .select("a", "b", "ha", "hb").distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram jaccard over candidate pairs that share >= 1 shingle.

    Inverted join: explode (doc, shingle) -> self-join on shingle ->
    per-pair intersection count via groupBy -> jaccard with |A|,|B| from a
    broadcast size table. Never materializes the n^2 pair space."""
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("shingle", LongType())])

    def shingles(it):
        for pdf in it:
            sh = _shingle_hashes(pdf[text_col], n)
            ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64),
                            [len(s) for s in sh])
            vals = np.concatenate([s.astype(np.int64) for s in sh]) if len(sh) else \
                np.zeros(0, np.int64)
            yield pd.DataFrame({"doc_id": ids, "shingle": vals})

    ex = df.select("doc_id", text_col).mapInPandas(shingles, schema=schema)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (ex.alias("x").join(ex.alias("y"), "shingle")
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(F.broadcast(sizes).withColumnRenamed("doc_id", "a")
                 .withColumnRenamed("sz", "sz_a"), "a")
           .join(F.broadcast(sizes).withColumnRenamed("doc_id", "b")
                 .withColumnRenamed("sz", "sz_b"), "b")
           .withColumn("jaccard", F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", "jaccard"))
    return out
