"""Similarity search over embedding columns (training-pipeline extension).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane signature) variant as the scale path: at 10^9+ vectors the
LSH pre-filter turns the all-pairs scan into per-bucket candidate scans.

Everything stays JVM-side where the built-ins allow (``F.zip_with`` /
``F.aggregate`` dot products); the batched numpy path is used for the
many-queries case where a (Q x D) matmul per Arrow batch beats per-row
expression evaluation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StructField, StructType)


def _norm_expr(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk_bruteforce(vectors: DataFrame, query_vec: list[float], k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           round_digits: int | None = None) -> DataFrame:
    """Exact top-k cosine for ONE query vector, fully built-in:
    zip_with/aggregate dot product -> TakeOrdered(k). No shuffle at all.

    ``round_digits``: round the cosine BEFORE the k-cut — callers that
    verify against a fixed-precision oracle (or feed rank-sensitive
    fusion) need the k-th slot decided on the rounded value, or a
    last-ulp difference can swap boundary members."""
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(np.dot(q, q))) or 1.0
    dot = F.aggregate(F.zip_with(F.col(vec_col), F.array(*[F.lit(x) for x in q]),
                                 lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    sim = dot / (_norm_expr(F.col(vec_col)) * F.lit(qn))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (vectors.select(F.col(id_col), sim.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))


def cosine_topk_batch(vectors: DataFrame, queries: np.ndarray, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k for a BATCH of query vectors: per-partition (Q x D) numpy
    matmul + local top-k heap, then global TakeOrdered per query. Shuffles
    only Q*k*partitions candidate rows."""
    qm = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    schema = StructType([StructField("query_id", IntegerType()),
                         StructField(id_col, LongType()),
                         StructField("cosine", DoubleType())])

    def score(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy())
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            sims = (qm @ mat.T) / (qn[:, None] * vn[None, :])
            kk = min(k, sims.shape[1])
            # local top-k per query (argpartition), global merge via TakeOrdered
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(np.arange(qm.shape[0], dtype=np.int32), kk),
                id_col: ids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    from pyspark.sql.window import Window
    local = vectors.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("query_id", id_col, "cosine", "rank"))


def cosine_near_pairs_exact(vectors: DataFrame, threshold: float,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            round_digits: int | None = 6) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b, cosine >= thr).

    Norms are projected per row BEFORE the self-join so the pair stage only
    computes the dot product. All-pairs is the exact baseline (fine to a few
    10^4 rows); at scale pre-bucket with `hyperplane_signatures` and run this
    per bucket (the LSH path in `cosine_topk_lsh`)."""
    normed = vectors.select(F.col(id_col), F.col(vec_col),
                            _norm_expr(F.col(vec_col)).alias("nrm"))
    a = normed.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                      F.col("nrm").alias("na"))
    b = normed.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                      F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("na") * F.col("nb"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (a.join(b, F.col("a") < F.col("b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine"))


def hyperplane_signatures(vectors: DataFrame, n_planes: int = 16, seed: int = 42,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          dim: int = 64) -> DataFrame:
    """(id, bucket) random-hyperplane LSH signature (sign bits packed to int).
    Cosine-similar vectors collide with prob 1 - theta/pi per bit."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    schema = StructType([StructField(id_col, LongType()),
                         StructField("bucket", LongType())])

    def sig(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy())
            bits = (mat @ planes.T) > 0
            bucket = (bits.astype(np.uint64) <<
                      np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                "bucket": bucket.astype(np.int64)})

    return vectors.select(id_col, vec_col).mapInPandas(sig, schema=schema)


def ivf_assignments(vectors: DataFrame, centroids: np.ndarray,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, centroid_id) inverted-file assignment: nearest centroid by
    cosine. One broadcast-matmul map pass (centroids ride the closure);
    at scale ``centroid_id`` is the partition/cluster key of the vector
    table, so a probe reads only its lists."""
    cm = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1)
    cn[cn == 0] = 1.0
    schema = StructType([StructField(id_col, LongType()),
                         StructField("centroid_id", IntegerType())])

    def assign(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy())
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            sims = (mat @ cm.T) / (vn[:, None] * cn[None, :])
            # deterministic tie-break: np.argmax returns the FIRST maximum,
            # i.e. the lowest centroid id — matching the SQL oracle's
            # row_number() ORDER BY s DESC, cid
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                "centroid_id": best.astype(np.int32)})

    return vectors.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def kmeans_fit(vectors: DataFrame, n_centroids: int = 16, n_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Distributed spherical k-means (Lloyd's algorithm) for IVF centroid
    training — the iterative step that upgrades ``cosine_topk_ivf``'s
    deterministic seed centroids to real cluster centers.

    Per iteration: ONE map pass fuses the cosine-argmax assignment (the
    same kernel as ``ivf_assignments``) with per-batch partial sums, so
    each task emits at most k rows of (sum-vector, count) and the shuffle
    and driver carry only k x n_tasks tiny rows (k=16, dim=64 -> 8 KiB
    per task per iteration; at 10^9 vectors the cost per iteration is
    exactly one scan — no join back to the vector table, whose shuffle
    would move the full embedding column every iteration).
    Initialization is the first ``n_centroids`` vectors in id order —
    deterministic, same seeds as the IVF oracle. Empty clusters keep
    their previous centroid (the standard Lloyd degeneracy rule, and what
    the SQL oracle's left-join coalesce reproduces)."""
    rows = (vectors.select(id_col, vec_col).orderBy(id_col)
            .limit(n_centroids).collect())
    cm = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    dim = cm.shape[1]
    part_schema = StructType(
        [StructField("centroid_id", IntegerType()),
         StructField("cnt", LongType())] +
        [StructField(f"s{d}", DoubleType()) for d in range(dim)])
    for _ in range(n_iter):
        cmat = cm  # capture this iteration's centroids in the closure
        cn = np.linalg.norm(cmat, axis=1)
        cn[cn == 0] = 1.0

        def partials(it, cmat=cmat, cn=cn):
            for pdf in it:
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                vn = np.linalg.norm(mat, axis=1)
                vn[vn == 0] = 1.0
                sims = (mat @ cmat.T) / (vn[:, None] * cn[None, :])
                best = np.argmax(sims, axis=1)
                cnt = np.bincount(best, minlength=len(cmat))
                nz = np.nonzero(cnt)[0]
                sums = np.zeros((len(cmat), mat.shape[1]))
                np.add.at(sums, best, mat)
                out = {"centroid_id": nz.astype(np.int32),
                       "cnt": cnt[nz].astype(np.int64)}
                for d in range(mat.shape[1]):
                    out[f"s{d}"] = sums[nz, d]
                yield pd.DataFrame(out)

        agg = (vectors.select(vec_col).mapInPandas(partials,
                                                   schema=part_schema)
               .groupBy("centroid_id")
               .agg(F.sum("cnt").alias("n"),
                    *[F.sum(f"s{d}").alias(f"s{d}") for d in range(dim)])
               .collect())
        new = cm.copy()
        for r in agg:
            if r["n"]:
                new[r["centroid_id"]] = [r[f"s{d}"] / r["n"]
                                         for d in range(dim)]
        cm = new
    return cm


def cosine_topk_ivf(vectors: DataFrame, query_vec: list[float], k: int = 10,
                    n_centroids: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    centroids: np.ndarray | None = None) -> DataFrame:
    """Approximate top-k via IVF: probe the query's ``nprobe`` nearest
    centroid lists, exact cosine within candidates.

    Default centroids are the first ``n_centroids`` vectors in id order —
    deterministic and oracle-reproducible; production swaps in k-means
    centroids (the operator only needs the matrix). Scale path: assignment
    is a map pass, the probe is a partition-pruned scan of nprobe lists."""
    if centroids is None:
        rows = (vectors.select(id_col, vec_col).orderBy(id_col)
                .limit(n_centroids).collect())
        centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    cm = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1)
    cn[cn == 0] = 1.0
    qs = (cm @ q) / (cn * (np.linalg.norm(q) or 1.0))
    order = np.lexsort((np.arange(len(qs)), -qs))
    probes = [int(c) for c in order[:nprobe]]
    asg = ivf_assignments(vectors, cm, id_col, vec_col)
    cand = vectors.join(asg.filter(F.col("centroid_id").isin(probes)),
                        id_col, "left_semi")
    return cosine_topk_bruteforce(cand, [float(x) for x in q], k, id_col, vec_col)


def cosine_topk_lsh(vectors: DataFrame, query_vec: list[float], k: int = 10,
                    n_planes: int = 8, seed: int = 42, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket (plus hamming-1
    neighbor buckets), exact cosine within candidates. The scale path: the
    bucket column is a partition/cluster key at 10^12 rows."""
    dim = len(query_vec)
    sigs = hyperplane_signatures(vectors, n_planes, seed, id_col, vec_col, dim)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbits = (planes @ np.asarray(query_vec, dtype=np.float64)) > 0
    qbucket = int((qbits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum())
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]
    cand = (vectors.join(sigs.filter(F.col("bucket").isin(probes)), id_col, "left_semi"))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def semantic_dedup(vectors: DataFrame, threshold: float = 0.6,
                   n_centroids: int = 16, n_iter: int = 1,
                   centroids: np.ndarray | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   chunk_rows: int = 1024) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-
    duplicate removal by clustering embeddings and comparing pairs ONLY
    within a cluster — the all-pairs O(n^2) cosine matrix becomes
    O(sum c_i^2) where c_i are cluster sizes chosen by ``n_centroids``.

    Deterministic keep rule (the order-stable variant of the paper's
    epsilon-dedup): a vector is a duplicate iff SOME lower-id member of
    its cluster has cosine >= ``threshold`` with it; ``dup_of`` is the
    lowest such id. Id order replaces the paper's distance-to-centroid
    order so the result is partition-invariant and SQL-reproducible.

    Returns (id, centroid_id, keep, dup_of): keep=1 rows are the
    surviving corpus, ``dup_of`` names the kept witness for each drop.

    Scale shape: centroid training is ``kmeans_fit`` (one scan per
    iteration, k-row shuffle); assignment is one broadcast-matmul map
    pass; the pair stage shuffles each vector ONCE on centroid_id and
    runs a row-chunked matmul per cluster (chunk_rows x c, never c x c,
    so a hot cluster is memory-bounded). At 10^9 vectors pick
    ``n_centroids ~ n / 10^4`` so clusters stay ~10^4 rows; clusters are
    independent, so skew lands on AQE-splittable single groups."""
    if centroids is None:
        centroids = kmeans_fit(vectors, n_centroids, n_iter, id_col, vec_col)
    asg = ivf_assignments(vectors, centroids, id_col, vec_col)
    joined = vectors.select(id_col, vec_col).join(asg, id_col)
    schema = StructType([StructField(id_col, LongType()),
                         StructField("centroid_id", IntegerType()),
                         StructField("keep", IntegerType()),
                         StructField("dup_of", LongType())])

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        n = len(unit)
        dup_of = np.full(n, -1, dtype=np.int64)
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            if hi <= 1:
                continue
            # rows lo:hi vs ALL earlier columns 0:hi (strictly lower id)
            sims = unit[lo:hi] @ unit[:hi].T
            valid = ((np.round(sims, 6) >= threshold)
                     & (np.arange(hi)[None, :]
                        < np.arange(lo, hi)[:, None]))
            has = valid.any(axis=1)
            dup_of[lo:hi][has] = np.argmax(valid, axis=1)[has]
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            id_col: ids,
            "centroid_id": pdf["centroid_id"].astype("int32"),
            "keep": (dup_of < 0).astype("int32"),
            "dup_of": pd.array([None if d < 0 else int(ids[d])
                                for d in dup_of], dtype="Int64")})

    return joined.groupBy("centroid_id").applyInPandas(per_cluster, schema)


def pq_train(vectors: DataFrame, m: int = 4, k: int = 16, n_iter: int = 0,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64) -> np.ndarray:
    """Product-quantization codebooks (Jegou, Douze & Schmid 2011, TPAMI
    "Product quantization for nearest neighbor search"): split the vector
    into ``m`` subspaces and learn ``k`` L2 centroids per subspace.
    Seeds are the first ``k`` vectors' sub-slices in id order
    (deterministic, oracle-reproducible); ``n_iter`` L2-Lloyd iterations
    refine them — each iteration is ONE map pass emitting per-(subspace,
    centroid) partial sums, so the shuffle/driver carry m x k tiny rows
    per task, never the vectors (the kmeans_fit shape, argmin-L2 instead
    of argmax-cosine). Returns (m, k, dim//m).
    """
    sub = dim // m
    rows = (vectors.select(id_col, vec_col).orderBy(id_col)
            .limit(k).collect())
    seed = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    cb = np.stack([seed[:, j * sub:(j + 1) * sub] for j in range(m)])
    part_schema = StructType(
        [StructField("subspace", IntegerType()),
         StructField("code", IntegerType()),
         StructField("cnt", LongType())] +
        [StructField(f"s{d}", DoubleType()) for d in range(sub)])
    for _ in range(n_iter):
        cmat = cb.copy()

        def partials(it, cmat=cmat):
            for pdf in it:
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                out = []
                for j in range(m):
                    x = mat[:, j * sub:(j + 1) * sub]
                    # expansion form x.x - 2x.c + c.c: the SAME formula the
                    # SQL oracle evaluates (keeps rounded argmins aligned)
                    d2 = ((x ** 2).sum(axis=1)[:, None]
                          - 2.0 * (x @ cmat[j].T)
                          + (cmat[j] ** 2).sum(axis=1)[None, :])
                    best = np.argmin(np.round(d2, 6), axis=1)
                    cnt = np.bincount(best, minlength=k)
                    sums = np.zeros((k, sub))
                    np.add.at(sums, best, x)
                    nz = np.nonzero(cnt)[0]
                    o = {"subspace": np.full(len(nz), j, dtype=np.int32),
                         "code": nz.astype(np.int32),
                         "cnt": cnt[nz].astype(np.int64)}
                    for d in range(sub):
                        o[f"s{d}"] = sums[nz, d]
                    out.append(pd.DataFrame(o))
                yield pd.concat(out, ignore_index=True)

        agg = (vectors.select(vec_col).mapInPandas(partials, schema=part_schema)
               .groupBy("subspace", "code")
               .agg(F.sum("cnt").alias("n"),
                    *[F.sum(f"s{d}").alias(f"s{d}") for d in range(sub)])
               .collect())
        new = cb.copy()
        for r in agg:
            if r["n"]:
                new[r["subspace"], r["code"]] = [r[f"s{d}"] / r["n"]
                                                 for d in range(sub)]
        cb = new
    return cb


def pq_encode(vectors: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): per-subspace argmin-L2 code (distances
    rounded @6 before the argmin, ties to the lowest code — the
    determinism contract every oracle-checked op here uses). One
    broadcast-matmul map pass; at 10^9 x dim-64 float vectors the coded
    table is 16x smaller (m bytes-ish vs dim floats) — the reason PQ is
    the RAM-resident leg of a 100-TB ANN stack."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = cb.shape
    schema = StructType([StructField(id_col, LongType()),
                         StructField("codes", ArrayType(IntegerType()))])

    def enc(it):
        for pdf in it:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                x = mat[:, j * sub:(j + 1) * sub]
                d2 = ((x ** 2).sum(axis=1)[:, None]
                      - 2.0 * (x @ cb[j].T)
                      + (cb[j] ** 2).sum(axis=1)[None, :])
                codes[:, j] = np.argmin(np.round(d2, 6), axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                "codes": list(codes)})

    return vectors.select(id_col, vec_col).mapInPandas(enc, schema=schema)


def cosine_topk_pq(vectors: DataFrame, query_vec: list[float], k: int = 10,
                   codebooks: np.ndarray | None = None, adc_candidates: int = 50,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   codes: DataFrame | None = None) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance (ADC) + exact rerank:
    score each coded vector as sum_j LUT[j, code_j] where LUT = the query
    sub-vector dot each sub-centroid (reconstruction dot product), take
    the ``adc_candidates`` best (rounded @6, id ties), then exact-cosine
    rerank ONLY those. The ADC pass touches codes + a broadcast m x k
    lookup table — never the float vectors; the rerank joins back
    ``adc_candidates`` rows. Scale: compose with IVF (probe lists first)
    for 10^9+; here PQ is the standalone leg."""
    if codebooks is None:
        codebooks = pq_train(vectors, id_col=id_col, vec_col=vec_col,
                             dim=len(query_vec))
    cb = np.asarray(codebooks, dtype=np.float64)
    m, nk, sub = cb.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.stack([cb[j] @ q[j * sub:(j + 1) * sub] for j in range(m)])
    if codes is None:
        codes = pq_encode(vectors, cb, id_col, vec_col)
    lut_col = F.array(*[F.array(*[F.lit(float(lut[j, c])) for c in range(nk)])
                        for j in range(m)])
    adc = F.round(sum(F.element_at(F.element_at(lut_col, j + 1),
                                   F.col("codes")[j] + 1)
                      for j in range(m)), 6)
    cand = (codes.select(F.col(id_col), adc.alias("adc"))
            .orderBy(F.desc("adc"), F.asc(id_col)).limit(adc_candidates))
    exact = vectors.join(cand.select(id_col), id_col, "left_semi")
    return cosine_topk_bruteforce(exact, [float(x) for x in q], k,
                                  id_col, vec_col, round_digits=6)
