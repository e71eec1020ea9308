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

from xltsearch_spark.operators._parallel import (
    ensure_min_parallelism, materialize_once as _materialize_once)

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
    """Per-row array of 63-bit hashes of word n-gram shingles.

    Fully vectorized across the Arrow batch: tokens are factorized so each
    distinct token is FNV-hashed exactly ONCE (hash_str64_batch), and the
    n-gram polynomial runs over the flat concatenated hash array with
    row-boundary windows excluded by slicing — no per-token Python in the
    hot path (the old per-token loop was the dominant dedup CPU at scale)."""
    token_lists = texts.fillna("").str.lower().str.findall(r"\w+")
    th, lens = _token_hashes_flat(token_lists)
    B = np.uint64(1099511628211)
    total = th.size
    if total >= n:
        acc = th[: total - n + 1].copy()
        for k in range(1, n):
            acc = acc * B + th[k: total - n + 1 + k]
        acc &= np.uint64((1 << 61) - 1)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    out = []
    for r in range(len(lens)):
        if lens[r] < n:
            out.append(np.zeros(0, dtype=np.uint64))
        else:
            # global start positions for row r; windows that would cross
            # into the next row fall outside [offsets[r], offsets[r+1]-n]
            out.append(np.unique(acc[offsets[r]: offsets[r + 1] - n + 1]))
    return out


def _token_hashes_flat(token_lists: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten per-row token lists -> (flat uint64 FNV hashes, row lengths).

    pd.factorize dedups the batch vocabulary (C hash table), so the string
    hashing cost is O(distinct tokens), not O(total tokens)."""
    nrows = len(token_lists)
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=nrows)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), lens
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        flat[pos: pos + len(toks)] = toks
        pos += len(toks)
    codes, uniq = pd.factorize(flat)
    return hash_str64_batch(uniq)[codes], lens


def hash_str64(s: str) -> int:
    """FNV-1a 64-bit (stable across processes, unlike Python hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_str64_batch(strs) -> np.ndarray:
    """Vectorized FNV-1a 64-bit over a sequence of strings — bit-identical
    to hash_str64 (oracles stay valid), computed by marching all strings'
    byte columns in lockstep. Tokens are short, so the loop runs max-token-
    length iterations of whole-array numpy ops instead of one Python loop
    per byte per token (~50x). Strings are processed in length-sorted
    chunks under a fixed cell budget so one pathological long token (a
    base64 blob, minified code) can't blow the padded matrix up to
    n_strings x max_len bytes."""
    n = len(strs)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    enc = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    prime = np.uint64(0x100000001B3)
    budget = 1 << 26  # 64M matrix cells (~64 MB) per chunk
    start = 0
    while start < n:
        # grow the chunk while rows x (current max len) stays in budget
        end = start + 1
        maxlen = int(lens[order[end - 1]])
        while end < n:
            cand = max(maxlen, int(lens[order[end]]))
            if (end - start + 1) * cand > budget:
                break
            maxlen, end = cand, end + 1
        idx = order[start:end]
        m = idx.size
        h = np.full(m, 0xCBF29CE484222325, dtype=np.uint64)
        if maxlen > 0:
            clens = lens[idx]
            buf = np.zeros((m, maxlen), dtype=np.uint8)
            mask = np.arange(maxlen)[None, :] < clens[:, None]
            buf[mask] = np.frombuffer(b"".join(enc[i] for i in idx), dtype=np.uint8)
            for j in range(maxlen):
                active = mask[:, j]
                h[active] = (h[active] ^ buf[active, j]) * prime  # uint64 wraps
        out[idx] = h
        start = end
    return out


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
        M = np.uint64(_MERSENNE)
        for pdf in it:
            shingles = _shingle_hashes(pdf[text_col], shingle_n)
            nrows = len(shingles)
            lens = np.fromiter((s.size for s in shingles), dtype=np.int64,
                               count=nrows)
            sig_mat = np.full((nrows, num_hashes), _MERSENNE, dtype=np.int64)
            nz = lens > 0
            if nz.any():
                # batch-vectorized: ONE flat array of every doc's shingles,
                # then per hash function a whole-array permute + segmented
                # min (reduceat at doc offsets) — no per-doc Python loop.
                # uint64 multiply wraps mod 2^64 exactly like the old
                # per-doc expression, so signatures are bit-identical.
                flat = np.concatenate([s for s in shingles if s.size])
                starts = np.concatenate(
                    ([0], np.cumsum(lens[nz])[:-1]))
                for h in range(num_hashes):
                    vals = (a[h] * flat + b[h]) % M
                    sig_mat[nz, h] = np.minimum.reduceat(vals, starts) \
                        .astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "sig": sig_mat.tolist()})

    inp = ensure_min_parallelism(df.select("doc_id", text_col), "doc_id")
    return inp.mapInPandas(compute, schema=schema)


def minhash_lsh_candidates(sigs: DataFrame, bands: int = 16,
                           rows_per_band: int = 4,
                           max_bucket_size: int | None = None) -> DataFrame:
    """Distinct candidate id pairs (a < b) sharing >= 1 LSH band bucket.

    The banded shuffle carries ONLY (band, bucket, doc_id) — signatures are
    re-attached later, once per surviving pair, instead of riding the
    x`bands` explode replication (at 10^9 docs a 64-long sig x16 bands is
    ~1 KB/doc of pure shuffle waste).

    ``max_bucket_size`` drops buckets above the cap before pairing: a
    bucket of B docs emits B^2/2 pairs, and at web scale a cluster of k
    near-identical boilerplate docs fills a bucket with all k of them.
    Capped clusters are better handled by exact_dedup_groups first (byte
    dups) or transitive closure over the surviving pair graph."""
    sigs = _materialize_once(sigs)  # self-join branches share one compute
    banded = _band_keys(sigs, bands, rows_per_band)
    if max_bucket_size is not None:
        ok = (banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
              .filter(F.col("bsz") <= max_bucket_size).drop("bsz"))
        banded = banded.join(ok, ["band", "bucket"])
    left = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (left.join(right, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def _band_keys(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc_id, band, bucket) LSH band keys — the id-only banded layout
    shared by within-corpus and cross-corpus candidate generation."""
    return sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.hash(F.concat_ws(",", F.lit(bnd), *[
                F.col("sig")[bnd * rows_per_band + r] for r in range(rows_per_band)]))
            for bnd in range(bands)])).alias("band", "bucket"))


def cross_corpus_candidates(new_sigs: DataFrame, ref_sigs: DataFrame,
                            bands: int = 16, rows_per_band: int = 4,
                            max_bucket_size: int | None = None) -> DataFrame:
    """Distinct (a=new_id, b=ref_id) pairs sharing >= 1 LSH band bucket
    ACROSS corpora — the incremental-dedup primitive: dedup crawl N
    against the union of crawls 1..N-1 without ever pairing the
    reference against itself.

    Scale shape: both sides shuffle id-only band keys on (band, bucket)
    — one equi-join, no all-pairs, no broadcast of the reference (at
    web scale the reference is the BIG side). ``max_bucket_size`` caps
    COMBINED bucket occupancy (a boilerplate bucket hot on either side
    explodes the join) — capped buckets are better handled by exact
    hash dedup first, same rationale as minhash_lsh_candidates."""
    # with a bucket cap each side is consumed by the occupancy union AND
    # its own join probe — materialize so signatures compute once per side
    nb = _band_keys(_materialize_once(new_sigs), bands, rows_per_band)
    rb = _band_keys(_materialize_once(ref_sigs), bands, rows_per_band)
    if max_bucket_size is not None:
        ok = (nb.unionByName(rb).groupBy("band", "bucket")
              .agg(F.count("*").alias("bsz"))
              .filter(F.col("bsz") <= max_bucket_size).drop("bsz"))
        nb = nb.join(ok, ["band", "bucket"])
        rb = rb.join(ok, ["band", "bucket"])
    return (nb.select(F.col("doc_id").alias("a"), "band", "bucket")
            .join(rb.select(F.col("doc_id").alias("b"), "band", "bucket"),
                  ["band", "bucket"])
            .select("a", "b").distinct())


def cross_corpus_near_dups(new: DataFrame, ref: DataFrame,
                           text_col: str = "text", threshold: float = 0.8,
                           shingle_n: int = 3, num_hashes: int = 64,
                           bands: int = 16, rows_per_band: int = 4,
                           max_bucket_size: int | None = None) -> DataFrame:
    """Per-NEW-doc incremental near-dup verdicts against a reference
    corpus: (doc_id, is_dup, best_ref, best_jaccard) for every new doc —
    ``best_ref`` the smallest ref id among the highest-jaccard matches
    (jaccard rounded @6 BEFORE the argmax so ties break identically in
    any engine), NULLs when nothing clears ``threshold``.

    LSH candidates verified with EXACT shingle jaccard (same recall
    argument as minhash_lsh_pairs: P(miss | j>=t) = (1-t^r)^b). The
    verdict aggregate is one window over candidate pairs — bounded by
    the LSH collision count, never |new| x |ref|."""
    from pyspark.sql.window import Window
    nsig = minhash_signatures(new, text_col, num_hashes, shingle_n)
    rsig = minhash_signatures(ref, text_col, num_hashes, shingle_n)
    cand = cross_corpus_candidates(nsig, rsig, bands, rows_per_band,
                                   max_bucket_size)
    both = new.select("doc_id", text_col).unionByName(
        ref.select("doc_id", text_col))
    ex = (pair_exact_jaccard(both, cand, text_col=text_col, n=shingle_n)
          .withColumn("j", F.round("jaccard", 6))
          .filter(F.col("j") >= threshold))
    w = Window.partitionBy("a").orderBy(F.desc("j"), F.asc("b"))
    best = (ex.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("a").alias("doc_id"),
                    F.col("b").alias("best_ref"),
                    F.col("j").alias("best_jaccard")))
    return (new.select("doc_id").join(best, "doc_id", "left")
            .withColumn("is_dup", F.col("best_ref").isNotNull().cast("int"))
            .select("doc_id", "is_dup", "best_ref", "best_jaccard"))


def minhash_lsh_pairs(sigs: DataFrame, bands: int = 16, rows_per_band: int = 4,
                      threshold: float = 0.7) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified by signature-estimated
    jaccard >= threshold. Candidates come from the id-only banded join; the
    two signature re-attach joins shuffle only surviving pairs."""
    n = bands * rows_per_band
    sigs = _materialize_once(sigs)  # banded join + both attach probes
    cand = minhash_lsh_candidates(sigs, bands, rows_per_band)
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    cand = cand.join(sa, "a").join(sb, "b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v) / F.lit(float(n))
    return (cand.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("a", "b", "est_jaccard"))


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node strictly larger than a neighbor
    re-hooks to the minimum of its closed neighborhood. Emits (v, m) for
    each v in N(u) with v > u, where m = min(N(u) + {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m")))
    return (sym.join(mins, "u").filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")).distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: each edge reports to its LARGER endpoint u;
    u's smaller neighbors (and u itself) all re-hook to the minimum."""
    orient = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = orient.groupBy("u").agg(F.min("v").alias("m"))  # all v < u
    nbrs = (orient.join(mins, "u").filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))
    selfs = mins.select("u", F.col("m").alias("v"))  # u > m always holds here
    return nbrs.unionByName(selfs).distinct()


def connected_components(pairs: DataFrame, max_iter: int = 30) -> DataFrame:
    """(doc_id, component) over the near-dup pair graph — the dedup ENDGAME:
    each component keeps min(doc_id) and drops the rest.

    Alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", 2014 — public algorithm): converges
    in O(log n) rounds even on path-shaped graphs, where one-hop min-label
    propagation is O(diameter) — and chain-shaped boilerplate near-dup
    graphs really do go deep. Each round is two groupBy+join passes over the
    edge list — no driver-side graph; edges are localCheckpointed per round
    to keep lineage flat. Convergence = the canonicalized edge set's
    (count, hash-sum) signature repeating, i.e. both stars are fixpoints;
    raises past max_iter rather than silently returning split components.
    Exposes ``connected_components.last_rounds`` for tests/telemetry."""
    # the pair plan (typically a full LSH + exact-verify pipeline) feeds
    # nodes' two branches and the edge seed — pin it once up front
    pairs = _materialize_once(pairs)
    nodes = (pairs.select(F.col("a").alias("node"))
             .unionByName(pairs.select(F.col("b").alias("node"))).distinct())
    e = (pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    prev_sig, converged = None, False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = e.select(
            F.count("*").alias("n"),
            # decimal(38,0) sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64(F.least("u", "v"), F.greatest("u", "v"))
                  .cast("decimal(38,0)")).alias("h")
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    connected_components.last_rounds = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"large/small-star rounds; raise max_iter")
    # fixpoint edges are stars (node -> component min); roots have no out-edge
    star = e.groupBy("u").agg(F.min("v").alias("component"))
    return (nodes.join(star.withColumnRenamed("u", "node"), "node", "left")
            .select(F.col("node").alias("doc_id"),
                    F.coalesce("component", "node").alias("component")))


def dedup_groups(df: DataFrame, text_col: str = "text", n: int = 3,
                 threshold: float = 0.8, bands: int = 16,
                 rows_per_band: int = 4, num_hashes: int = 64) -> DataFrame:
    """End-to-end near-dup GROUPING: MinHash-LSH candidates -> exact-jaccard
    verify -> connected components. Returns (doc_id, component, group_size)
    for every doc in a multi-doc component; dedup = keep doc_id ==
    component, drop the rest."""
    sigs = minhash_signatures(df, text_col=text_col, num_hashes=num_hashes,
                              shingle_n=n)
    cand = minhash_lsh_candidates(sigs, bands=bands, rows_per_band=rows_per_band)
    verified = (pair_exact_jaccard(df, cand, text_col=text_col, n=n)
                .filter(F.col("jaccard") >= threshold))
    comp = connected_components(verified)
    # no broadcast hint: multi-doc components can reach O(n_docs) rows at
    # web scale; sizes is keyed+aggregated, a shuffle join is fine and AQE
    # still broadcasts it when small.
    sizes = comp.groupBy("component").agg(F.count("*").alias("group_size"))
    return (comp.join(sizes, "component")
            .select("doc_id", "component", "group_size"))


def canonical_docs(df: DataFrame, text_col: str = "text", n: int = 3,
                   threshold: float = 0.8, bands: int = 16,
                   rows_per_band: int = 4,
                   num_hashes: int = 64) -> DataFrame:
    """Quality-priority canonical selection per near-dup group — the
    keep-BEST policy of RefinedWeb/FineWeb-style curation (keep-min-id
    keeps whichever crawl happened to come first; keeping the richest
    member preserves more signal at identical dedup rate).

    Groups come from :func:`dedup_groups`; the survivor of each group is
    ``argmax(quality, tie -> min doc_id)`` where quality = analysis token
    count (``[a-z0-9_]+`` runs of the lowercased text — deterministic,
    map-only, and the longest member of a near-dup cluster dominates its
    truncated variants). Docs outside any multi-doc group implicitly keep
    themselves and are not returned.

    Returns (doc_id, component, canonical_id, keep) for every multi-doc
    group member. Scale shape: quality is a map-only projection; the
    argmax is ONE ``max_by`` aggregate over components (map-side partial)
    plus a component-keyed join back — group count is bounded by doc
    count, skew delegated to AQE like the group-size join in
    :func:`dedup_groups`."""
    comp = dedup_groups(df, text_col=text_col, n=n, threshold=threshold,
                        bands=bands, rows_per_band=rows_per_band,
                        num_hashes=num_hashes)
    quality = df.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit("[a-z0-9_]+"), 0)).alias("quality"))
    members = comp.join(quality, "doc_id")
    best = members.groupBy("component").agg(
        F.max_by("doc_id", F.struct(F.col("quality"),
                                    (-F.col("doc_id")).alias("neg_id")))
        .alias("canonical_id"))
    return (members.join(best, "component")
            .select("doc_id", "component", "canonical_id",
                    (F.col("doc_id") == F.col("canonical_id"))
                    .cast("int").alias("keep")))


def pair_exact_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                       n: int = 3) -> DataFrame:
    """Exact n-gram jaccard for GIVEN candidate pairs (a, b).

    The verification stage of every LSH family here (minhash / simhash emit
    candidates; this computes the exact set overlap for just those pairs).
    Shuffle volume = shingles of pair-member docs only: pairs x shingles(A)
    joined to shingles(B) on (b, shingle) counts the intersection without an
    all-pairs or all-shingle self-join. Pairs with zero overlap drop out
    (jaccard 0)."""
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

    # the candidate-pair plan (often a full banded LSH join) is consumed
    # by ids' two branches AND the intersection join — pin it once
    pairs = _materialize_once(pairs)
    ids = (pairs.select(F.col("a").alias("doc_id"))
           .unionByName(pairs.select(F.col("b").alias("doc_id"))).distinct())
    # the semi-join is usually a broadcast (ids side is small), which keeps
    # the scan's partitioning — floor the parallelism before the Python
    # shingle pass like the other emitters
    # explicit repartition on the shingle key: the two join probes AND the
    # size aggregate all consume the SAME exchange (ReusedExchange), so the
    # Python shingle emitter runs ONCE instead of once per consumer (the
    # substring operator's measured pattern). The parallelism floor uses a
    # RAISED threshold here: the emitter already feeds a repartition, and
    # measured small-input walls double when an extra upstream shuffle is
    # added — only spread inputs whose serialized emitter cost clearly
    # beats one extra stage (2 MB stats/partition ~ 4 MB text ~ 0.5 s of
    # single-core shingling; alternating A/B at the 10x table favored the
    # 2 MB floor in 4/4 pairs, and sf0.1 stays below it = no-op).
    # pinned after the repartition: exchange reuse alone does NOT survive a
    # persisted input (see materialize_once) — without the pin the Python
    # emitter re-runs once per consumer (measured 3x here) whenever the
    # caller passed a cached corpus, which bench/curation pipelines do
    ex = _materialize_once(
        ensure_min_parallelism(df.join(ids, "doc_id", "left_semi")
                               .select("doc_id", text_col), "doc_id",
                               min_bytes=2 << 20)
        .mapInPandas(shingles, schema=schema)
        .repartition("shingle"))
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ex_a = ex.select(F.col("doc_id").alias("a"), "shingle")
    ex_b = ex.select(F.col("doc_id").alias("b"), "shingle")
    inter = (pairs.select("a", "b").join(ex_a, "a").join(ex_b, ["b", "shingle"])
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "a")
                  .withColumnRenamed("sz", "sz_a"), "a")
            .join(sizes.withColumnRenamed("doc_id", "b")
                  .withColumnRenamed("sz", "sz_b"), "b")
            .withColumn("jaccard", F.col("inter") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .select("a", "b", "jaccard"))


def simhash_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash: long) — 64-bit simhash over tf-weighted tokens."""
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", LongType())])

    def compute(it):
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for pdf in it:
            token_lists = pdf[text_col].fillna("").str.lower().str.findall(r"\w+")
            th, lens = _token_hashes_flat(token_lists)
            nrows = len(lens)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            # per-occurrence +/-1 bit sums per row, one bit plane at a time:
            # the working set stays ~12 B/token (a full (tokens x 64) int32
            # contribution matrix saturates the shared DRAM bus with 32
            # concurrent workers). tf-weighting is implicit in the
            # per-occurrence sum, identical to the old unique x counts.
            v = np.zeros((nrows, 64), dtype=np.int64)
            nz = lens > 0
            starts = offsets[:-1][nz]
            if starts.size:
                # zero-width (empty) rows make consecutive non-empty starts
                # exact segment bounds, so reduceat needs no sentinels
                nzlens = lens[nz]
                for b in range(64):
                    bitv = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
                    ones = np.add.reduceat(bitv, starts)
                    v[nz, b] = 2 * ones.astype(np.int64) - nzlens
            packed = ((v > 0).astype(np.uint64) * bitcols[None, :]).sum(axis=1)
            # store the uint64 pattern as signed int64 (flip bit 63 for
            # every doc uniformly -> hamming distances preserved); empty
            # docs keep the legacy simhash of exactly 0
            sh = (packed ^ np.uint64(1 << 63)).view(np.int64)
            sh = np.where(lens == 0, np.int64(0), sh)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "simhash": sh})

    inp = ensure_min_parallelism(df.select("doc_id", text_col), "doc_id")
    return inp.mapInPandas(compute, schema=schema)


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 3, bands: int | None = None,
                       blocks: int | None = None,
                       max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Multi-table block-combination scheme (Manku et al., WWW'07 "Detecting
    Near-Duplicates for Web Crawling", public): split the 64 bits into
    ``blocks`` near-equal blocks; a pair within distance d corrupts at most d
    blocks, so at least ``r = blocks - max_hamming`` blocks survive intact and
    the pair collides in at least one of the C(blocks, r) tables keyed on an
    r-block combination. Wider keys (r*width bits) keep bucket occupancy tiny
    where the naive blocks = max_hamming+1 split (16-bit keys for d=3) packs
    ~n/2^16 docs per bucket and goes quadratic at web scale.

    Default blocks=6 for d=3: C(6,3)=20 tables of ~32-bit keys. When
    blocks <= max_hamming the scheme degrades to single-block keys
    (best-effort recall, the caller asked for a distance the split cannot
    guarantee). ``max_bucket_size`` (optional) drops pathological buckets
    outright — a bucket with B docs costs B^2/2 pair checks, and at 10^9 docs
    a hot bucket is boilerplate that exact verification would reject anyway.
    ``bands`` is the legacy alias for ``blocks``."""
    import itertools
    fps = _materialize_once(fps)  # banded self-join + both hamming probes
    if blocks is None:
        blocks = bands if bands is not None else (6 if max_hamming < 6 else max_hamming + 1)
    r = max(blocks - max_hamming, 1)
    combos = list(itertools.combinations(range(blocks), r))
    if len(combos) > 64:  # table-count cap: fall back to the pigeonhole minimum
        combos = [(i,) for i in range(blocks)]
    widths = [64 // blocks + (1 if i < 64 % blocks else 0) for i in range(blocks)]
    offs = np.concatenate(([0], np.cumsum(widths))).tolist()

    def chunk(i):
        return (F.shiftrightunsigned(F.col("simhash"), offs[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)))

    keys = [F.hash(F.lit(ci), *[chunk(i) for i in combo])
            for ci, combo in enumerate(combos)]
    banded = fps.select(
        "doc_id", F.posexplode(F.array(*keys)).alias("band", "chunk"))
    if max_bucket_size is not None:
        ok = (banded.groupBy("band", "chunk").agg(F.count("*").alias("bsz"))
              .filter(F.col("bsz") <= max_bucket_size).drop("bsz"))
        banded = banded.join(ok, ["band", "chunk"])
    l = banded.select(F.col("doc_id").alias("a"), "band", "chunk")
    rt = banded.select(F.col("doc_id").alias("b"), "band", "chunk")
    cand = (l.join(rt, ["band", "chunk"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    fa = fps.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    fb = fps.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.join(fa, "a").join(fb, "b").withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram jaccard over candidate pairs that share >= 1 shingle.

    Inverted join: explode (doc, shingle) -> self-join on shingle ->
    per-pair intersection count via groupBy -> jaccard with |A|,|B| from a
    broadcast size table. Never materializes the n^2 pair space.

    ``max_shingle_df`` drops shingles present in more than that many docs
    BEFORE the self-join (and from the size/intersection universe, so the
    jaccard stays internally consistent): a shingle shared by k docs emits
    k^2/2 join rows, and on a web corpus boilerplate shingles have k ~ 10^6
    — one hot shingle would otherwise dominate the whole shuffle. High-df
    shingles carry no near-dup signal (they match everything), so the
    filtered jaccard is the standard practical estimator. The default None
    keeps the round-1 EXACT contract; SET A CAP for any corpus where a
    shingle can realistically repeat across thousands of docs."""
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

    # one exchange on the shingle key feeds the df-cap filter, both join
    # probes and the size aggregate — the emitter runs once (see
    # pair_exact_jaccard / substring for the measured pattern). Raised
    # floor threshold for the same reason as pair_exact_jaccard: the
    # shingle repartition already spreads downstream work; an extra
    # upstream shuffle measurably doubles small-input walls (2.0 s vs
    # 0.97 s at sf0.1) and only pays once the serialized emitter clearly
    # beats one extra stage (2 MB stats/partition; sf0.1 stays a no-op,
    # 10x A/B favored 2 MB in 4/4 alternating pairs).
    # pinned after the repartition: exchange reuse alone does NOT survive a
    # persisted input (see materialize_once) — without the pin the Python
    # emitter re-ran up to 8x (4 consumers x 2 plan copies) over a cached
    # corpus, the bench's exact shape
    ex = _materialize_once(
        ensure_min_parallelism(df.select("doc_id", text_col), "doc_id",
                               min_bytes=2 << 20)
        .mapInPandas(shingles, schema=schema).repartition("shingle"))
    if max_shingle_df is not None:
        keep = (ex.groupBy("shingle").agg(F.count("*").alias("sdf"))
                .filter(F.col("sdf") <= max_shingle_df).drop("sdf"))
        ex = ex.join(keep, "shingle")
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (ex.alias("x").join(ex.alias("y"), "shingle")
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
             .agg(F.count("*").alias("inter")))
    # NOTE: no broadcast hint — ``sizes`` has one row per document, which is
    # multi-GB at 10^9 docs. Plain equi-joins; AQE picks broadcast when the
    # table actually fits (same pattern as pair_exact_jaccard).
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "a")
                 .withColumnRenamed("sz", "sz_a"), "a")
           .join(sizes.withColumnRenamed("doc_id", "b")
                 .withColumnRenamed("sz", "sz_b"), "b")
           .withColumn("jaccard", F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", "jaccard"))
    return out
