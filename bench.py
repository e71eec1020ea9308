"""Headline benchmark: index-build throughput + query latencies + pipeline ops.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "build_docs_per_sec": ..., "query_p95_sec": ...}

The BASELINE.json metric is index-build docs/sec + top-k p95 latency; both
are reported as extra keys. The build-throughput corpus is the deterministic
fixture corpus (FIXTURES.md 'bench' family) at a size scaled by sf so the
number reflects tokenization+shuffle work, not per-job overhead; query
latencies run against the sf documents index.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    build_docs = int(os.environ.get("BENCH_BUILD_DOCS", "100000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F
    from xltsearch_spark.config import IndexConfig
    from xltsearch_spark.operators import dedup, similarity, textstats
    from xltsearch_spark.operators.build import IndexBuilder
    from xltsearch_spark.operators.search import SearchEngine
    from xltsearch_spark.session import get_spark
    from xltsearch_spark.sources.corpus import generate_corpus
    import __spark_entry__ as entry_mod

    # host-load telemetry: this sandbox suffers intermittent 2-8x
    # hypervisor-level slowdowns invisible to /proc/stat (see
    # BENCH/BASELINE.md variance notes). Two probes are recorded so a
    # reader can classify steal-vs-real directly from the artifact:
    # loadavg catches self-inflicted load (overlapping suites), and a
    # fixed numpy matmul calibrates raw host speed (~2.0 s healthy on
    # this box; 3.5 s+ = degraded, scale ratios accordingly).
    loadavg_1m = os.getloadavg()[0]
    t_cal = time.time()
    a = np.random.default_rng(0).standard_normal((2000, 2000))
    for _ in range(3):
        a @ a
    calib_sec = round(time.time() - t_cal, 3)

    spark = get_spark("bench", cores=cores, shuffle_partitions=cores)
    timings: dict[str, float] = {}
    t_total0 = time.time()

    # ---- 1. index-build throughput (docs/sec) on the fixture corpus ----
    corpus_pd = generate_corpus(build_docs)
    cfg = IndexConfig(name="bench", doc_range_size=2048, block_size=128,
                      term_buckets=max(cores, 16))
    corpus = spark.createDataFrame(corpus_pd).repartition(cores)
    corpus.persist().count()  # materialize input outside the timed section
    builder = IndexBuilder(spark, cfg)
    # per-stage walls (VERDICT r4 'Next round' #3): a build regression must
    # name its stage in the artifact instead of needing a reversal
    # experiment. Stage boundaries are the persisted actions below — docs
    # materializes with runs (lazy chain), so its wall rides `runs`.
    stage_walls: dict[str, float] = {}
    t0 = time.time()
    ts = time.time()
    docs = builder.docs_stage(corpus).persist()
    runs = builder.runs_stage(docs).persist()
    runs.count()
    stage_walls["docs_runs"] = round(time.time() - ts, 3)
    ts = time.time()
    stats = builder.stats_stage(docs, runs)
    stage_walls["stats"] = round(time.time() - ts, 3)
    ts = time.time()
    dictionary = builder.dictionary_stage(runs).persist()
    dictionary.count()
    stage_walls["dictionary"] = round(time.time() - ts, 3)
    ts = time.time()
    postings = builder.postings_stage(runs, stats).persist()
    postings.count()
    stage_walls["postings"] = round(time.time() - ts, 3)
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    build_docs_per_sec = build_docs / build_sec

    fixture_engine = SearchEngine(spark, postings, docs, dictionary, stats, cfg)

    # ---- 2. top-k query latency over the sf documents index ----
    doc_engine = entry_mod._get_engine(spark, sf_dir)
    q_specs = {
        "q_term": (fixture_engine, "common_token"),           # 90%-df hot term
        "q_and": (fixture_engine, "common_token AND graded"),
        # rare∧frequent: the r5 doc-range pruned path (Lucene leapfrog
        # analog) — the rare term's block ranges push onto the frequent
        # term's scan so its non-overlapping blocks are never decoded
        "q_and_rare": (fixture_engine, "needle_17 AND common_token"),
        "q_or": (fixture_engine, "alpha OR beta OR graded"),
        "q_phrase": (fixture_engine, '"alpha beta"'),
        # rare-term phrase: phrase terms are implicit MUSTs, so the rare
        # term's block ranges prune the frequent term's position blocks
        "q_phrase_rare": (fixture_engine, '"needle_17 common_token"'),
        "q_prefix": (fixture_engine, "needle_1*"),
        "q_fuzzy": (fixture_engine, "gradd~1"),
        "q_doc_term": (doc_engine, "merge"),
        "q_doc_bool": (doc_engine, "merge AND vector NOT column"),
    }
    lat_samples = []
    # WAND path measured explicitly (off by default below cluster scale);
    # min of 3 like every other query — single-shot timings swing 2-6x
    # under host CPU steal (see BENCH/BASELINE.md variance notes)
    fixture_engine.wand_min_df = 1
    fixture_engine.search_scores("common_token", 100).collect()
    wand_runs = []
    for _ in range(3):
        tq = time.time()
        fixture_engine.search_scores("common_token", 100).collect()
        wand_runs.append(time.time() - tq)
    timings["q_term_wand"] = round(min(wand_runs), 3)
    fixture_engine.wand_min_df = 200_000
    for name, (eng, qs) in q_specs.items():
        eng.search_scores(qs, 100).collect()  # warm (plans, code paths)
        runs_sec = []
        for _ in range(3):
            tq = time.time()
            eng.search_scores(qs, 100).collect()
            runs_sec.append(time.time() - tq)
        timings[name] = round(min(runs_sec), 3)
        lat_samples.extend(runs_sec)
    query_p95 = float(np.percentile(lat_samples, 95))
    # steal-robust companion: p95 over the per-query minima. On this host a
    # single hypervisor hiccup in 24 samples sets the raw p95 (documented
    # 2-8x invisible degradation, BENCH/BASELINE.md); the min-of-3 floor
    # per query is the reproducible latency. Both are reported.
    query_p95_best = float(np.percentile(
        [timings[n] for n in q_specs], 95))

    # batched multi-query path: one shared scan + one action for 16 queries
    batch = {f"b{i}": q for i, q in enumerate(
        ["common_token", "graded", "alpha OR beta", "needle_42",
         "common_token AND graded", "import OR merge", "def AND class",
         "shard", "segment OR index", '"alpha beta"', "writer", "reader",
         "flush OR commit", "partition", "executor AND driver", "broadcast"])}
    fixture_engine.search_many(batch, 100).count()  # warm
    tq = time.time()
    fixture_engine.search_many(batch, 100).count()
    batch_sec = time.time() - tq
    timings["batch_16_queries"] = round(batch_sec, 3)
    timings["batch_sec_per_query"] = round(batch_sec / len(batch), 4)

    # r5 surface ops (NOT in the p95 population — bands comparable across
    # rounds): msm-gated boolean (WAND declined by design), facet counts
    # over the full hit set, per-clause explain decomposition
    r5_ops = {
        "q_msm": lambda: fixture_engine.search_scores(
            "alpha OR beta OR graded", 100, msm=2).collect(),
        "q_facets": lambda: fixture_engine.facets(
            "common_token", ["lang", "repo"]).collect(),
        "q_explain": lambda: fixture_engine.explain(
            "alpha OR beta", limit=10).collect(),
        "q_span_near": lambda: fixture_engine.search_span_near(
            "alpha", "beta", 3, limit=100).collect(),
        "q_span_not": lambda: fixture_engine.search_span_not(
            "alpha", "beta", 2, 2, limit=100).collect(),
        "q_collapse": lambda: fixture_engine.search_collapsed(
            "common_token", "lang", 2, 100).collect(),
        "q_phrase_prefix": lambda: fixture_engine.search_phrase_prefix(
            "alpha bet", limit=100).collect(),
        "q_search_after": lambda: fixture_engine.search_after(
            "alpha OR beta", 0.5, 3, limit=100).collect(),
    }
    for name, fn in r5_ops.items():
        fn()  # warm
        runs_sec = []
        for _ in range(3):
            tq = time.time()
            fn()
            runs_sec.append(time.time() - tq)
        timings[name] = round(min(runs_sec), 3)

    # ---- 3. training-pipeline ops on the sf tables ----
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    documents.count()
    embeddings = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                  .select("vec_id", F.col("embedding").cast("array<double>")
                          .alias("embedding")).persist())
    embeddings.count()

    t0 = time.time()
    sigs = dedup.minhash_signatures(documents, num_hashes=64, shingle_n=3)
    dedup.minhash_lsh_pairs(sigs, bands=16, rows_per_band=4, threshold=0.5).count()
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    fps = dedup.simhash_fingerprints(documents)
    # default blocks=6 multi-table scheme (the 100-TB config: 20 tables of
    # ~32-bit keys) — costlier than the legacy 4x16-bit bands at sandbox
    # scale, but the one whose bucket occupancy survives 10^9 docs
    dedup.simhash_near_pairs(fps, max_hamming=3).count()
    timings["dedup_simhash"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.ngram_jaccard_pairs(documents, n=5, threshold=0.8,
                              max_shingle_df=100).count()
    timings["dedup_ngram_jaccard"] = round(time.time() - t0, 3)

    # span-level substring dedup (hashed scale path: xxhash64 window keys)
    t0 = time.time()
    from xltsearch_spark.operators import substring as substr_ops
    substr_ops.substring_dedup_stats(documents, min_len=20, hashed=True).count()
    timings["dedup_substring"] = round(time.time() - t0, 3)

    t0 = time.time()
    textstats.quality_scores(documents).count()
    textstats.language_id(documents).count()
    timings["text_stats"] = round(time.time() - t0, 3)

    # trainer last mile: chunked packing (two-pass global prefix sum)
    t0 = time.time()
    from xltsearch_spark.operators import packing
    ntok = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    pdocs = documents.select("doc_id", "source", ntok.alias("n_tokens"))
    packing.pack_chunked(pdocs, budget=2048).count()
    timings["pack_sequences"] = round(time.time() - t0, 3)

    # composed curation verdict (quality+lang+split single pass, sha256
    # dedup window, broadcast contamination join)
    t0 = time.time()
    from xltsearch_spark.operators.curation import curate
    curate(documents, documents.filter(F.col("doc_id") % 50 == 0)).count()
    timings["pipeline_curate"] = round(time.time() - t0, 3)

    # B3 parse stage: pure JVM regexp chain, map-only (no shuffle, no UDF)
    t0 = time.time()
    from xltsearch_spark.operators import parse as parse_ops
    parse_ops.extract_text(
        documents.select("doc_id", F.col("text").alias("content"))).count()
    timings["parse_extract"] = round(time.time() - t0, 3)

    t0 = time.time()
    from xltsearch_spark.operators import events as ev_ops
    events_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_ops.windowed_rollup(events_df).count()
    ev_ops.sessionize(events_df, gap_minutes=30).count()
    timings["events_rollup_sessionize"] = round(time.time() - t0, 3)

    t0 = time.time()
    qvecs = np.stack([r["embedding"] for r in embeddings.limit(8).collect()])
    similarity.cosine_topk_batch(embeddings, qvecs, k=10).count()
    timings["ann_batch_topk"] = round(time.time() - t0, 3)

    # SemDeDup: trained-centroid clustering + within-cluster pair matmuls
    t0 = time.time()
    similarity.semantic_dedup(embeddings, threshold=0.35,
                              n_centroids=16, n_iter=1).count()
    timings["dedup_semantic"] = round(time.time() - t0, 3)

    # Gopher rule tier: one map-only JVM struct over documents
    t0 = time.time()
    textstats.gopher_quality(documents).count()
    timings["text_gopher"] = round(time.time() - t0, 3)

    total = time.time() - t_total0
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "build_docs": build_docs,
        "build_docs_per_sec": round(build_docs_per_sec, 1),
        "build_stage_walls": stage_walls,
        "query_p95_sec": round(query_p95, 4),
        "query_p95_best_sec": round(query_p95_best, 4),
        "host_loadavg_1m": round(loadavg_1m, 2),
        "host_calib_matmul_sec": calib_sec,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
