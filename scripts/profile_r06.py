"""Round-6 measurement harness (guide §1): per-op wall + Spark job/stage/task
counts, isolated from the bench's frozen methodology. Does NOT touch bench.py.

Usage: python scripts/profile_r06.py [section ...]
Sections: build queries batch r5ops dedup pipeline
Prints one JSON line per measurement plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sections = set(sys.argv[1:]) or {"build", "queries", "batch", "r5ops",
                                     "dedup", "pipeline"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F
    from xltsearch_spark.config import IndexConfig
    from xltsearch_spark.operators import dedup, similarity, textstats
    from xltsearch_spark.operators.build import IndexBuilder
    from xltsearch_spark.operators.search import SearchEngine
    from xltsearch_spark.session import get_spark
    from xltsearch_spark.sources.corpus import generate_corpus
    import __spark_entry__ as entry_mod

    spark = get_spark("profile_r06", cores=cores, shuffle_partitions=cores)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def measure(name, fn, n=3):
        """min-of-n wall + job/stage counts of the LAST run."""
        sc.setJobDescription(f"r06:{name}")
        fn()  # warm
        walls = []
        for _ in range(n):
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
            j1 = tracker.getJobIdsForGroup(None)
        new_jobs = sorted(set(j1) - set(j0))
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        rec = {"op": name, "wall_min": round(min(walls), 3),
               "walls": [round(w, 3) for w in walls],
               "jobs": len(new_jobs), "stages": n_stages, "tasks": n_tasks}
        print(json.dumps(rec), flush=True)
        sc.setJobDescription(None)
        return rec

    # ---- fixture index (same shape as bench.py) ----
    build_docs = int(os.environ.get("BENCH_BUILD_DOCS", "100000"))
    corpus_pd = generate_corpus(build_docs)
    cfg = IndexConfig(name="bench", doc_range_size=2048, block_size=128,
                      term_buckets=max(cores, 16))
    corpus = spark.createDataFrame(corpus_pd).repartition(cores)
    corpus.persist().count()
    builder = IndexBuilder(spark, cfg)

    if "build" in sections:
        # one-shot per stage (stages feed each other; persist like bench)
        sc.setJobDescription("r06:build")
        t0 = time.time()
        docs = builder.docs_stage(corpus).persist()
        runs = builder.runs_stage(docs).persist()
        runs.count()
        t1 = time.time()
        stats = builder.stats_stage(docs, runs)
        t2 = time.time()
        dictionary = builder.dictionary_stage(runs).persist()
        dictionary.count()
        t3 = time.time()
        postings = builder.postings_stage(runs, stats).persist()
        postings.count()
        t4 = time.time()
        print(json.dumps({"op": "build_stages",
                          "docs_runs": round(t1 - t0, 3),
                          "stats": round(t2 - t1, 3),
                          "dictionary": round(t3 - t2, 3),
                          "postings": round(t4 - t3, 3),
                          "total": round(t4 - t0, 3)}), flush=True)
    else:
        docs = builder.docs_stage(corpus).persist()
        runs = builder.runs_stage(docs).persist()
        runs.count()
        stats = builder.stats_stage(docs, runs)
        dictionary = builder.dictionary_stage(runs).persist()
        dictionary.count()
        postings = builder.postings_stage(runs, stats).persist()
        postings.count()

    eng = SearchEngine(spark, postings, docs, dictionary, stats, cfg)

    if "queries" in sections:
        doc_engine = entry_mod._get_engine(spark, sf_dir)
        eng.wand_min_df = 1
        measure("q_term_wand", lambda: eng.search_scores("common_token", 100).collect())
        eng.wand_min_df = 200_000
        q_specs = {
            "q_term": (eng, "common_token"),
            "q_and": (eng, "common_token AND graded"),
            "q_and_rare": (eng, "needle_17 AND common_token"),
            "q_or": (eng, "alpha OR beta OR graded"),
            "q_phrase": (eng, '"alpha beta"'),
            "q_phrase_rare": (eng, '"needle_17 common_token"'),
            "q_prefix": (eng, "needle_1*"),
            "q_fuzzy": (eng, "gradd~1"),
            "q_doc_term": (doc_engine, "merge"),
            "q_doc_bool": (doc_engine, "merge AND vector NOT column"),
        }
        for name, (e, qs) in q_specs.items():
            measure(name, lambda e=e, qs=qs: e.search_scores(qs, 100).collect())

    if "batch" in sections:
        batch = {f"b{i}": q for i, q in enumerate(
            ["common_token", "graded", "alpha OR beta", "needle_42",
             "common_token AND graded", "import OR merge", "def AND class",
             "shard", "segment OR index", '"alpha beta"', "writer", "reader",
             "flush OR commit", "partition", "executor AND driver", "broadcast"])}
        measure("batch_16_queries", lambda: eng.search_many(batch, 100).count(), n=2)

    if "r5ops" in sections:
        r5_ops = {
            "q_msm": lambda: eng.search_scores("alpha OR beta OR graded", 100, msm=2).collect(),
            "q_facets": lambda: eng.facets("common_token", ["lang", "repo"]).collect(),
            "q_explain": lambda: eng.explain("alpha OR beta", limit=10).collect(),
            "q_span_near": lambda: eng.search_span_near("alpha", "beta", 3, limit=100).collect(),
            "q_span_not": lambda: eng.search_span_not("alpha", "beta", 2, 2, limit=100).collect(),
            "q_collapse": lambda: eng.search_collapsed("common_token", "lang", 2, 100).collect(),
            "q_phrase_prefix": lambda: eng.search_phrase_prefix("alpha bet", limit=100).collect(),
            "q_search_after": lambda: eng.search_after("alpha OR beta", 0.5, 3, limit=100).collect(),
        }
        for name, fn in r5_ops.items():
            measure(name, fn)

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    documents.count()

    if "dedup" in sections:
        def mh():
            sigs = dedup.minhash_signatures(documents, num_hashes=64, shingle_n=3)
            dedup.minhash_lsh_pairs(sigs, bands=16, rows_per_band=4, threshold=0.5).count()
        measure("dedup_minhash_lsh", mh, n=2)

        def sh():
            fps = dedup.simhash_fingerprints(documents)
            dedup.simhash_near_pairs(fps, max_hamming=3).count()
        measure("dedup_simhash", sh, n=2)
        measure("dedup_ngram_jaccard",
                lambda: dedup.ngram_jaccard_pairs(documents, n=5, threshold=0.8,
                                                  max_shingle_df=100).count(), n=2)
        from xltsearch_spark.operators import substring as substr_ops
        measure("dedup_substring",
                lambda: substr_ops.substring_dedup_stats(documents, min_len=20,
                                                         hashed=True).count(), n=2)

    if "pipeline" in sections:
        embeddings = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                      .select("vec_id", F.col("embedding").cast("array<double>")
                              .alias("embedding")).persist())
        embeddings.count()
        measure("text_stats", lambda: (textstats.quality_scores(documents).count(),
                                       textstats.language_id(documents).count()), n=2)
        from xltsearch_spark.operators import packing
        ntok = F.size(F.split(F.col("text"), r"\s+")).cast("long")
        pdocs = documents.select("doc_id", "source", ntok.alias("n_tokens"))
        measure("pack_sequences", lambda: packing.pack_chunked(pdocs, budget=2048).count(), n=2)
        from xltsearch_spark.operators.curation import curate
        measure("pipeline_curate",
                lambda: curate(documents, documents.filter(F.col("doc_id") % 50 == 0)).count(), n=2)
        from xltsearch_spark.operators import parse as parse_ops
        measure("parse_extract",
                lambda: parse_ops.extract_text(
                    documents.select("doc_id", F.col("text").alias("content"))).count(), n=2)
        from xltsearch_spark.operators import events as ev_ops
        events_df = spark.read.parquet(f"{sf_dir}/events.parquet")
        measure("events_rollup_sessionize",
                lambda: (ev_ops.windowed_rollup(events_df).count(),
                         ev_ops.sessionize(events_df, gap_minutes=30).count()), n=2)
        qvecs = np.stack([r["embedding"] for r in embeddings.limit(8).collect()])
        measure("ann_batch_topk",
                lambda: similarity.cosine_topk_batch(embeddings, qvecs, k=10).count(), n=2)
        measure("dedup_semantic",
                lambda: similarity.semantic_dedup(embeddings, threshold=0.35,
                                                  n_centroids=16, n_iter=1).count(), n=2)
        measure("text_gopher", lambda: textstats.gopher_quality(documents).count(), n=2)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
