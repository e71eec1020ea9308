"""Dev smoke: build index from fixture corpus, compare engine vs oracle."""
import sys
import time

import pandas as pd

from xltsearch_spark.config import IndexConfig
from xltsearch_spark.operators.build import IndexBuilder
from xltsearch_spark.operators.search import SearchEngine
from xltsearch_spark.oracle.pyoracle import OracleIndex
from xltsearch_spark.session import get_spark
from xltsearch_spark.sources.corpus import generate_corpus

QUERIES = [
    "needle_17", "graded", "common_token AND graded", "alpha OR beta",
    "graded NOT alpha", "+graded -beta", '"alpha beta"', '"alpha beta"~1',
    "title:Module", "lang:python AND snake_case_name", "graded^2 OR alpha",
    "need*", "gradd~1", "[needle_10 TO needle_20]",
    "(alpha OR beta) AND common_token", "CamelCaseIdentifier", "*:*",
    '"alpha the beta"',
]


def main(n_docs=200, model="bm25", analyzer="standard"):
    cfg = IndexConfig(scoring_model=model, analyzer=analyzer, doc_range_size=64,
                      block_size=16, term_buckets=8)
    corpus_pd = generate_corpus(n_docs)
    spark = get_spark("smoke", cores=8)
    t0 = time.time()
    corpus = spark.createDataFrame(corpus_pd)
    builder = IndexBuilder(spark, cfg)
    docs = builder.docs_stage(corpus).persist()
    runs = builder.runs_stage(docs).persist()
    stats = builder.stats_stage(docs, runs)
    dictionary = builder.dictionary_stage(runs).persist()
    postings = builder.postings_stage(runs, stats).persist()
    postings.count()
    print(f"build: {time.time()-t0:.1f}s  n_docs={stats.n_docs} avgdl={stats.avgdl}")
    engine = SearchEngine(spark, postings, docs, dictionary, stats, cfg)
    oracle = OracleIndex(corpus_pd, cfg)
    n_bad = 0
    for q in QUERIES:
        exp = oracle.search(q, 100)
        got = engine.search_scores(q, 100).collect()
        got_pairs = [(int(r["doc_id"]), float(r["score"])) for r in got]
        exp_pairs = [(x["doc_id"], x["score"]) for x in exp]
        ok = len(got_pairs) == len(exp_pairs) and all(
            g[0] == e[0] and abs(g[1] - e[1]) < 1e-6 * max(1, abs(e[1]))
            for g, e in zip(got_pairs, exp_pairs))
        status = "OK " if ok else "FAIL"
        if not ok:
            n_bad += 1
            print(f"{status} {q!r}\n  exp {exp_pairs[:5]}\n  got {got_pairs[:5]}")
        else:
            print(f"{status} {q!r} ({len(exp_pairs)} hits)")
    print("ALL OK" if n_bad == 0 else f"{n_bad} FAILURES")
    spark.stop()
    return n_bad


if __name__ == "__main__":
    sys.exit(main(*([int(sys.argv[1])] if len(sys.argv) > 1 else []),
                  **(dict(model=sys.argv[2]) if len(sys.argv) > 2 else {})))
