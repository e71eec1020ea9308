"""Capture .explain('formatted') for every query path touched in round 6.

Usage: python scripts/capture_r06_plans.py <outdir> <suffix>
  e.g. python scripts/capture_r06_plans.py plans/r06 after
Writes <outdir>/<name>_<suffix>.txt. Run once from the round-start tree
(suffix 'before') and once from HEAD (suffix 'after').
"""

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)
    from pyspark.sql import functions as F
    from xltsearch_spark.config import IndexConfig
    from xltsearch_spark.operators.build import IndexBuilder
    from xltsearch_spark.operators.search import SearchEngine
    from xltsearch_spark.operators import dedup, substring as substr_ops, bpe
    from xltsearch_spark.session import get_spark
    from xltsearch_spark.sources.corpus import generate_corpus

    spark = get_spark("plans_r06", cores=8, shuffle_partitions=8)
    corpus = spark.createDataFrame(generate_corpus(5000)).repartition(8)
    corpus.persist().count()
    cfg = IndexConfig(name="bench", doc_range_size=2048, block_size=128,
                      term_buckets=8)
    b = IndexBuilder(spark, cfg)
    docs = b.docs_stage(corpus).persist()
    runs = b.runs_stage(docs).persist()
    runs.count()
    stats = b.stats_stage(docs, runs)
    dic = b.dictionary_stage(runs).persist()
    dic.count()
    post = b.postings_stage(runs, stats).persist()
    post.count()
    eng = SearchEngine(spark, post, docs, dic, stats, cfg)

    def emit(name, df, mode="formatted"):
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df, mode))

    # single-term (WAND engaged): agg-free top-k over the coalesced scan
    eng.wand_min_df = 1
    wand, _ = eng._wand_topk("common_token", 100)
    emit("q_term_wand", wand)
    eng.wand_min_df = 200_000
    # single-term general path
    emit("q_term", eng.search_scores("common_token", 100))
    # flat boolean (q_or shape)
    emit("q_or", eng.search_scores("alpha OR beta OR graded", 100))
    # phrase (AQE-coalescible doc_id repartition)
    emit("q_phrase", eng.search_scores('"alpha beta"', 100))
    # batched multi-query single-pass
    batch = {"b0": "common_token", "b1": "alpha OR beta",
             "b2": "common_token AND graded", "b3": '"alpha beta"'}
    emit("search_many", eng.search_many(batch, 100, materialize=False),
         mode="simple")
    # spans: conditional-aggregate shape
    emit("q_span_near", eng.search_span_near("alpha", "beta", 3, limit=100))
    emit("q_span_not", eng.search_span_not("alpha", "beta", 2, 2, limit=100))
    # explain(): single decode
    emit("q_explain", eng.explain("alpha OR beta", limit=10))
    # dedup paths
    documents = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    emit("dedup_ngram_jaccard",
         dedup.ngram_jaccard_pairs(documents, n=5, threshold=0.8,
                                   max_shingle_df=100))
    sigs = dedup.minhash_signatures(documents, num_hashes=16, shingle_n=3)
    emit("dedup_minhash_pairs",
         dedup.minhash_lsh_pairs(sigs, bands=4, rows_per_band=4,
                                 threshold=0.5))
    emit("dedup_substring",
         substr_ops.substring_dedup_stats(documents, min_len=20, hashed=True))
    # build: docs stage (JVM id assignment)
    emit("build_docs_stage", b.docs_stage(corpus))
    # BPE encode at production merge counts (bounded plan)
    merges = [(i + 1, f"s{i}", f"t{i}", 1) for i in range(200)]
    emit("bpe_encode_200merges",
         bpe.apply_merges(documents, merges, text_col="text"))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
