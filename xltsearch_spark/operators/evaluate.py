"""Retrieval-quality evaluation: nDCG@k, MRR, recall@k per query
(Järvelin & Kekäläinen 2002 for DCG; standard TREC-style definitions).
The missing piece of a retrieval stack (engine -> fusion -> diversify ->
EVALUATE): production search and RAG pipelines grade every ranker
change on exactly these metrics over a labeled query set.

Definitions (graded relevance ``rel`` >= 0, ranks 1-based):

* ``DCG@k  = sum_{i<=k} (2^rel_i - 1) / log2(i + 1)`` over the run
* ``IDCG@k``: the same sum over the query's relevant docs sorted by
  (rel desc, doc_id asc), truncated at k; ``nDCG = DCG/IDCG`` (0 when
  the query has no relevant docs)
* ``MRR   = 1 / rank of the first rel>0 doc in the run`` (0 if none)
* ``recall@k = |rel>0 docs retrieved in the top k| / |rel>0 docs|``

Scale shape: ONE equi-join of the run against the qrels on
(query_id, doc_id) + two per-query aggregates; IDCG is a row_number
window over the qrels partitioned by query (qrels are the small side —
a labeled eval set, thousands of rows, never corpus-sized). No Python,
no collect; metrics for a million-query eval set shard by query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def retrieval_metrics(runs: DataFrame, qrels: DataFrame,
                      k: int = 10) -> DataFrame:
    """(query_id, ndcg_at_k, mrr, recall_at_k, n_rel) per query.

    ``runs``: (query_id, doc_id, rank) with rank 1-based and unique per
    query — the system output. Rows with rank > k are ignored.
    ``qrels``: (query_id, doc_id, rel) graded labels; rel <= 0 rows are
    treated as judged-irrelevant. Queries present in qrels but absent
    from the run still get a row (all-zero metrics) — silent query drops
    inflate averages."""
    if k < 1:
        raise ValueError("k must be >= 1")
    run_k = runs.filter(F.col("rank") <= k)
    j = (run_k.join(qrels, ["query_id", "doc_id"], "left")
         .withColumn("rel", F.greatest(F.coalesce(F.col("rel"), F.lit(0)),
                                       F.lit(0))))
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) \
        / F.log2(F.col("rank") + F.lit(1.0))
    per_run = (j.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum((F.col("rel") > 0).cast("int")).alias("hit_rel")))
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    rel_only = qrels.filter(F.col("rel") > 0)
    ideal = (rel_only.withColumn("_rn", F.row_number().over(w))
             .groupBy("query_id").agg(
                 F.sum(F.when(F.col("_rn") <= k,
                              (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
                              / F.log2(F.col("_rn") + F.lit(1.0))))
                 .alias("idcg"),
                 F.count("*").alias("n_rel")))
    out = ideal.join(per_run, "query_id", "left")
    return out.select(
        "query_id",
        F.when(F.col("idcg") > 0,
               F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"))
        .otherwise(F.lit(0.0)).alias("ndcg_at_k"),
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
        (F.coalesce(F.col("hit_rel"), F.lit(0)).cast("double")
         / F.col("n_rel").cast("double")).alias("recall_at_k"),
        F.col("n_rel").cast("long").alias("n_rel")).orderBy("query_id")
