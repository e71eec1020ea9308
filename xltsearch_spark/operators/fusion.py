"""Hybrid retrieval fusion: combine lexical (BM25) and vector (cosine)
top-k lists into one ranking with Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher 2009, SIGIR): score(d) = sum over input
rankings r of 1 / (k + rank_r(d)), k = 60 by default. Rank-only fusion is
robust to incomparable score scales (BM25 vs cosine), which is why it is
the standard first fusion in RAG retrieval stacks.

Scale shape: each input ranking is a top-k list (TakeOrderedAndProject,
distributed heap), so fusion unions a few k-row frames, one tiny groupBy,
and a TakeOrdered — the fusion stage is O(lists x k) rows regardless of
corpus size. The expensive legs (BM25 scan, ANN probe) keep their own
scale paths (WAND pruning / IVF-LSH buckets).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

RRF_K = 60  # the paper's constant; dampens the head without zeroing the tail


def topk_ranked(df: DataFrame, score_col: str, id_col: str,
                k: int) -> DataFrame:
    """(id, rank) for the top ``k`` rows by (score desc, id asc).

    The cut is orderBy().limit(k) — Spark's TakeOrderedAndProject
    distributed heap, never a full sort — and ONLY the k survivors flow
    through the row_number window (a global window is safe at k rows;
    running it before the cut would serialize the corpus)."""
    cut = df.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (cut.withColumn("rank", F.row_number().over(w))
            .select(F.col(id_col), "rank"))


def rrf_fuse(rankings: list[DataFrame], k: int = RRF_K, id_col: str = "doc_id",
             topk: int | None = None) -> DataFrame:
    """Fuse (id, rank) lists: (id, rrf_score, n_lists), rrf desc / id asc.

    ``n_lists`` (how many input rankings surfaced the doc) is kept because
    downstream filters often require agreement >= 2."""
    u = reduce(lambda a, b: a.unionByName(b),
               [r.select(F.col(id_col), F.col("rank")) for r in rankings])
    out = (u.groupBy(id_col)
           .agg(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias("rrf_score"),
                F.count("*").alias("n_lists"))
           .orderBy(F.desc("rrf_score"), F.asc(id_col)))
    return out.limit(topk) if topk is not None else out
