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


def mmr_diversify(candidates: DataFrame, k: int = 4, lambda_: float = 0.7,
                  query_col: str = "query_id", id_col: str = "doc_id",
                  rel_col: str = "rel", vec_col: str = "embedding",
                  round_digits: int = 6) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): greedily
    re-rank a candidate list, trading relevance against redundancy —
    pick argmax of ``lambda*rel(d) - (1-lambda)*max_sim(d, selected)``
    (the first pick is plain argmax rel; sim = cosine between candidate
    embeddings).

    Determinism contract: rel and the pairwise sims round to
    ``round_digits`` BEFORE each greedy argmax, ties break to the lowest
    id — so the selection is partition-invariant and SQL-replayable.

    Scale shape: candidates arrive per query from an upstream top-k cut
    (k-bounded lists), so each group's greedy loop touches an N x N sim
    matrix with N <= the retrieval k — never corpus-sized. One shuffle
    on query_col; thousands of queries diversify in parallel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StructField, StructType)
    schema = StructType([StructField(query_col, LongType()),
                         StructField(id_col, LongType()),
                         StructField("mmr_rank", IntegerType()),
                         StructField("mmr_score", DoubleType())])

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        rel = np.round(pdf[rel_col].to_numpy(dtype=np.float64), round_digits)
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        unit = mat / nrm[:, None]
        sims = np.round(unit @ unit.T, round_digits)
        n = len(ids)
        selected: list[int] = []
        scores: list[float] = []
        remaining = np.ones(n, dtype=bool)
        for step in range(min(k, n)):
            if step == 0:
                obj = rel.astype(np.float64)
            else:
                ms = sims[:, selected].max(axis=1)
                obj = lambda_ * rel - (1.0 - lambda_) * ms
            # argmax over remaining; ties fall to the FIRST (lowest id —
            # rows are id-sorted), matching the oracle's ORDER BY ... , id
            best = int(np.argmax(np.where(remaining, obj, -np.inf)))
            selected.append(best)
            remaining[best] = False
            scores.append(round(float(obj[best]), round_digits))
        return pd.DataFrame({
            query_col: pdf[query_col].to_numpy(dtype=np.int64)[selected],
            id_col: ids[selected],
            "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            "mmr_score": np.array(scores, dtype=np.float64)})

    return (candidates.select(query_col, id_col, rel_col, vec_col)
            .groupBy(query_col).applyInPandas(per_query, schema))
