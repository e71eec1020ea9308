"""operators/evaluate.py: nDCG/MRR/recall against hand computations."""

import math

import pytest

from xltsearch_spark.operators.evaluate import retrieval_metrics


@pytest.fixture(scope="module")
def frames(spark):
    # q1: perfect ranking; q2: relevant doc buried at rank 3, one missed;
    # q3: nothing relevant retrieved; q4: in qrels only (dropped query)
    runs = [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3),
            ("q2", 9, 1), ("q2", 8, 2), ("q2", 5, 3),
            ("q3", 7, 1), ("q3", 6, 2)]
    qrels = [("q1", 1, 3), ("q1", 2, 1),
             ("q2", 5, 2), ("q2", 4, 1),
             ("q3", 99, 1),
             ("q4", 1, 2)]
    return (spark.createDataFrame(runs, "query_id string, doc_id long, rank long"),
            spark.createDataFrame(qrels, "query_id string, doc_id long, rel long"))


def test_metrics_match_hand_values(spark, frames):
    runs, qrels = frames
    got = {r["query_id"]: r for r in
           retrieval_metrics(runs, qrels, k=3).collect()}
    # q1: DCG = 7/log2(2) + 1/log2(3) ; IDCG identical -> ndcg 1
    assert got["q1"]["ndcg_at_k"] == pytest.approx(1.0)
    assert got["q1"]["mrr"] == pytest.approx(1.0)
    assert got["q1"]["recall_at_k"] == pytest.approx(1.0)
    # q2: only doc 5 (rel 2) retrieved at rank 3
    dcg = 3.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert got["q2"]["ndcg_at_k"] == pytest.approx(dcg / idcg)
    assert got["q2"]["mrr"] == pytest.approx(1.0 / 3)
    assert got["q2"]["recall_at_k"] == pytest.approx(0.5)
    # q3: nothing relevant retrieved
    assert (got["q3"]["ndcg_at_k"], got["q3"]["mrr"],
            got["q3"]["recall_at_k"]) == (0.0, 0.0, 0.0)
    # q4: absent from the run entirely -> zero row, not a silent drop
    assert got["q4"]["ndcg_at_k"] == 0.0 and got["q4"]["n_rel"] == 1


def test_rank_cut_and_validation(spark, frames):
    runs, qrels = frames
    # k=1: q2's only relevant hit (rank 3) falls outside the cut
    got = {r["query_id"]: r for r in
           retrieval_metrics(runs, qrels, k=1).collect()}
    assert got["q2"]["ndcg_at_k"] == 0.0 and got["q2"]["recall_at_k"] == 0.0
    assert got["q1"]["ndcg_at_k"] == pytest.approx(1.0)  # rel-3 doc at rank 1
    with pytest.raises(ValueError):
        retrieval_metrics(runs, qrels, k=0)
