"""Oracle scoring unit tests — hand-computed Lucene-4.6 BM25/TF-IDF math
on a 3-doc corpus (SURVEY.md §5.2)."""

import math

import pandas as pd
import pytest

from xltsearch_spark.config import IndexConfig
from xltsearch_spark.functions.norms import quantized_doc_length
from xltsearch_spark.oracle.pyoracle import OracleIndex

import numpy as np


def mini_corpus():
    return pd.DataFrame({
        "repo": ["r0", "r0", "r0"],
        "path": ["a.py", "b.py", "c.py"],
        "commit": ["c1", "c2", "c3"],
        "lang": ["python", "python", "go"],
        "content": ["foo bar baz", "foo foo bar qux quux corge", "bar bar bar"],
        "title": ["Alpha", None, "Gamma"],
    })


def test_bm25_hand_computed():
    cfg = IndexConfig(scoring_model="bm25")
    idx = OracleIndex(mini_corpus(), cfg)
    N = 3
    # content tokens: d0=3, d1=6, d2=3 -> sum_ttf=12, avgdl=4
    assert idx.sum_ttf["content"] == 12
    hits = {h["doc_id"]: h["score"] for h in idx.search("foo", 10)}
    df = 2
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    for doc, tf, dl in [(0, 1, 3), (1, 2, 6)]:
        dlq = float(quantized_doc_length(np.array([dl]))[0])
        expected = idf * 2.2 * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dlq / 4.0))
        assert hits[doc] == pytest.approx(expected, rel=1e-9)
    assert 2 not in hits


def test_bm25_tf_saturation_and_ranking():
    idx = OracleIndex(mini_corpus(), IndexConfig())
    hits = idx.search("bar", 10)
    # d2: tf=3, dl=3 beats d0: tf=1, dl=3 beats d1: tf=1, dl=6
    assert [h["doc_id"] for h in hits] == [2, 0, 1]


def test_tie_break_doc_id_asc():
    corpus = pd.DataFrame({
        "repo": ["r0"] * 3, "path": ["a", "b", "c"], "commit": ["x"] * 3,
        "lang": ["py"] * 3, "content": ["same same", "same same", "same same"],
        "title": [None] * 3,
    })
    idx = OracleIndex(corpus, IndexConfig())
    hits = idx.search("same", 10)
    assert [h["doc_id"] for h in hits] == [0, 1, 2]
    assert len({round(h["score"], 9) for h in hits}) == 1


def test_tfidf_hand_computed():
    cfg = IndexConfig(scoring_model="default")
    idx = OracleIndex(mini_corpus(), cfg)
    hits = {h["doc_id"]: h["score"] for h in idx.search("foo", 10)}
    N, df = 3, 2
    idf = 1 + math.log(N / (df + 1))
    qn = 1.0 / math.sqrt(idf * idf)
    from xltsearch_spark.functions.norms import decoded_tf_idf_norm
    for doc, tf, dl in [(0, 1, 3), (1, 2, 6)]:
        nrm = float(decoded_tf_idf_norm(np.array([dl]))[0])
        expected = math.sqrt(tf) * idf * idf * qn * nrm
        assert hits[doc] == pytest.approx(expected, rel=1e-9)


def test_tfidf_coord_applies():
    cfg = IndexConfig(scoring_model="default")
    idx = OracleIndex(mini_corpus(), cfg)
    # 'foo qux': d1 matches both clauses (coord 2/2), d0 only foo (coord 1/2)
    both = {h["doc_id"]: h["score"] for h in idx.search("foo qux", 10)}
    solo = {h["doc_id"]: h["score"] for h in idx.search("foo", 10)}
    ssw_solo = idx._sum_sq_weights(
        __import__("xltsearch_spark.plans.parser", fromlist=["TermQuery"]).TermQuery("content", "foo"), 1.0)
    assert 0 in both and 1 in both
    # d0's score in the two-clause query is halved by coord (1/2) modulo queryNorm
    assert both[0] < solo[0]


def test_phrase_exact_and_slop():
    corpus = pd.DataFrame({
        "repo": ["r0"] * 3, "path": ["a", "b", "c"], "commit": ["x"] * 3,
        "lang": ["py"] * 3,
        "content": ["alpha beta", "alpha gap beta", "beta alpha"],
        "title": [None] * 3,
    })
    idx = OracleIndex(corpus, IndexConfig())
    assert [h["doc_id"] for h in idx.search('"alpha beta"', 10)] == [0]
    slop1 = [h["doc_id"] for h in idx.search('"alpha beta"~1', 10)]
    assert 0 in slop1 and 1 in slop1 and 2 not in slop1


def test_pure_negative_matches_nothing():
    idx = OracleIndex(mini_corpus(), IndexConfig())
    assert idx.search("-foo", 10) == []


def test_hashsum_invariant_matches_manifest():
    from xltsearch_spark.sources.corpus import corpus_manifest, generate_corpus
    corpus = generate_corpus(32)
    idx = OracleIndex(corpus, IndexConfig())
    man = corpus_manifest(corpus).set_index(["repo", "path"])["hashsum"]
    for _, row in idx.docs.iterrows():
        assert row["hashsum"] == man.loc[(row["repo"], row["path"])]
