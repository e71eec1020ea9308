"""DSIR importance-resampling weights (training-pipeline extensions)."""
import math
import re

import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators import selection


@pytest.fixture(scope="module")
def corpora(spark):
    # raw source: half "code-flavored", half "prose-flavored" docs;
    # target: prose only -> prose docs must get the higher DSIR weight
    src_rows = []
    for i in range(60):
        if i % 2 == 0:
            src_rows.append((i, "the quick brown fox jumps over the lazy dog "
                                "and the small cat sleeps"))
        else:
            src_rows.append((i, "int main void return zero exit code status "
                                "buffer pointer malloc free"))
    src_rows.append((60, ""))          # zero-gram doc
    src_rows.append((61, "the quick brown fox"))
    tgt_rows = [(1000 + j, "the quick brown fox likes the lazy dog and "
                           "the small cat") for j in range(20)]
    src = spark.createDataFrame(src_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    return src.persist(), tgt.persist()


def _py_tokens(text):
    return [t for t in re.split(r"[^\w']+", text.lower()) if t]


def _py_grams(text):
    toks = _py_tokens(text)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_dsir(src_rows, tgt_rows, vocab_size, alpha=1.0):
    """Sequential reference of the vocab-mode math."""
    from collections import Counter
    cs, ct = Counter(), Counter()
    for _, t in src_rows:
        cs.update(_py_grams(t))
    for _, t in tgt_rows:
        ct.update(_py_grams(t))
    total_s, total_t = sum(cs.values()), sum(ct.values())
    denom_s = total_s + alpha * (vocab_size + 1)
    denom_t = total_t + alpha * (vocab_size + 1)
    vocab = sorted(cs.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    dlogp = {g: math.log((ct.get(g, 0) + alpha) / denom_t)
                - math.log((c + alpha) / denom_s) for g, c in vocab}
    oov = math.log(alpha / denom_t) - math.log(alpha / denom_s)
    out = {}
    for i, t in src_rows:
        grams = _py_grams(t)
        out[i] = (len(grams),
                  sum(dlogp.get(g, oov) for g in grams) if grams else None)
    return out


def test_vocab_weights_match_sequential_reference(spark, corpora):
    src, tgt = corpora
    got = {r["doc_id"]: (r["n_grams"], r["log_w"])
           for r in selection.dsir_weights(src, tgt, vocab_size=64).collect()}
    want = _py_dsir([(r["doc_id"], r["text"]) for r in src.collect()],
                    [(r["doc_id"], r["text"]) for r in tgt.collect()], 64)
    assert set(got) == set(want)
    for k, (n, w) in want.items():
        assert got[k][0] == n
        if w is None:
            assert got[k][1] is None
        else:
            assert got[k][1] == pytest.approx(w, rel=1e-9)


def test_target_like_docs_outweigh_off_domain_docs(spark, corpora):
    src, tgt = corpora
    w = {r["doc_id"]: r["log_w"]
         for r in selection.dsir_weights(src, tgt, vocab_size=256).collect()}
    prose = [w[i] for i in range(0, 60, 2)]
    code = [w[i] for i in range(1, 60, 2)]
    assert min(prose) > max(code)


def test_hashed_mode_is_deterministic_and_ranks_like_vocab(spark, corpora):
    src, tgt = corpora
    a = selection.dsir_weights(src, tgt, features="hashed", n_buckets=512)
    b = selection.dsir_weights(src.repartition(7), tgt.repartition(3),
                               features="hashed", n_buckets=512)
    ra = {r["doc_id"]: r["log_w"] for r in a.collect()}
    rb = {r["doc_id"]: r["log_w"] for r in b.collect()}
    for k in ra:
        if ra[k] is None:
            assert rb[k] is None
        else:
            assert ra[k] == pytest.approx(rb[k], rel=1e-9)
    # the hashed space preserves the domain separation
    prose = [ra[i] for i in range(0, 60, 2)]
    code = [ra[i] for i in range(1, 60, 2)]
    assert min(prose) > max(code)


def test_bad_features_mode_rejected(spark, corpora):
    src, tgt = corpora
    with pytest.raises(ValueError):
        selection.dsir_weights(src, tgt, features="tfidf")


def test_select_flags_top_fraction_and_validates(spark, corpora):
    src, tgt = corpora
    w = selection.dsir_weights(src, tgt, vocab_size=256)
    sel = selection.dsir_select(w, 0.5)
    rows = sel.collect()
    kept = [r["doc_id"] for r in rows if r["selected"] == 1]
    n_scored = sum(1 for r in rows if r["log_w"] is not None)
    # >= because ties at the threshold are kept (30 identical prose docs)
    assert len(kept) >= n_scored // 2
    # every kept doc outweighs every dropped scored doc
    wmap = {r["doc_id"]: r["log_w"] for r in rows if r["log_w"] is not None}
    dropped = [wmap[r["doc_id"]] for r in rows
               if r["selected"] == 0 and r["log_w"] is not None]
    if dropped:
        assert min(wmap[k] for k in kept) >= max(dropped)
    # NULL-weight doc never selected
    assert next(r for r in rows if r["doc_id"] == 60)["selected"] == 0
    with pytest.raises(ValueError):
        selection.dsir_select(w, 0.0)


def test_weight_plan_is_udf_free(spark, corpora):
    src, tgt = corpora
    plan = selection.dsir_weights(
        src, tgt, vocab_size=64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
