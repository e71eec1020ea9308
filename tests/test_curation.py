"""Composed curation pipeline (operators/curation.py): rule precedence,
per-rule behavior, split determinism, report rollup."""

import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators.curation import curate, curation_report
from xltsearch_spark.operators.sampling import hash_split
from xltsearch_spark.operators.textstats import quality_scores

GOOD_EN = ("the cat and the dog is in the house with a friend "
           "it is fine for all of them that day")
GOOD_EN2 = ("the bird and the fish is of the sea with a wave "
            "it is calm for all of them that night")
GERMAN = "der hund und die katze ist nicht ein tier mit namen auf zu"
JUNK = "xx xx xx xx xx xx !!!!!! ###### $$$$$$ %%%%%% ******"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_rules_and_precedence(spark):
    # 0 kept, 1 too_short, 2 low_quality, 3 wrong_lang, 4 dup of 0,
    # 5 contaminated (shares a 5-gram with the benchmark)
    contaminated = "unique prefix here " + " ".join(GOOD_EN.split()[:5]) + \
        " with plenty of the and is in extra trailing words"
    docs = _docs(spark, [GOOD_EN, "one two three", JUNK, GERMAN, GOOD_EN,
                         contaminated])
    bench = _docs(spark, [GOOD_EN2, GOOD_EN]).withColumn(
        "doc_id", F.col("doc_id") + 100)
    # sanity: the junk doc really is below the quality gate
    qj = quality_scores(docs.filter("doc_id = 2")).collect()[0]
    assert qj.quality < 0.25

    out = {r.doc_id: r for r in curate(docs, bench).collect()}
    assert out[1].reason == "too_short"
    assert out[2].reason == "low_quality"
    assert out[3].reason == "wrong_lang"
    assert out[4].reason == "exact_dup"      # doc 0 is the keeper
    assert out[5].reason == "contaminated"
    # doc 0 is ALSO in the benchmark (contaminated) — but exact-dup keeps
    # it and contamination fires only if it reaches rule 5: doc 0 shares
    # 5-grams with bench, so it reports contaminated, not kept
    assert out[0].reason == "contaminated"
    assert all(r.keep == 0 and r.split is None
               for r in out.values() if r.reason != "kept")


def test_kept_docs_get_hash_split_labels(spark):
    docs = _docs(spark, [GOOD_EN, GOOD_EN2])
    out = {r.doc_id: r for r in curate(docs, None).collect()}
    expected = {r.doc_id: r.split
                for r in hash_split(docs, "doc_id").collect()}
    for i in (0, 1):
        assert out[i].reason == "kept" and out[i].keep == 1
        assert out[i].split == expected[i]


def test_no_benchmark_skips_contamination(spark):
    # identical to the contaminated scenario but benchmark=None: the doc
    # that WOULD be contaminated is kept
    docs = _docs(spark, [GOOD_EN])
    out = curate(docs, None).collect()[0]
    assert out.reason == "kept" and out.split is not None


def test_exact_dup_keeps_min_doc_id_only(spark):
    docs = _docs(spark, [GOOD_EN, GOOD_EN, GOOD_EN])
    out = {r.doc_id: r.reason for r in curate(docs, None).collect()}
    assert out == {0: "kept", 1: "exact_dup", 2: "exact_dup"}


def test_report_rollup(spark):
    docs = _docs(spark, [GOOD_EN, GOOD_EN2, "one two", GERMAN])
    rep = {(r.reason, r.split): r.n_docs
           for r in curation_report(curate(docs, None)).collect()}
    assert rep[("too_short", None)] == 1
    assert rep[("wrong_lang", None)] == 1
    assert sum(n for (reason, _), n in rep.items() if reason == "kept") == 2


def test_custom_split_weights_and_thresholds(spark):
    docs = _docs(spark, [GOOD_EN, GOOD_EN2])
    out = curate(docs, None, split_weights={"a": 0.5, "b": 0.5}).collect()
    assert {r.split for r in out} <= {"a", "b"}
    # raising min_quality above any real score drops everything
    out2 = curate(docs, None, min_quality=1.01).collect()
    assert all(r.reason == "low_quality" for r in out2)


def test_null_text_is_gated_not_kept(spark):
    """NULL text must never ship keep=1: every quality/lang field is NULL,
    so without the explicit leading gate the CASE falls through to 'kept'
    (ADVICE r4). Null-text docs also all share a NULL content_sha dedup
    group — the gate outranks dedup, so each reports too_short."""
    docs = spark.createDataFrame(
        [(0, GOOD_EN), (1, None), (2, None)], "doc_id long, text string")
    out = {r.doc_id: r for r in curate(docs, None).collect()}
    assert out[0].reason == "kept"
    for i in (1, 2):
        assert out[i].reason == "too_short"
        assert out[i].keep == 0 and out[i].split is None
