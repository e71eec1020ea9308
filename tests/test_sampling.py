"""Deterministic sampling/split operators (training-pipeline extensions)."""
import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "es"][i % 3]) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string").persist()


def test_hash_split_is_deterministic_and_partitioning_invariant(spark, docs):
    a = {r["doc_id"]: r["split"]
         for r in sampling.hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in sampling.hash_split(docs.repartition(13)).collect()}
    assert a == b
    # same id always lands in the same split on a rerun
    c = {r["doc_id"]: r["split"] for r in sampling.hash_split(docs).collect()}
    assert a == c


def test_hash_split_fractions_approximate_weights(spark, docs):
    out = sampling.hash_split(docs, weights={"train": 0.8, "val": 0.1,
                                             "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] > 400          # ~480 expected of 600
    assert counts["val"] + counts["test"] > 50
    assert sum(counts.values()) == 600    # exhaustive + disjoint


def test_hash_split_salt_changes_assignment(spark, docs):
    a = {r["doc_id"]: r["split"] for r in sampling.hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in sampling.hash_split(docs, salt=7).collect()}
    assert a != b


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, weights={"a": 0.5, "b": 0.6})


def test_stratified_sample_n_quota_and_determinism(spark, docs):
    out = sampling.stratified_sample_n(docs, "lang", n=10)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in per.items()} == {"en": 10, "de": 10, "es": 10}
    # identical selection on a rerun with different partitioning
    again = sampling.stratified_sample_n(docs.repartition(7), "lang", n=10)
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in rows)


def test_stratified_fraction_is_split_consistent(spark, docs):
    # fraction sampling keeps exactly the rows whose hash < bound — the
    # SAME rows that hash_split would put in a leading 0.2 band
    frac = sampling.stratified_sample_fraction(docs, "lang", 0.2)
    split = sampling.hash_split(docs, weights={"keep": 0.2, "drop": 0.8})
    kept = {r["doc_id"] for r in split.filter(F.col("split") == "keep").collect()}
    assert {r["doc_id"] for r in frac.collect()} == kept


def test_sampling_plan_is_udf_free(spark, docs):
    plan = (sampling.hash_split(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # split is map-only, no shuffle


def test_weighted_sample_matches_python_recomputation(spark, docs):
    """A-ES winners == the k smallest -ln(u)/w recomputed in numpy with
    the identical hash-uniform; ties by id; partition-invariant."""
    import numpy as np
    wdf = docs.withColumn("w", (F.col("doc_id") % 7 + 1).cast("double"))
    got = [(r["doc_id"], r["es_key"]) for r in
           sampling.weighted_sample(wdf, 10, "w").collect()]
    ids = np.arange(600, dtype=np.int64)
    h = (ids % (1 << 31)) * 2654435761 % (1 << 31)
    u = (h + 1).astype(np.float64) / float(1 << 31)
    w = (ids % 7 + 1).astype(np.float64)
    key = np.round(-np.log(u) / w, 9)
    exp = sorted(zip(key, ids))[:10]
    assert got == [(int(i), float(k)) for k, i in exp]
    again = sampling.weighted_sample(wdf.repartition(13), 10, "w").collect()
    assert [(r["doc_id"], r["es_key"]) for r in again] == got


def test_weighted_sample_weight_bias_and_edge_cases(spark, docs):
    # a 1000x-weight doc should win across (almost) every salt
    wdf = docs.withColumn(
        "w", F.when(F.col("doc_id") == 123, 1000.0).otherwise(1.0))
    wins = sum(
        any(r["doc_id"] == 123 for r in
            sampling.weighted_sample(wdf, 10, "w", salt=s).collect())
        for s in range(10))
    assert wins >= 9
    # non-positive weights are excluded entirely
    zdf = docs.withColumn(
        "w", F.when(F.col("doc_id") < 590, 0.0).otherwise(1.0))
    rows = sampling.weighted_sample(zdf, 50, "w").collect()
    assert len(rows) == 10 and all(r["doc_id"] >= 590 for r in rows)
    with pytest.raises(ValueError):
        sampling.weighted_sample(docs.withColumn("w", F.lit(1.0)), 0, "w")
