"""Multi-valued metadata field indexing (reference: Config.java:112-144 maps
29 Tika metadata fields; IndexTask.java:74-78 adds one analyzed field
instance PER VALUE). Here: corpus column `meta: map<string, array<string>>`
-> searchable fields `meta.<name>` with positionIncrementGap between
instances and dl = total kept tokens across instances."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, MapType, StringType, StructField,
                               StructType)

from xltsearch_spark.config import IndexConfig
from xltsearch_spark.operators.build import IndexBuilder
from xltsearch_spark.operators.search import SearchEngine

SCHEMA = StructType([
    StructField("repo", StringType()), StructField("path", StringType()),
    StructField("commit", StringType()), StructField("lang", StringType()),
    StructField("content", StringType()), StructField("title", StringType()),
    StructField("meta", MapType(StringType(), ArrayType(StringType()))),
])

ROWS = [
    ("r", "a", "c", "en", "spark engine doc", None,
     {"author": ["Ada Lovelace", "Charles Babbage"], "subject": ["analytical engines"]}),
    ("r", "b", "c", "en", "other content here", None,
     {"author": ["Grace Hopper"]}),
    ("r", "c", "c", "en", "no metadata at all", None, {}),
    ("r", "d", "c", "en", "null metadata", None, None),
]


def _engine(spark, cfg):
    builder = IndexBuilder(spark, cfg)
    corpus = spark.createDataFrame(ROWS, SCHEMA)
    docs = builder.docs_stage(corpus)
    runs = builder.runs_stage(docs).persist()
    stats = builder.stats_stage(docs, runs)
    dictionary = builder.dictionary_stage(runs)
    postings = builder.postings_stage(runs, stats)
    return SearchEngine(spark, postings, docs, dictionary, stats, cfg), stats


CFG = IndexConfig(doc_range_size=16, block_size=8, term_buckets=8,
                  quantize_norms=False)


@pytest.fixture(scope="module")
def meta_engine(spark):
    return _engine(spark, CFG)


def test_meta_field_searchable_per_key(meta_engine):
    eng, _ = meta_engine
    hits = {r["path"] for r in eng.search("meta.author:ada", 10).collect()}
    assert hits == {"a"}
    hits = {r["path"] for r in eng.search("meta.author:grace", 10).collect()}
    assert hits == {"b"}
    # key isolation: subject terms are not in author
    assert eng.search_scores("meta.author:analytical", 10).count() == 0
    assert {r["path"] for r in eng.search("meta.subject:analytical", 10).collect()} == {"a"}


def test_meta_multi_instance_both_searchable(meta_engine):
    eng, _ = meta_engine
    # both values of the multi-valued author field hit the same doc
    for term in ("lovelace", "babbage"):
        assert {r["path"] for r in eng.search(f"meta.author:{term}", 10).collect()} == {"a"}


def test_meta_dl_sums_instances(meta_engine):
    _, stats = meta_engine
    # doc a: author instances 2+2 kept tokens, doc b: 2 -> ttf 6 over 4 docs
    assert stats.sum_ttf["meta.author"] == 6
    assert stats.avgdl["meta.author"] == pytest.approx(6 / 4)


def test_meta_phrase_within_instance(meta_engine):
    eng, _ = meta_engine
    assert {r["path"] for r in eng.search('meta.author:"ada lovelace"', 10).collect()} == {"a"}


def test_meta_gap_blocks_cross_instance_phrase(spark):
    # gap 0 (vanilla Analyzer): positions continue -> the boundary bigram
    # "lovelace charles" matches as a phrase; a 100-position gap blocks it
    eng0, _ = _engine(spark, CFG)
    assert eng0.search_scores('meta.author:"lovelace charles"', 10).count() == 1
    from dataclasses import replace
    eng100, _ = _engine(spark, replace(CFG, position_increment_gap=100))
    assert eng100.search_scores('meta.author:"lovelace charles"', 10).count() == 0
    # within-instance phrases unaffected by the gap
    assert eng100.search_scores('meta.author:"charles babbage"', 10).count() == 1


def test_meta_bm25_score_exact(meta_engine):
    """Hand-computed BM25 for meta.author:grace — N=4 (all docs), df=1,
    tf=1, dl=2 (kept tokens of the one instance), avgdl=6/4."""
    eng, stats = meta_engine
    rows = eng.search_scores("meta.author:grace", 10).collect()
    assert len(rows) == 1
    idf = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    expected = idf * 2.2 * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 1.5))
    assert rows[0]["score"] == pytest.approx(expected, rel=1e-9)


def test_meta_stored_in_results(meta_engine):
    eng, _ = meta_engine
    row = eng.search("meta.author:grace", 10, with_details=True).collect()[0]
    assert row["meta"] == {"author": ["Grace Hopper"]}
    assert "meta:" in row["details"]


def test_meta_schema_drift_across_segments(spark, tmp_path):
    """An index built WITHOUT a meta column must accept an update WHOSE
    corpus has one (and vice versa): segment docs schemas differ and the
    union view must not crash (allowMissingColumns)."""
    from xltsearch_spark.catalog import IndexCatalog
    base = [("r", "a", "c", "en", "alpha beta spark", None),
            ("r", "b", "c", "en", "gamma delta spark", None)]
    no_meta_schema = StructType(SCHEMA.fields[:-1])
    cat = IndexCatalog(spark, str(tmp_path / "wh"), CFG)
    cat.build(spark.createDataFrame(base, no_meta_schema), fingerprint="v1")
    v2 = [("r", "a", "c", "en", "alpha beta spark", None, {"author": ["Ada"]}),
          ("r", "b", "c", "en", "gamma delta spark", None, {}),
          ("r", "c", "c", "en", "added doc spark", None, {"author": ["Bob"]})]
    cat.update(spark.createDataFrame(v2, SCHEMA), fingerprint="v2")
    eng = cat.engine()
    assert eng.docs.count() == 3  # union view across schema-divergent segments
    assert eng.search_scores("spark", 10).count() == 3
    assert {r["path"] for r in eng.search("meta.author:bob", 5).collect()} == {"c"}
