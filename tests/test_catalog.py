"""Catalog lifecycle: persisted build, checkpoint/resume, invalidation,
sha256 row invariant (SURVEY.md §5.5-5.6, B9/B10)."""

import json
import os

import pytest

from xltsearch_spark.catalog import IndexCatalog
from xltsearch_spark.config import (INDEX_INVALIDATED, INDEX_NEVER_CREATED,
                                    INDEX_UPDATE_FAILED, IndexConfig)
from xltsearch_spark.sources.corpus import corpus_manifest


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


CFG = IndexConfig(doc_range_size=16, block_size=8, term_buckets=8)


def test_lifecycle_never_created_then_built(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    assert cat.status() == INDEX_NEVER_CREATED
    stats = cat.build(spark.createDataFrame(tiny_corpus), fingerprint="v1",
                      build_time_ms=123456)
    assert cat.status() == 123456
    assert stats.n_docs == 64
    engine = cat.engine()
    assert engine.search_scores("needle_5", 10).collect()[0]["doc_id"] == 5


def test_crash_resume_skips_completed_stages(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    corpus = spark.createDataFrame(tiny_corpus)
    with pytest.raises(RuntimeError, match="injected failure"):
        cat.build(corpus, fingerprint="v1", fail_after="runs")
    assert cat.status() == INDEX_UPDATE_FAILED  # crash marker (Catalog.java:104-105)
    # resume: docs+runs manifests exist and must not be rebuilt
    docs_mtime = os.path.getmtime(cat._manifest_path("seg_000000", "docs"))
    runs_mtime = os.path.getmtime(cat._manifest_path("seg_000000", "runs"))
    cat.build(corpus, fingerprint="v1", build_time_ms=999)
    assert os.path.getmtime(cat._manifest_path("seg_000000", "docs")) == docs_mtime
    assert os.path.getmtime(cat._manifest_path("seg_000000", "runs")) == runs_mtime
    assert cat.status() == 999
    # resumed index answers queries
    assert cat.engine().search_scores("graded", 10).count() > 0


def test_resume_equals_fresh_build(spark, tiny_corpus, warehouse, tmp_path):
    corpus = spark.createDataFrame(tiny_corpus)
    cat1 = IndexCatalog(spark, warehouse, CFG)
    with pytest.raises(RuntimeError):
        cat1.build(corpus, fingerprint="v1", fail_after="dictionary")
    cat1.build(corpus, fingerprint="v1")
    cat2 = IndexCatalog(spark, str(tmp_path / "wh2"), CFG)
    cat2.build(corpus, fingerprint="v1")
    q = "common_token AND graded"
    r1 = [(r["doc_id"], round(r["score"], 9)) for r in cat1.engine().search_scores(q, 50).collect()]
    r2 = [(r["doc_id"], round(r["score"], 9)) for r in cat2.engine().search_scores(q, 50).collect()]
    assert r1 == r2


def test_fingerprint_change_rebuilds(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    corpus = spark.createDataFrame(tiny_corpus)
    cat.build(corpus, fingerprint="v1")
    assert not cat.stage_complete("seg_000000", "docs", "v2")  # new snapshot invalidates lineage


def test_config_change_invalidates(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    cat.build(spark.createDataFrame(tiny_corpus), fingerprint="v1")
    cat2 = IndexCatalog(spark, warehouse,
                        IndexConfig(analyzer="english", doc_range_size=16,
                                    block_size=8, term_buckets=8))
    assert cat2.status() == INDEX_INVALIDATED  # Config.java:289-297 semantics
    with pytest.raises(RuntimeError, match="invalidated"):
        cat2.engine()


def test_sha256_row_invariant(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    cat.build(spark.createDataFrame(tiny_corpus), fingerprint="v1")
    manifest = spark.createDataFrame(corpus_manifest(tiny_corpus))
    assert cat.verify_hashsums(manifest) == 0
    # corrupt one row of the manifest -> exactly one mismatch
    bad = corpus_manifest(tiny_corpus)
    bad.loc[0, "hashsum"] = "0" * 64
    assert cat.verify_hashsums(spark.createDataFrame(bad)) == 1


def test_manifest_records_lineage(spark, tiny_corpus, warehouse):
    cat = IndexCatalog(spark, warehouse, CFG)
    cat.build(spark.createDataFrame(tiny_corpus), fingerprint="v1")
    with open(cat._manifest_path("seg_000000", "postings")) as f:
        m = json.load(f)
    assert m["status"] == "success"
    assert m["input_fingerprint"] == "v1"
    assert m["rows"] > 0 and m["wall_ms"] >= 0
    assert m["config_hash"] == CFG.config_hash()


# ---- TableStore seam (SCALE.md Iceberg mapping's code seam) ----

def test_catalog_routes_all_io_through_table_store(spark, small_corpus, tmp_path):
    """Every stage read/write (incl. tombstone batches) must pass through
    the injected TableStore — the adapter seam an IcebergTableStore plugs
    into without touching catalog logic."""
    from pyspark.sql import functions as F
    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig
    from xltsearch_spark.sources.table_store import ParquetFilesystemStore

    class CountingStore(ParquetFilesystemStore):
        def __init__(self):
            self.writes, self.reads = [], []

        def write(self, df, target, partition_by=(), mode="overwrite"):
            self.writes.append(target)
            super().write(df, target, partition_by, mode)

        def read(self, spark, target):
            self.reads.append(target)
            return super().read(spark, target)

    store = CountingStore()
    cfg = IndexConfig(name="seam", term_buckets=4)
    cat = IndexCatalog(spark, str(tmp_path / "wh"), cfg, store=store)
    corpus = spark.createDataFrame(small_corpus)
    cat.build(corpus, fingerprint="v1")
    # all 5 stages written through the store
    assert sum(1 for w in store.writes if "/seg_000000/" in w) == 5
    # a delete-only update writes a tombstone batch through the store too
    cat.update(corpus.filter(F.col("path") != corpus.collect()[0]["path"]),
               fingerprint="v2")
    assert any("/tombstones/" in w for w in store.writes)
    store.reads.clear()
    eng = cat.engine()
    assert eng.search_scores("common_token", 3).count() <= 3
    assert any("/postings" in r for r in store.reads)
    assert any("/tombstones/" in r for r in store.reads)


def test_iceberg_store_requires_configured_catalog(spark):
    """Without the Iceberg runtime configured the adapter must fail fast
    at construction with setup guidance, not deep inside a write."""
    import pytest
    from xltsearch_spark.sources.table_store import IcebergTableStore
    with pytest.raises(RuntimeError, match="spark.sql.catalog.icy"):
        IcebergTableStore(spark, "icy")
