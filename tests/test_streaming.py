"""Streaming ingest: micro-batches fold into segments; restart-safe."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xltsearch_spark.catalog import IndexCatalog
from xltsearch_spark.config import IndexConfig
from xltsearch_spark.sources.corpus import generate_corpus
from xltsearch_spark.streaming import stream_corpus_into_index

CFG = IndexConfig(doc_range_size=16, block_size=8, term_buckets=8)


def _write(df, path):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def test_stream_ingest_appends_segments(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    cat = IndexCatalog(spark, wh, CFG)

    v1 = generate_corpus(48)
    _write(v1, str(src / "batch1.parquet"))
    stream_corpus_into_index(spark, cat, str(src), ckpt)
    assert cat.load_stats().n_docs == 48
    eng = cat.engine()
    assert eng.search_scores("needle_7", 5).count() == 1

    # second drop: 8 brand-new docs + 1 modified existing doc
    v2 = generate_corpus(56).iloc[48 - 56:].copy()  # rows not in v1 keyspace? use fresh keys
    v2 = v2.assign(path="stream/" + v2["path"])
    mod = v1.iloc[[0]].copy()
    mod["content"] = mod["content"] + " streamed_marker"
    import pandas as pd
    _write(pd.concat([v2, mod], ignore_index=True), str(src / "batch2.parquet"))
    stream_corpus_into_index(spark, cat, str(src), ckpt)

    meta = cat.read_meta()
    assert len(meta["segments"]) >= 2
    assert meta.get("n_tombstones", 0) == 1  # the modified doc's old id
    assert cat.tombstones_df(meta).count() == 1  # persisted parquet, not driver state
    eng = cat.engine()
    # appended docs searchable; absent docs NOT deleted (append semantics)
    assert eng.search_scores("streamed_marker", 5).count() == 1
    assert eng.search_scores("needle_7", 5).count() == 1
    assert eng.docs.count() == 48 + 8 + 1 - 1  # 48 live + 8 new + replace
