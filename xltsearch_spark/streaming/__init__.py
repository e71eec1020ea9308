"""Structured Streaming ingest for the inverted index.

The reference explicitly does NOT monitor folders (README.md:26 — updates
are user-initiated batch), so streaming is an additive capability: a
corpus-row stream is folded into the segmented index via foreachBatch ->
``IndexCatalog.update(batch, full_snapshot=False)``. Each micro-batch is a
Lucene-style updateDocument batch (new segment + tombstones for replaced
rows); exactly-once is provided by the streaming checkpoint plus the
catalog's fingerprint-keyed stage manifests (a replayed batch id hits the
same fingerprint and skips completed stages).
"""

from xltsearch_spark.streaming.ingest import stream_corpus_into_index  # noqa: F401
