"""Streaming corpus ingest: file-source stream -> micro-batch index updates.

At cluster scale the source would be Kafka or an Iceberg CDC stream; the
plumbing is identical — corpus-shaped rows arrive, each micro-batch becomes
one index segment through the same change-diff/MERGE path as batch updates
(only changed rows re-tokenize; replaced doc ids tombstone).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from xltsearch_spark.catalog import IndexCatalog

CORPUS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
    StructField("title", StringType()),
])


def stream_corpus_into_index(spark: SparkSession, catalog: IndexCatalog,
                             source_dir: str, checkpoint_dir: str,
                             available_now: bool = True):
    """Start (and with ``available_now`` drain) a corpus-file stream into the
    index. Returns the StreamingQuery.

    * source: parquet files dropped into ``source_dir`` (schema above);
    * each micro-batch -> ``catalog.update(batch, full_snapshot=False)``:
      inserts/updates become a new segment, absent docs are untouched;
    * restart safety: the streaming checkpoint replays an unacknowledged
      batch with the same batch_id -> same fingerprint -> the catalog's
      stage manifests skip whatever already committed.
    """
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(source_dir)

    def process(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        catalog.update(batch_df, fingerprint=f"stream-batch-{batch_id}",
                       full_snapshot=False)

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
