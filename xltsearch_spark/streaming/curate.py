"""Structured-Streaming corpus curation: the batch pipeline's verdict on
a continuously-arriving document stream.

The batch pipeline (``operators/curation.py``) splits cleanly along the
streaming boundary: rules 1-3 (quality / language), contamination (a
stream-static broadcast join against the benchmark shingles) and the
split label are stateless and run unchanged via ``pre_verdict``. Only
exact-dedup is stateful — batch resolves it with a window over
``sha256(text)`` across the whole corpus, which a stream cannot see.

The streaming replacement is the only causally-available policy:
FIRST-WINS. An ``applyInPandasWithState`` operator keyed on
``content_sha`` remembers which hashes have produced a keeper; the first
arriving copy (min doc_id within a micro-batch, arrival order across
batches) proceeds to the contamination/kept verdict, every later copy
becomes ``exact_dup``. This matches batch semantics exactly when the
corpus arrives in one micro-batch in doc_id order, and deliberately
diverges to arrival order across batches — the same divergence any
streaming dedup (incl. Spark's own ``dropDuplicates`` on a stream) has.

State is bounded by an EVENT-TIME TTL (``dedup_ttl_minutes``) against the
stream's ``ingest_ts`` watermark: a hash idle longer than the TTL is
forgotten, so state size tracks the recent unique-content rate, not
corpus cardinality — the contract an unbounded stream needs. (Event-time
rather than processing-time deliberately: it is replay-deterministic,
and pending processing-time timeouts prevent an ``availableNow`` drain
from ever terminating.) TTL expiry re-admits an old duplicate; curation
pipelines accept that (dedup recall decays gracefully, never
correctness).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

from xltsearch_spark.operators.curation import KEPT, pre_verdict

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
    StructField("ingest_ts", TimestampType()),
])

CURATE_OUT = StructType([
    StructField("doc_id", LongType()),
    StructField("keep", IntegerType()),
    StructField("reason", StringType()),
    StructField("split", StringType()),
])

_PRE_RULES = ("too_short", "low_quality", "wrong_lang")


def _make_dedup_fn(ttl_minutes: int):
    ttl_ms = ttl_minutes * 60 * 1000

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter)).sort_values("doc_id")
        seen = state.exists
        state.update((True,))
        # forget this hash once the watermark passes its LAST sighting +
        # TTL (anchored to event time, not getCurrentWatermarkMs(): the
        # watermark reads 0 during the very first batch, which would
        # expire all state in the drain's own cleanup pass). Clamped to
        # watermark+1: setTimeoutTimestamp THROWS (killing the whole
        # query) when the requested timeout is not strictly later than
        # the current watermark — reachable on availableNow drains over
        # backfilled/late files once a restarted checkpoint's watermark
        # has advanced past old event times plus the TTL; a late group
        # then expires at the next eviction pass instead of crashing.
        last_ms = int(pdf["ingest_ts"].astype("datetime64[ns]")
                      .astype("int64").max() // 1_000_000)
        state.setTimeoutTimestamp(max(last_ms + ttl_ms,
                                      state.getCurrentWatermarkMs() + 1))
        reasons, splits = [], []
        for i, (pre_reason, split) in enumerate(
                zip(pdf["pre_reason"], pdf["_split"])):
            if pre_reason in _PRE_RULES:
                r = pre_reason              # rules 1-3 outrank dedup
            elif seen or i > 0:
                r = "exact_dup"             # a keeper already exists
            else:
                r = pre_reason              # keeper: contaminated or kept
            reasons.append(r)
            splits.append(split if r == KEPT else None)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "keep": [1 if r == KEPT else 0 for r in reasons],
            "reason": reasons, "split": splits})

    return fn


def stream_curate(spark: SparkSession, source_dir: str, checkpoint_dir: str,
                  out_dir: str, benchmark: DataFrame | None = None,
                  dedup_ttl_minutes: int = 60, watermark: str = "1 minute",
                  **curate_kwargs):
    """Curate a parquet file stream of documents into an append parquet
    sink (file sinks support restart from the checkpoint, so successive
    drains of the same checkpoint accumulate verdicts — the memory sink
    does not recover).

    ``benchmark`` is a STATIC DataFrame (its shingle set broadcasts into
    a membership UDF — eval sets change per release, not per
    micro-batch). ``curate_kwargs`` pass through to ``pre_verdict``
    (thresholds, langs, split weights). The stream carries an
    ``ingest_ts`` arrival timestamp; its watermark drives the dedup-state
    TTL. Drains with availableNow and returns the finished query.
    """
    stream = (spark.readStream.schema(DOCS_SCHEMA).parquet(source_dir)
              .withWatermark("ingest_ts", watermark))
    pre = pre_verdict(stream, benchmark, keep_cols=("ingest_ts",),
                      **curate_kwargs)
    out = (pre.groupBy("content_sha")
           .applyInPandasWithState(
               _make_dedup_fn(dedup_ttl_minutes),
               outputStructType=CURATE_OUT,
               stateStructType=StructType(
                   [StructField("seen", BooleanType())]),
               outputMode="append",
               timeoutConf=GroupStateTimeout.EventTimeTimeout))
    q = (out.writeStream.format("parquet").option("path", out_dir)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
