"""Structured-Streaming event analytics: watermarked windowed aggregation
and a CUSTOM STATEFUL operator (sessionization) via applyInPandasWithState.

The batch forms in ``operators/events.py`` are the executable oracles: the
tests drain a file stream with ``availableNow`` and compare the streaming
result table to the batch operator over the same rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stream_windowed_rollup(spark: SparkSession, source_dir: str,
                           checkpoint_dir: str, sink_table: str,
                           window: str = "10 minutes",
                           watermark: str = "30 minutes",
                           output_mode: str = "update"):
    """Tumbling-window rollup over a file stream of events.

    * ``withWatermark`` bounds state: windows older than (max event time -
      watermark) are finalized and their state dropped — the late-data
      contract a 100-TB stream needs (unbounded windows = unbounded state).
    * ``update`` output emits refreshed rows per micro-batch (memory sink
      here; a real deployment writes to an upsert sink keyed on
      (window_start, event_type)).
    Drains with availableNow and returns the finished query.
    """
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"))
           .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                   "event_type", "n_events", "sum_value"))
    q = (agg.writeStream.format("memory").queryName(sink_table)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q


SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])
_SESSION_STATE = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
])


def _make_session_fn(gap_us: int):
    def fn(key, pdf_iter, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id],
                                "session_start_us": [start_us],
                                "session_end_us": [last_us],
                                "n_events": [n]})
            return
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        # pandas datetime64[ns] -> epoch microseconds, ascending
        tus = (rows["ts"].astype("int64") // 1000).sort_values().to_numpy()
        out = []
        cur = state.get if state.exists else None  # (start, last, n) or None
        for t in tus:
            t = int(t)
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                out.append((user_id, *cur))
                cur = (t, t, 1)
            else:  # within gap (late-but-in-watermark events join the session;
                # an event OLDER than the open session's start extends the
                # start backward, matching the batch min(ts) gaps-and-islands)
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
        start_us, last_us, n = cur
        state.update((start_us, last_us, n))
        # close the open session once the watermark passes last event + gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # ms
        if out:
            o = pd.DataFrame(out, columns=["user_id", "session_start_us",
                                           "session_end_us", "n_events"])
            yield o

    return fn


def stream_sessionize(spark: SparkSession, source_dir: str, checkpoint_dir: str,
                      out_dir: str, gap_minutes: int = 30,
                      watermark: str = "1 minute"):
    """CUSTOM STATEFUL streaming operator: per-user sessionization with
    ``applyInPandasWithState`` (arbitrary state + event-time timeout).

    Per user the state is one open session (start, last, count) — O(1) per
    key, the shape that scales to 10^9 users. A session is EMITTED when
    (a) a later event arrives past the gap (closed within a batch), or
    (b) the event-time timeout fires: watermark > last event + gap.

    Sink is an append-mode parquet directory (file sinks support restart
    from the checkpoint; the in-memory sink does not), so successive
    availableNow drains of the same checkpoint accumulate closed sessions.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    sessions = (stream.withWatermark("ts", watermark)
                .groupBy("user_id")
                .applyInPandasWithState(_make_session_fn(gap_us),
                                        outputStructType=SESSION_OUT,
                                        stateStructType=_SESSION_STATE,
                                        outputMode="append",
                                        timeoutConf=GroupStateTimeout.EventTimeTimeout))
    q = (sessions.writeStream.format("parquet")
         .option("path", out_dir)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
