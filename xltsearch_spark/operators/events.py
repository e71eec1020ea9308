"""Event-stream analytics over the ``events`` table (training-pipeline /
observability extension; the reference is batch-only — README.md:26 — so
these are additive, built Spark-first).

* ``windowed_rollup``  — tumbling-window counts/sums: ONE groupBy on
  (window, event_type) with map-side partial aggregation; at 100 TB the
  shuffle volume is the number of distinct (bucket, type) pairs, not rows.
* ``sessionize``       — gaps-and-islands sessionization per user: one
  shuffle on user_id; windows are per-key sequential scans (state bounded
  by a user's own events, never global).

Streaming variants (watermarks, applyInPandasWithState) live in
``xltsearch_spark/streaming/``; these batch forms are their oracles.

All time arithmetic uses integer epoch MICROSECONDS (``unix_micros``) so a
SQL oracle (DuckDB ``epoch_us``) is exactly reproducible — no float time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def windowed_rollup(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """(window_start epoch-sec, event_type, n_events, sum_value) per
    tumbling window (epoch-aligned, as Spark's window() is)."""
    # tolerate TIMESTAMP_NTZ sources (session tz is pinned UTC in session.py)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session stats: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``.

    Returns (user_id, n_sessions, n_events, max_session_events,
    total_dur_us) — all integers (exact cross-engine equality).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    e = events.select("user_id", "event_id",
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"))
    prev = F.lag("tus").over(w)
    new_s = F.when(prev.isNull() | ((F.col("tus") - prev) > gap_us), 1).otherwise(0)
    sess = (e.withColumn("ns", new_s)
            .withColumn("sid", F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    per_session = (sess.groupBy("user_id", "sid")
                   .agg(F.count("*").alias("c"),
                        (F.max("tus") - F.min("tus")).alias("dur")))
    return (per_session.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("c").alias("n_events"),
                 F.max("c").alias("max_session_events"),
                 F.sum("dur").alias("total_dur_us")))
