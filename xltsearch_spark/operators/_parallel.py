"""Input-parallelism floor for map-heavy operators (guide §2.5 input skew).

A small parquet table arrives as 1-3 scan partitions (128 MB splits), which
serializes the expensive map-side work — Python shingle hashing, numpy
matmuls, JVM regex tokenization — on a handful of cores while the rest of
local[N] (or the cluster) idles. These operators' per-row work is orders of
magnitude above scan cost, so one cheap hash repartition up to
defaultParallelism pays for itself immediately.

Scale shape: at 100 TB any scan already carries >> cores partitions and this
is a no-op; it only triggers on the small-input case. The repartition hashes
on a caller-named key column (deterministic row->partition mapping — NOT
round-robin, which pays a sort-before-repartition and is retry-unsafe on
nondeterministic input, guide §2.5). Row-wise results are unchanged: every
operator using this computes per-row/per-group values that do not depend on
physical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Repartition ``df`` up to ``sparkContext.defaultParallelism`` when its
    plan yields fewer partitions. Hash-partitions on ``key_col`` when given
    (deterministic), round-robin otherwise. No-op for streaming frames and
    for inputs that are already parallel enough."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (exotic plans)
        return df
    if cur >= target:
        return df
    if key_col is not None and key_col in df.columns:
        return df.repartition(target, key_col)
    return df.repartition(target)
