"""Deterministic sampling / split operators for training-data pipelines.

A 100-TB corpus pipeline needs *reproducible* subsetting: train/val/test
splits that never move a document between splits across reruns or cluster
sizes, and per-stratum quotas (per language, per source) for balanced
training mixes. Random sampling (``df.sample``) is neither reproducible
across partitionings nor stratified; these operators derive every decision
from a pure arithmetic hash of a stable id — the same rows are selected on
1 executor or 1000, in Spark or in the DuckDB oracle.

Hash: Knuth multiplicative hashing reduced to a 31-bit domain,
``h(id) = (((id + salt) mod 2^31) * 2654435761) mod 2^31`` — the folded
operand stays < 2^31 so the product stays < 2^63: no int64 overflow in
ANY engine (DuckDB raises on BIGINT overflow; Spark would silently wrap),
making the expression bit-identical in Spark longs and DuckDB BIGINT.
Pure column arithmetic (no UDF, no shuffle for the split; one
strata-keyed shuffle for the quota sample).

Scale notes:
* ``hash_split`` is map-only — a projection, pipelined into the scan.
* ``stratified_sample_n`` is one window over ``partition by strata`` —
  a single shuffle on the strata key. Strata counts are typically small
  (languages, sources); a hot stratum only needs its top-n by hash order,
  which Spark's WindowExec + rank-pushdown limit handles without
  materializing the full stratum (rows stream through the running rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth's multiplicative constant (2^32 / phi); public-domain technique
_KNUTH = 2654435761
_MOD = 1 << 31


def bucket_hash(id_col: Column, salt: int = 0) -> Column:
    """(((id + salt) pmod 2^31) * 2654435761) mod 2^31, overflow-free in
    int64: the folded operand < 2^31 keeps the product < 2^63.

    ``pmod`` (not ``%``) for the fold: Spark's ``%`` keeps the dividend's
    sign, so a negative id+salt would fold negative, go right through the
    split bounds, and diverge from any engine that mods into [0, 2^31).
    After a non-negative fold the product is non-negative, so the outer
    reduction needs no pmod. For non-negative id+salt (the common case —
    doc_ids are dense from 0) pmod == %, so existing splits are unchanged
    and the DuckDB oracle expression stays bit-identical."""
    folded = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_MOD))
    return (folded * F.lit(_KNUTH)) % F.lit(_MOD)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: Efraimidis &
    Spiropoulos-Spirtakis (2006) A-ES — every row draws the exponential
    race key ``e = -ln(u)/w`` with ``u`` a uniform in (0, 1] derived from
    the id hash, and the k SMALLEST keys win (the monotone-equivalent
    form of the paper's ``u^(1/w)`` top-k; inclusion probability is
    proportional to weight draw by draw). Rows with weight <= 0 are
    excluded (the estimator is undefined there).

    Returns the winning rows plus ``es_key`` (rounded to 9 decimals
    BEFORE the cut so the k-th slot never flips on a last-ulp ln()
    difference across engines; ties broken by id).

    Scale shape: the key is map-only arithmetic fused into the scan; the
    cut is TakeOrderedAndProject(k) — no global sort, no collect; the
    selected set depends only on (id, salt, weight), never on
    partitioning or cluster size."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (bucket_hash(F.col(id_col), salt) + F.lit(1)).cast("double") \
        / F.lit(float(_MOD))
    e = F.round(-F.log(u) / w, 9)
    return (df.filter(w > 0).withColumn("es_key", e)
            .orderBy(F.asc("es_key"), F.asc(id_col)).limit(k))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: dict[str, float] | None = None,
               salt: int = 0, out_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label by hash range.

    ``weights`` maps label -> fraction (must sum to ~1). A document's
    label depends only on (id, salt): stable across reruns, partitionings
    and engines. Map-only projection.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    h = bucket_hash(F.col(id_col), salt)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        cum += w
        bound = int(cum * _MOD)
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else \
            expr.when(cond, F.lit(label))
    last_label = labels[-1][0]
    expr = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return df.withColumn(out_col, expr)


def stratified_sample_n(df: DataFrame, strata_col: str, n: int,
                        id_col: str = "doc_id", salt: int = 0) -> DataFrame:
    """Deterministic per-stratum quota: the n rows with the smallest
    hash(id) inside each stratum (ties impossible for distinct ids under
    an injective-enough map; broken by id anyway for full determinism).

    One shuffle on the strata key; the window's running rank lets Spark
    drop rows past n without holding the stratum in memory.
    """
    h = bucket_hash(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk"))


def stratified_sample_fraction(df: DataFrame, strata_col: str,
                               fraction: float, id_col: str = "doc_id",
                               salt: int = 0) -> DataFrame:
    """Deterministic per-stratum Bernoulli-style sample: keep rows whose
    hash falls in the first ``fraction`` of the hash range. Map-only (no
    shuffle at all — the stratum only matters for reporting); expected
    per-stratum rate is exact in distribution and reproducible exactly.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    bound = int(fraction * _MOD)
    return df.filter(bucket_hash(F.col(id_col), salt) < F.lit(bound))
