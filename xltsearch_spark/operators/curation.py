"""End-to-end corpus curation: the composed keep/drop/split decision.

Every pretraining pipeline chains the same stages over raw documents —
length/quality gates, language filter, exact dedup, benchmark
decontamination, then a deterministic train/val/test split (public
methodology: the C4 / Gopher / RefinedWeb / FineWeb pipeline papers all
describe exactly this sequence). The individual signals exist as
standalone operators (textstats / dedup / contamination / sampling); this
module composes them into ONE per-document verdict so the whole pipeline
is a single declarative Spark plan instead of N materialized passes.

Decision rules apply in fixed precedence (cheapest first, the order the
real pipelines use so expensive stages see fewer rows); ``reason`` names
the FIRST failing rule:

1. ``too_short``     — fewer than ``min_tokens`` tokens
2. ``low_quality``   — composite quality score below ``min_quality``
3. ``wrong_lang``    — predicted language not in ``allowed_langs``
4. ``exact_dup``     — not the minimum-doc_id member of its byte-identical
                       text group (sha256 equality, dedup.py convention)
5. ``contaminated``  — shares >= 1 word n-gram with the benchmark set
6. ``kept``          — survives everything; gets a split label

Scale shape (the point of composing declaratively): rules 1-3 and the
split are pure column expressions computed in ONE map-only pass fused
into the scan (quality_struct / lang_struct keep them join-free). Rule 4
is a window over sha256(text) — the pipeline's single full shuffle, same
cost as standalone exact dedup. Rule 5 joins the doc shingles against the
BROADCAST benchmark shingle set and left-joins the (tiny, contaminated
docs only) hit aggregate back — AQE makes that side broadcast too. Net:
one shuffle + two broadcast joins for the entire five-stage pipeline, vs
five materialized intermediate tables in a naive orchestration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from xltsearch_spark.operators.contamination import (
    _gram_array, benchmark_shingles)
from xltsearch_spark.operators.sampling import hash_split
from xltsearch_spark.operators.textstats import lang_struct, quality_struct

KEPT = "kept"
RULES = ("too_short", "low_quality", "wrong_lang", "exact_dup",
         "contaminated")


def curate(docs: DataFrame, benchmark: DataFrame | None = None, *,
           min_tokens: int = 5, min_quality: float = 0.25,
           allowed_langs: tuple[str, ...] = ("en",),
           contamination_n: int = 5,
           split_weights: dict[str, float] | None = None,
           salt: int = 0, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """Per-document curation verdict: (doc_id, keep, reason, split).

    ``keep`` is 1 iff every rule passes; ``reason`` is ``'kept'`` or the
    first failing rule name; ``split`` is the deterministic hash-range
    label (sampling.hash_split semantics) for kept docs, NULL otherwise.
    ``benchmark=None`` skips the contamination rule entirely (no shingle
    pass is planned at all).
    """
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    text, did = F.col(text_col), F.col(id_col)
    q = quality_struct(text)
    lg = lang_struct(text)
    keeper = F.min(did).over(
        Window.partitionBy(F.sha2(text.cast("binary"), 256)))
    base = docs.select(did.alias("doc_id"), text.alias("_text"),
                       q.alias("_q"), lg.alias("_lg"),
                       keeper.alias("_keeper"))

    if benchmark is not None:
        bench = benchmark_shingles(benchmark, contamination_n, text_col)
        hits = (base.select("doc_id",
                            F.explode(_gram_array(F.col("_text"),
                                                  contamination_n))
                            .alias("shingle"))
                .join(F.broadcast(bench), "shingle")
                .select("doc_id").distinct()
                .withColumn("_hit", F.lit(True)))
        base = base.join(F.broadcast(hits), "doc_id", "left")
    else:
        base = base.withColumn("_hit", F.lit(None).cast("boolean"))

    reason = (F.when(F.col("_q.n_tokens") < min_tokens, "too_short")
              .when(F.col("_q.quality") < min_quality, "low_quality")
              .when(~F.col("_lg.pred_lang").isin(*allowed_langs),
                    "wrong_lang")
              .when(F.col("doc_id") != F.col("_keeper"), "exact_dup")
              .when(F.coalesce(F.col("_hit"), F.lit(False)), "contaminated")
              .otherwise(KEPT))

    out = hash_split(base.withColumn("reason", reason),
                     "doc_id", weights, salt, out_col="_split")
    return out.select(
        "doc_id",
        (F.col("reason") == KEPT).cast("int").alias("keep"),
        "reason",
        F.when(F.col("reason") == KEPT, F.col("_split"))
        .otherwise(F.lit(None).cast("string")).alias("split"))


def curation_report(verdicts: DataFrame) -> DataFrame:
    """Aggregate funnel: (reason, split, n_docs) — the per-stage loss
    numbers every curation run reports. One partial-agg groupBy."""
    return (verdicts.groupBy("reason", "split")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("reason", "split"))
