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
BROADCAST benchmark shingle set (bounded by the eval-set size) and
left-joins the contaminated-doc-id aggregate back WITHOUT a broadcast
hint — that side is bounded only by the corpus (a boilerplate-heavy
benchmark can flag a large doc fraction), so AQE picks broadcast only
when it is actually small. Net: one shuffle + one guaranteed-broadcast
join + one AQE-decided join for the five-stage pipeline, vs five
materialized intermediate tables in a naive orchestration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from xltsearch_spark.operators.contamination import (
    _gram_array, benchmark_shingles)
from xltsearch_spark.operators.sampling import hash_split
from xltsearch_spark.operators.textstats import lang_struct, quality_struct

KEPT = "kept"
RULES = ("too_short", "low_quality", "wrong_lang", "exact_dup",
         "contaminated")


def pre_verdict(docs: DataFrame, benchmark: DataFrame | None = None, *,
                min_tokens: int = 5, min_quality: float = 0.25,
                allowed_langs: tuple[str, ...] = ("en",),
                contamination_n: int = 5,
                split_weights: dict[str, float] | None = None,
                salt: int = 0, text_col: str = "text",
                id_col: str = "doc_id",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """The STATELESS part of the verdict: every rule except exact-dup.

    Returns (doc_id, content_sha, pre_reason, _split) where ``pre_reason``
    skips rule 4 (its precedence slot is re-inserted by the caller:
    ``curate`` via a window over ``content_sha``, the streaming variant
    via a stateful first-wins operator — a stream cannot window over the
    full corpus, which is exactly why this split exists). Map-only plus
    the broadcast contamination join; safe on streaming DataFrames.
    ``keep_cols`` pass through untouched (the streaming caller keeps its
    watermarked event-time column alive this way).
    """
    weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    from xltsearch_spark.operators._parallel import (
        JVM_MIN_BYTES_PER_PARTITION, ensure_min_parallelism)
    # no-op on streams; JVM threshold — the verdict struct is codegen'd
    docs = ensure_min_parallelism(docs, id_col,
                                  min_bytes=JVM_MIN_BYTES_PER_PARTITION)
    text, did = F.col(text_col), F.col(id_col)
    base = docs.select(did.alias("doc_id"), text.alias("_text"),
                       quality_struct(text).alias("_q"),
                       lang_struct(text).alias("_lg"),
                       F.sha2(text.cast("binary"), 256).alias("content_sha"),
                       *[F.col(c) for c in keep_cols])

    if benchmark is not None and docs.isStreaming:
        # a stream cannot re-join its own exploded shingles (stream-stream
        # join); instead the benchmark shingle SET rides a broadcast
        # variable into an Arrow-batched membership UDF — same semantics,
        # and eval sets are small by definition (the same assumption the
        # batch path's F.broadcast makes)
        from pyspark.sql.functions import pandas_udf
        bench = benchmark_shingles(benchmark, contamination_n, text_col)
        bset = {r["shingle"] for r in bench.collect()}
        bvar = docs.sparkSession.sparkContext.broadcast(bset)

        def _has_hit_fn(grams):
            s = bvar.value
            return grams.apply(
                lambda gs: any(g in s for g in gs) if gs is not None
                else False)

        _has_hit = pandas_udf(_has_hit_fn, "boolean")
        base = base.withColumn(
            "_hit", _has_hit(_gram_array(F.col("_text"), contamination_n)))
    elif benchmark is not None:
        bench = benchmark_shingles(benchmark, contamination_n, text_col)
        hits = (base.select("doc_id",
                            F.explode(_gram_array(F.col("_text"),
                                                  contamination_n))
                            .alias("shingle"))
                .join(F.broadcast(bench), "shingle")
                .select("doc_id").distinct()
                .withColumn("_hit", F.lit(True)))
        # bench (distinct BENCHMARK shingles) is bounded by the eval-set
        # size, so its broadcast is safe; hits (contaminated DOC ids) is
        # bounded only by the corpus — a boilerplate-heavy benchmark can
        # flag a large fraction of docs, so no forced broadcast here:
        # AQE picks broadcast only when the side is actually small
        base = base.join(hits, "doc_id", "left")
    else:
        base = base.withColumn("_hit", F.lit(None).cast("boolean"))

    pre_reason = (
        # explicit NULL-text gate FIRST: a NULL text makes every quality/
        # lang struct field NULL, so each WHEN below evaluates to NULL and
        # the CASE would fall through to 'kept' — raw corpora routinely
        # carry null text, and an unusable row must never ship with
        # keep=1. Zero tokens is the honest classification (rule 1).
        F.when(F.col("_text").isNull(), "too_short")
        .when(F.col("_q.n_tokens") < min_tokens, "too_short")
        .when(F.col("_q.quality") < min_quality, "low_quality")
        .when(~F.col("_lg.pred_lang").isin(*allowed_langs), "wrong_lang")
        .when(F.coalesce(F.col("_hit"), F.lit(False)), "contaminated")
        .otherwise(KEPT))
    return (hash_split(base.withColumn("pre_reason", pre_reason),
                       "doc_id", weights, salt, out_col="_split")
            .select("doc_id", "content_sha", "pre_reason", "_split",
                    *keep_cols))


def finalize_verdict(reason: Column) -> list[Column]:
    """Shared output shape: [keep, reason, split-gate] columns from a
    final-reason column (callers add doc_id and the _split source)."""
    return [
        (reason == KEPT).cast("int").alias("keep"),
        reason.alias("reason"),
        F.when(reason == KEPT, F.col("_split"))
        .otherwise(F.lit(None).cast("string")).alias("split")]


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
    pre = pre_verdict(docs, benchmark, min_tokens=min_tokens,
                      min_quality=min_quality, allowed_langs=allowed_langs,
                      contamination_n=contamination_n,
                      split_weights=split_weights, salt=salt,
                      text_col=text_col, id_col=id_col)
    # rule 4 re-inserted at its precedence slot: a non-keeper whose
    # pre_reason already fired at rules 1-3 keeps that reason; one that
    # reached contamination/kept becomes exact_dup
    keeper = F.min("doc_id").over(Window.partitionBy("content_sha"))
    reason = (F.when(F.col("pre_reason").isin("too_short", "low_quality",
                                              "wrong_lang"),
                     F.col("pre_reason"))
              .when(F.col("doc_id") != keeper, "exact_dup")
              .otherwise(F.col("pre_reason")))
    return pre.select("doc_id", *finalize_verdict(reason))


def curation_report(verdicts: DataFrame) -> DataFrame:
    """Aggregate funnel: (reason, split, n_docs) — the per-stage loss
    numbers every curation run reports. One partial-agg groupBy."""
    return (verdicts.groupBy("reason", "split")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("reason", "split"))
