"""Span-level exact substring deduplication (duplicated-passage detection).

Document-level dedup (operators/dedup.py) removes whole near-duplicate
documents; this operator finds *duplicated passages inside otherwise-unique
documents* — the boilerplate / license-header / templated-paragraph tier
that document-level dedup cannot see. The public methodology is Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499): find every token span of length >= ``min_len`` that
occurs more than once in the corpus, and report the *maximal* duplicated
spans per document so a curation pipeline can cut or down-weight them.

Lee et al. build a single-machine suffix array; that does not distribute.
The standard scalable equivalent (and what this implements) is the
sliding-window formulation: a maximal duplicated span of length >= L is
exactly a maximal run of L-token windows each of which occurs >= 2 times
corpus-wide. That turns the problem into three Spark-native steps:

1. **window emission** — map-only: tokenize (lower + ``\\w+`` runs, the
   same convention as the dedup family), then one higher-order-function
   pass builds every L-window per doc; ``posexplode`` tags each window
   with its 0-based start position. No Python workers anywhere.
2. **global window count** — ONE shuffle, keyed on the window. With
   ``hashed=True`` the key is ``xxhash64`` (8-byte fixed-width keys, the
   100-TB path: collisions only ever over-flag a span, the safe direction
   for dedup); with ``hashed=False`` keys are the joined token strings,
   byte-exact for oracle comparison. Counting is a partial-aggregated
   groupBy, so hot boilerplate windows combine map-side.
3. **span merge** — windows surviving the count filter join back (same
   key, same shuffle partitioning — AQE reuses the exchange) to recover
   (doc_id, pos) hits, then a per-doc window function merges overlapping
   or adjacent L-windows into maximal spans: a new span starts where the
   gap between consecutive duplicated positions exceeds L. Per-doc
   ordering is a ``Window.partitionBy(doc_id)`` — partitions are single
   documents, never the corpus, so the sort is bounded by doc length.

At 100 TB the shuffle volume is the dominant cost and it is one row per
token position (8-byte hash + doc_id + int pos) — comparable to the index
build's posting shuffle, and far below a suffix-array's O(corpus) *string*
shuffle. Hot windows (a license header duplicated 10^6 times) are a skew
risk on the join-back; AQE skew-join handles it, and the count side is
already combined map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from xltsearch_spark.operators._parallel import (
    ensure_min_parallelism, materialize_once)

# window emission is the heaviest JVM map work in the repo (~n tokens
# joined into a string PER POSITION): measured 2.2x from spreading a
# 5.7 MB / 2-partition input (5.5-6.9 s -> 2.6-2.8 s), neutral at 0.6 MB —
# so the floor engages from ~1 MB per partition
_WINDOW_MIN_BYTES = 1 << 20

# ASCII unit separator: joins window tokens so token-boundary ambiguity
# ("a b"+"c" vs "a"+"b c") cannot collide two different windows
_SEP = "\x1f"


def _window_hits(docs: DataFrame, min_len: int, text_col: str,
                 id_col: str, hashed: bool) -> DataFrame:
    """(doc_id, pos, w): every ``min_len``-token window of every doc,
    0-based start position, window keyed as string or xxhash64."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^\w]+"),
                    lambda t: t != "")
    n = min_len
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - n + 1),
        lambda i: F.array_join(F.slice("toks", i, n), _SEP))
    out = (ensure_min_parallelism(docs, id_col, min_bytes=_WINDOW_MIN_BYTES)
           .select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
           .filter(F.size("toks") >= n)
           .select("doc_id", F.posexplode(grams).alias("pos", "w")))
    if hashed:
        out = out.withColumn("w", F.xxhash64("w"))
    return out


def duplicated_spans(docs: DataFrame, min_len: int = 20,
                     text_col: str = "text", id_col: str = "doc_id",
                     hashed: bool = True,
                     max_window_df: int | None = None) -> DataFrame:
    """Maximal duplicated token spans: (doc_id, span_start, span_len).

    A row means: tokens [span_start, span_start + span_len) of ``doc_id``
    are covered by ``min_len``-token windows that each occur >= 2 times
    anywhere in the corpus (including elsewhere in the same document —
    self-repetition is duplication too, per Lee et al.). Spans are
    maximal: consecutive duplicated windows whose starts differ by
    <= ``min_len`` merge into one span, so ``span_len >= min_len`` always
    and a fully-duplicated document yields exactly one row.

    ``hashed=True`` (default) keys windows by ``xxhash64`` — the scale
    path. ``hashed=False`` keys by the literal token string — byte-exact,
    used by the driver oracle entry.

    ``max_window_df`` bounds join-back skew (mirrors ``max_shingle_df``
    in dedup.py): a window occurring more than this many times — a
    license header stamped across 10^6 docs is ONE join key — is dropped
    from span *reporting*. That only narrows the report, never wrongs it:
    such passages are cut by definition anyway (``remove_duplicated_spans``
    keeps exactly one copy regardless, and its argmin survivor does not
    depend on this cap). Spans covered by both hot and normal windows
    simply shrink to their normal-window extent. Default ``None`` reports
    everything and leaves the skew to AQE's skew-join split.
    """
    # explicit repartition on the window key so the count aggregate AND the
    # join-back consume the SAME partitioning, PINNED with an eager
    # localCheckpoint: plain exchange reuse does not survive a persisted
    # input (see materialize_once) — over a cached corpus the window
    # emission re-ran once per consumer (measured 2x at the 10x table)
    hits = materialize_once(
        _window_hits(docs, min_len, text_col, id_col, hashed)
        .repartition("w"))
    dup = (hits.groupBy("w").agg(F.count("*").alias("c"))
           .filter(F.col("c") >= 2))
    if max_window_df is not None:
        dup = dup.filter(F.col("c") <= max_window_df)
    pos = hits.join(dup.select("w"), "w").select("doc_id", "pos")

    per_doc = Window.partitionBy("doc_id").orderBy("pos")
    # NULL lag (first row) compares NULL > n -> NULL -> otherwise(0):
    # the first duplicated position never opens with a break, same as the
    # SQL CASE WHEN in the oracle
    brk = F.when(F.col("pos") - F.lag("pos").over(per_doc) > min_len,
                 F.lit(1)).otherwise(F.lit(0))
    return (pos
            .withColumn("brk", brk)
            .withColumn("span_id", F.sum("brk").over(per_doc))
            .groupBy("doc_id", "span_id")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + min_len - F.min("pos")).alias("span_len"))
            .select("doc_id", "span_start", "span_len"))


def remove_duplicated_spans(docs: DataFrame, min_len: int = 20,
                            text_col: str = "text", id_col: str = "doc_id",
                            hashed: bool = True) -> DataFrame:
    """The curation ACTION: cut every duplicated span occurrence except
    the corpus-wide first, per Lee et al.'s dedup policy (one copy of
    each duplicated passage survives training).

    "First" is the minimum (doc_id, pos) occurrence of each duplicated
    window — deterministic and engine-invariant. A token position is cut
    iff some non-first duplicated window covers it; covered-only-by-first
    positions survive, so exactly one copy of each passage remains.

    Returns every input doc: (doc_id, n_tokens, n_cut_tokens, clean_text)
    where ``clean_text`` is the surviving token stream joined with single
    spaces — the canonical whitespace form curation pipelines feed
    tokenizers (original inter-token bytes are not preserved; the index
    stores originals separately if needed).

    Scale shape: ONE combined aggregate per window key computes the
    occurrence count AND the argmin occurrence (same shuffle the span
    detector pays — count and min fold in the same map-side combine);
    cut-interval merge is the per-doc window function; the final cut is a
    higher-order filter over the token array — map-only, pure JVM.
    """
    n = min_len
    # same pinned-exchange shape as duplicated_spans: one scan feeds both
    # the count+argmin aggregate and the join-back
    hits = materialize_once(
        _window_hits(docs, n, text_col, id_col, hashed).repartition("w"))
    agg = (hits.groupBy("w")
           .agg(F.count("*").alias("c"),
                F.min(F.struct("doc_id", "pos")).alias("first"))
           .filter(F.col("c") >= 2))
    cut = (hits.join(agg, "w")
           .filter((F.col("doc_id") != F.col("first.doc_id"))
                   | (F.col("pos") != F.col("first.pos")))
           .select("doc_id", "pos").distinct())

    per_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(per_doc) > n,
                 F.lit(1)).otherwise(F.lit(0))
    ivs = (cut
           .withColumn("brk", brk)
           .withColumn("span_id", F.sum("brk").over(per_doc))
           .groupBy("doc_id", "span_id")
           .agg(F.min("pos").alias("s"), (F.max("pos") + n).alias("e"))
           .groupBy("doc_id")
           .agg(F.collect_list(F.struct("s", "e")).alias("ivs")))

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^\w]+"),
                    lambda t: t != "")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    ivs_or_empty = F.coalesce(
        F.col("ivs"), F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(ivs_or_empty,
                               lambda iv: (i >= iv["s"]) & (i < iv["e"])))
    return (base.join(ivs, "doc_id", "left")
            .select("doc_id",
                    F.size("toks").alias("n_tokens"),
                    (F.size("toks") - F.size(kept)).alias("n_cut_tokens"),
                    F.array_join(kept, " ").alias("clean_text")))


def substring_dedup_stats(docs: DataFrame, min_len: int = 20,
                          text_col: str = "text", id_col: str = "doc_id",
                          hashed: bool = True,
                          max_window_df: int | None = None) -> DataFrame:
    """Per-document rollup of duplicated-span coverage:
    (doc_id, n_spans, dup_tokens, max_span_len, n_tokens, dup_frac).

    ``dup_frac`` (duplicated tokens / total tokens) is the curation
    signal: pipelines typically drop docs above ~0.8 and strip spans
    below it. Only docs with >= 1 duplicated span appear.
    ``max_window_df`` passes through to ``duplicated_spans`` (hot-window
    skew cap — see its docstring for the exact semantics)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^\w]+"),
                    lambda t: t != "")
    sizes = docs.select(F.col(id_col).alias("doc_id"),
                        F.size(toks).alias("n_tokens"))
    spans = duplicated_spans(docs, min_len, text_col, id_col, hashed,
                             max_window_df=max_window_df)
    return (spans.groupBy("doc_id")
            .agg(F.count("*").alias("n_spans"),
                 F.sum("span_len").alias("dup_tokens"),
                 F.max("span_len").alias("max_span_len"))
            .join(sizes, "doc_id")
            .withColumn("dup_frac",
                        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6)))
