"""Distributed BPE tokenizer training: byte-pair-encoding merge
induction over a corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public methodology; the
algorithm every GPT/Llama-family tokenizer trains with).

Per merge round: count every adjacent symbol pair across the corpus
(weighted by word frequency, overlapping occurrences counted — Sennrich's
``get_stats``), pick the most frequent pair (ties: count desc, left asc,
right asc — deterministic), fuse it greedily left-to-right in every word
(Sennrich's ``merge_vocab``: non-overlapping, leftmost-first), repeat.

Scale shape: training runs over the WORD-FREQUENCY table, not the raw
corpus — one token-count shuffle up front and the working set is the
distinct vocabulary (tiny vs corpus size; Zipf guarantees it grows
sublinearly). Each round is one map-side-combined pair-count aggregate +
a TakeOrdered(1) + a map-only higher-order fold that rewrites the symbol
arrays in place — no Python rows, no per-round shuffle of the corpus.
The driver collects exactly ONE row per round (the argmax pair), the
same bounded pattern as k-means (similarity.py) and the packing prefix
sum. ``n_merges`` is the vocabulary budget (30k-100k in production);
rounds are sequential by definition — BPE merge r+1 depends on r.

The fold is exact greedy-leftmost: state (out, pend) consumes one symbol
at a time; a run like ``aaa`` under pair (a,a) yields ``[aa, a]`` — the
pair that just merged never re-merges with the following symbol inside
the same round, exactly like the reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from xltsearch_spark.operators.textstats import tokens_expr


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — ONE map-combined shuffle; every
    training round after this touches only the vocabulary table."""
    return (df.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word freq."""
    syms = F.col("syms")
    pairs = F.filter(
        F.zip_with(syms,
                   F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                   lambda x, y: F.struct(x.alias("l"), y.alias("r"))),
        lambda p: p["r"].isNotNull())
    return (words.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt")))


def _merge_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping fuse of (left, right) in a symbol
    array — a pure JVM higher-order fold (state: emitted prefix + one
    pending symbol)."""
    fused = left + right
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit(None).cast("string").alias("pend"))

    def step(acc, x):
        return (F.when(acc["pend"].isNull(),
                       F.struct(acc["out"].alias("out"), x.alias("pend")))
                .when((acc["pend"] == F.lit(left)) & (x == F.lit(right)),
                      F.struct(F.concat(acc["out"], F.array(F.lit(fused)))
                               .alias("out"),
                               F.lit(None).cast("string").alias("pend")))
                .otherwise(F.struct(F.concat(acc["out"], F.array(acc["pend"]))
                                    .alias("out"), x.alias("pend"))))

    return F.aggregate(
        syms, init, step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["pend"]))))


def bpe_train(df: DataFrame, n_merges: int,
              text_col: str = "text") -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right,
    pair_count)] in training order (rank 1-based). Stops early when no
    adjacent pair remains (fully merged vocabulary)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = (word_counts(df, text_col)
             .select("freq", F.split("word", "").alias("syms")))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        words = words.persist()
        best = (_pair_counts(words)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best:
            words.unpersist()
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        nxt = words.select("freq",
                           _merge_expr(F.col("syms"), l, r).alias("syms"))
        if rank % 16 == 0:
            # folds nest one inside the other across rounds; pin the
            # materialized vocabulary periodically so plan depth stays
            # bounded at production merge budgets (30k+ rounds)
            nxt = nxt.localCheckpoint(eager=True)
        words.unpersist()
        words = nxt
    return merges


def bpe_merges_df(df: DataFrame, n_merges: int,
                  text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame:
    (merge_rank, left, right, pair_count)."""
    rows = bpe_train(df, n_merges, text_col)
    return df.sparkSession.createDataFrame(
        rows, "merge_rank long, left string, right string, pair_count long")


def _encode_word(word: str, sym_merges: dict, cache: dict) -> list[str]:
    """Encode ONE word by applying merges in rank order (greedy leftmost
    non-overlapping per merge) — semantics identical to chaining
    ``_merge_expr`` per rank, but only merges that can actually fire are
    visited: candidates enter a rank-ordered heap when both their sides
    exist in the word's current symbol set. A candidate popped with rank
    below the last applied rank is skipped (sequentially it was a no-op at
    its own turn), and pop-time membership re-checks reproduce the exact
    sequential state. O(applied + candidates) instead of O(n_merges) per
    word."""
    import heapq
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    present = set(syms)
    heap: list = []
    pushed = set()

    def add_candidates(sym):
        for item in sym_merges.get(sym, ()):
            rank, l, r = item
            if rank not in pushed and l in present and r in present:
                pushed.add(rank)
                heapq.heappush(heap, item)

    for s in set(syms):
        add_candidates(s)
    max_rank = -1
    while heap:
        rank, l, r = heapq.heappop(heap)
        if rank < max_rank or l not in present or r not in present:
            continue  # stale: was a no-op at its sequential turn
        max_rank = rank
        fused = l + r
        out = []
        i, n, applied = 0, len(syms), False
        while i < n:
            if i < n - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(fused)
                i += 2
                applied = True
            else:
                out.append(syms[i])
                i += 1
        if applied:
            syms = out
            present = set(syms)
            add_candidates(fused)
    cache[word] = syms
    return syms


def apply_merges(df: DataFrame, merges: list[tuple[int, str, str, int]],
                 text_col: str = "text", id_col: str = "doc_id",
                 expr_max_merges: int = 64) -> DataFrame:
    """Segment documents with a learned merge list: (doc_id, pieces).

    Applies merges in rank order — the deploy-side BPE encoder. Up to
    ``expr_max_merges`` merges the whole chain is ONE map-only composed
    expression (no shuffle, no Python). Past that the nested folds would
    blow analyzer/codegen limits long before data size matters (one
    ``F.aggregate`` per merge, nested ``n_merges`` deep — a production
    30k-merge vocabulary is thousands of times over the limit), so the
    encoder switches to the same merges as a driver-side list riding the
    task closure into an Arrow-batched encoder: per batch, distinct words
    are encoded ONCE through a rank-heap that visits only merges whose
    sides exist in the word (exactly the sequential rank-order semantics
    — see ``_encode_word``), then mapped back. Still map-only, no
    shuffle; plan size is O(1) in the merge count."""
    toks = tokens_expr(F.col(text_col))
    ordered = [(rank, l, r) for rank, l, r, _ in sorted(merges)]
    if len(ordered) <= expr_max_merges:
        def encode(word):
            syms = F.split(word, "")
            for _, l, r in ordered:
                syms = _merge_expr(syms, l, r)
            return syms
        return df.select(F.col(id_col).alias("doc_id"),
                         F.flatten(F.transform(toks, encode)).alias("pieces"))

    import re
    import pandas as pd
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)
    # tokenizer parity with tokens_expr: Java \w is ASCII — re.ASCII matches
    tok_re = re.compile(r"[^\w']+", re.ASCII)
    sym_merges: dict[str, list] = {}
    for rank, l, r in ordered:
        sym_merges.setdefault(l, []).append((rank, l, r))
        if r != l:
            sym_merges.setdefault(r, []).append((rank, l, r))
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("pieces", ArrayType(StringType()))])

    def encode_batches(it):
        cache: dict[str, list[str]] = {}
        for pdf in it:
            texts = pdf[text_col].fillna("").str.lower()
            pieces = []
            for t in texts:
                words = [w for w in tok_re.split(t) if w]
                row: list[str] = []
                for w in words:
                    row.extend(_encode_word(w, sym_merges, cache))
                pieces.append(row)
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                "pieces": pieces})

    return df.select(id_col, text_col).mapInPandas(encode_batches,
                                                   schema=schema)
