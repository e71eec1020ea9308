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


def apply_merges(df: DataFrame, merges: list[tuple[int, str, str, int]],
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Segment documents with a learned merge list: (doc_id, pieces).

    Applies merges in rank order — the deploy-side BPE encoder. The whole
    chain is ONE map-only composed expression (no shuffle, no Python):
    tokenization at 100 TB is embarrassingly parallel once the merge
    table (a driver-side list, <= vocab-budget entries) is compiled in."""
    toks = tokens_expr(F.col(text_col))
    def encode(word):
        syms = F.split(word, "")
        for _, l, r, _ in sorted(merges):
            syms = _merge_expr(syms, l, r)
        return syms
    return df.select(F.col(id_col).alias("doc_id"),
                     F.flatten(F.transform(toks, encode)).alias("pieces"))
