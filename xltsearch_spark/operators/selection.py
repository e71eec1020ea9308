"""DSIR data selection: importance-resampling weights for pretraining
corpora (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169 — public methodology).

DSIR scores every raw document by how much more likely its n-gram
features are under a TARGET distribution (a trusted / in-domain corpus)
than under the RAW source distribution, then resamples by those weights.
Both distributions are bag-of-n-grams models fitted over a shared
feature space; the per-doc log importance weight is

    log w(x) = sum_{g in grams(x)} [ log p_target(g) - log p_source(g) ]

Two feature spaces, same math:

- ``features="vocab"``: an explicit shared vocabulary — the top
  ``vocab_size`` grams of the SOURCE corpus by (count desc, gram asc),
  Laplace-smoothed with a reserved out-of-vocabulary slot exactly like
  :func:`textstats.unigram_lm`. Fully oracle-checkable (the driver SQL
  refits the identical model), and the form the tests pin.
- ``features="hashed"``: the paper's hashed bag-of-n-grams — grams hash
  into ``n_buckets`` buckets (xxhash64, fixed seed) so the feature space
  is bounded with NO vocabulary fit pass. This is the 100-TB path: the
  bucket-count tables are ``n_buckets`` rows regardless of corpus size.

Scale shape (both variants): two token-count shuffles (source + target,
map-side combined), a bounded model (≤ vocab_size + 1 rows / n_buckets
rows) broadcast to a map-only scoring join, one doc-keyed aggregate.
No Python in any path; weights never require a global sort.

Selection: the paper draws Gumbel-top-k by weight. A global top-k FLAG
is a total order — at 100 TB the honest shape is a weight THRESHOLD
estimated from a sample, then a map-only filter; :func:`dsir_select`
implements that (threshold from an exact aggregate at test scale,
documented sample-quantile at fleet scale).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from xltsearch_spark.operators.textstats import tokens_expr


def grams_expr(text_col: Column) -> Column:
    """Unigram + word-bigram features of a document as ONE array column
    (bigrams are space-joined token pairs). Pure JVM expression."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    # zip_with pads the shorter side with null -> concat(null) is null ->
    # filter drops it; slice start=2 shifts by one token for the pair
    bi = F.filter(
        F.zip_with(toks,
                   F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                   lambda x, y: F.concat(x, F.lit(" "), y)),
        lambda g: g.isNotNull())
    return F.concat(toks, bi)


def _gram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(gram, c) counts over the corpus — one map-side-combined shuffle."""
    return (df.select(F.explode(grams_expr(F.col(text_col))).alias("gram"))
            .groupBy("gram").agg(F.count("*").alias("c")))


def dsir_weights(df: DataFrame, target: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", vocab_size: int = 8192,
                 alpha: float = 1.0, features: str = "vocab",
                 n_buckets: int = 10_000) -> DataFrame:
    """Per-document DSIR log importance weights.

    Returns (doc_id, n_grams, log_w) for every row of ``df`` (the raw
    source corpus); ``target`` is the trusted in-domain corpus the
    selection steers toward. Zero-gram docs keep n_grams=0 and NULL
    log_w. ``log_w`` is the raw (unnormalized) log importance weight —
    resampling only needs weights up to a constant.

    ``features="vocab"``: shared explicit vocabulary = top ``vocab_size``
    SOURCE grams (count desc, gram asc); each side is Laplace-smoothed
    over vocab + 1 OOV slot with its OWN total mass, mirroring
    ``unigram_lm``'s denominator shape:
        p(g) = (c_g + alpha) / (total + alpha * (vocab_size + 1)).

    ``features="hashed"``: grams -> pmod(xxhash64(gram), n_buckets); the
    same smoothing over the bucket ids (every bucket is in-vocabulary,
    so no OOV slot: denom = total + alpha * n_buckets).
    """
    if features not in ("vocab", "hashed"):
        raise ValueError(f"unknown features mode: {features!r}")

    if features == "hashed":
        def bucket(col):
            return F.pmod(F.xxhash64(col), F.lit(n_buckets))
        src = (df.select(F.explode(grams_expr(F.col(text_col))).alias("g"))
               .select(bucket("g").alias("gram"))
               .groupBy("gram").agg(F.count("*").alias("c")))
        tgt = (target.select(
                   F.explode(grams_expr(F.col(text_col))).alias("g"))
               .select(bucket("g").alias("gram"))
               .groupBy("gram").agg(F.count("*").alias("c")))
        src = src.persist()
        tgt = tgt.persist()
        total_s = int(src.agg(F.sum("c")).collect()[0][0] or 0)
        total_t = int(tgt.agg(F.sum("c")).collect()[0][0] or 0)
        denom_s = float(total_s + alpha * n_buckets)
        denom_t = float(total_t + alpha * n_buckets)
        model = (src.join(tgt.withColumnRenamed("c", "ct"), "gram", "outer")
                 .select("gram",
                         (F.log((F.coalesce(F.col("ct"), F.lit(0))
                                 + F.lit(alpha)) / F.lit(denom_t))
                          - F.log((F.coalesce(F.col("c"), F.lit(0))
                                   + F.lit(alpha)) / F.lit(denom_s)))
                         .alias("dlogp")))
        # a bucket absent from BOTH counts still scores: constant ratio
        oov_dlogp = math.log(alpha / denom_t) - math.log(alpha / denom_s)
        doc_grams = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(grams_expr(F.col(text_col))).alias("g")).select(
            "doc_id", bucket("g").alias("gram"))
    else:
        src = _gram_counts(df, text_col).persist()
        tgt = _gram_counts(target, text_col).persist()
        total_s = int(src.agg(F.sum("c")).collect()[0][0] or 0)
        total_t = int(tgt.agg(F.sum("c")).collect()[0][0] or 0)
        denom_s = float(total_s + alpha * (vocab_size + 1))
        denom_t = float(total_t + alpha * (vocab_size + 1))
        vocab = src.orderBy(F.desc("c"), F.asc("gram")).limit(vocab_size)
        model = (vocab.join(tgt.withColumnRenamed("c", "ct"), "gram", "left")
                 .select("gram",
                         (F.log((F.coalesce(F.col("ct"), F.lit(0))
                                 + F.lit(alpha)) / F.lit(denom_t))
                          - F.log((F.col("c") + F.lit(alpha))
                                  / F.lit(denom_s))).alias("dlogp")))
        oov_dlogp = math.log(alpha / denom_t) - math.log(alpha / denom_s)
        doc_grams = df.select(F.col(id_col).alias("doc_id"),
                              F.explode(grams_expr(F.col(text_col)))
                              .alias("gram"))

    per = (doc_grams.join(F.broadcast(model), "gram", "left")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_grams"),
                F.sum(F.coalesce(F.col("dlogp"), F.lit(oov_dlogp)))
                .alias("log_w")))
    base = df.select(F.col(id_col).alias("doc_id"))
    return (base.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                    F.col("log_w")))


def dsir_select(weights: DataFrame, fraction: float,
                exact: bool = True) -> DataFrame:
    """Keep-flag the top ``fraction`` of docs by DSIR weight.

    ``exact=True`` (test scale): the threshold is the exact
    (1 - fraction) quantile of log_w via a distributed sort-based
    percentile aggregate — deterministic, but the aggregate materializes
    the weight column; fine to ~10^9 rows.

    ``exact=False`` (fleet scale): approx_percentile estimates the
    threshold from sketches (one pass, bounded memory), then the same
    map-only flag — the paper's Gumbel-top-k is likewise
    threshold-by-estimate at scale. NULL-weight (empty) docs never pass.
    Ties AT the threshold are kept (>=), so the selected count can
    slightly exceed ceil(fraction * n) under ties — documented.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    q = 1.0 - fraction
    fn = "percentile" if exact else "approx_percentile"
    thr_row = weights.agg(
        F.expr(f"{fn}(log_w, {q!r})").alias("thr")).collect()[0]
    thr = thr_row["thr"]
    if thr is None:  # all-NULL weights (empty corpus)
        return weights.withColumn("selected", F.lit(0))
    return weights.withColumn(
        "selected",
        F.when(F.col("log_w") >= F.lit(float(thr)), 1).otherwise(0))
