"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (training-pipeline extensions).

All four are pure built-in column expressions (JVM-side, whole-stage
codegen) — no Python in the hot path. That is deliberate: at 100 TB these
run as map-only stages fused into the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from xltsearch_spark.analyzers import ENGLISH_STOP_WORDS
from xltsearch_spark.operators._parallel import (
    JVM_MIN_BYTES_PER_PARTITION, ensure_min_parallelism)

# tiny per-language marker lexicons (deterministic heuristic language-ID;
# real models would be a broadcast lookup or an Arrow UDF over a fastText
# model — the Spark plumbing is identical)
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es": ("el", "la", "los", "las", "es", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "les", "est", "et", "que", "des", "une", "dans", "pour"),
}


def tokens_expr(col: Column) -> Column:
    """Whitespace+punctuation tokens, lowercased (BPE-ish regex splitter)."""
    return F.filter(F.split(F.lower(col), r"[^\w']+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_ws_tokens): regex tokens + raw whitespace split."""
    return df.select(
        "doc_id",
        F.size(tokens_expr(F.col(text_col))).alias("n_tokens"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
        .alias("n_ws_tokens"))


def quality_struct(text_col: Column) -> Column:
    """All quality features + composite score as ONE struct expression —
    composable into single-pass pipelines (operators/curation.py) without
    a join per signal. Field math is the contract `quality_scores` has
    always exposed; that function now just unpacks this struct."""
    toks = tokens_expr(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    stopword_ratio = n_stop / safe_tok
    punct_ratio = n_punct / safe_chars
    alpha_ratio = n_alpha / safe_chars
    distinct_ratio = n_distinct / safe_tok
    score = (F.when(n_tok < 5, 0.0).otherwise(
        0.25 * F.least(stopword_ratio * F.lit(4.0), F.lit(1.0))
        + 0.25 * alpha_ratio
        + 0.25 * distinct_ratio
        + 0.25 * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))))
    return F.struct(
        n_tok.alias("n_tokens"),
        (n_chars / safe_tok).alias("mean_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        F.round(score, 6).alias("quality"))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in one projection:
    doc length, mean word length, stopword ratio, punctuation density,
    alpha ratio, repetition (distinct/total tokens)."""
    q = quality_struct(F.col(text_col))
    return ensure_min_parallelism(df, "doc_id",
                           min_bytes=JVM_MIN_BYTES_PER_PARTITION).select(
        "doc_id",
        *[q[f].alias(f) for f in
          ("n_tokens", "mean_token_len", "stopword_ratio", "punct_ratio",
           "alpha_ratio", "distinct_ratio", "quality")])


def lang_struct(text_col: Column) -> Column:
    """struct(pred_lang, lang_score): argmax of marker-word hit ratios as
    one composable expression. Deterministic tie-break on language code
    (array_max compares (s, l) lexicographically)."""
    toks = tokens_expr(text_col)
    safe = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        marr = F.array(*[F.lit(m) for m in markers])
        ratio = F.size(F.filter(toks, lambda t: F.array_contains(marr, t))) / safe
        scores.append(F.struct(ratio.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return F.struct(best["l"].alias("pred_lang"),
                    F.round(best["s"], 6).alias("lang_score"))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax of marker-word hit ratios.
    Deterministic tie-break on language code."""
    lg = lang_struct(F.col(text_col))
    return ensure_min_parallelism(df, "doc_id",
                           min_bytes=JVM_MIN_BYTES_PER_PARTITION).select(
        "doc_id", lg["pred_lang"].alias("pred_lang"),
        lg["lang_score"].alias("lang_score"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): 64-bit content fingerprint = xxhash64 of the
    token-normalized text (whitespace/case canonicalized) — the cheap
    near-exact-dup key (formatting-insensitive, content-sensitive)."""
    canon = F.array_join(tokens_expr(F.col(text_col)), " ")
    return df.select("doc_id", F.xxhash64(canon).alias("fingerprint"))


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, Table A1 — public
    methodology; these are the filters production pretraining pipelines
    apply before training):

    * ``n_lines``            — non-empty (trimmed) lines
    * ``dup_line_frac``      — fraction of lines whose text repeats an
                               earlier line (1 - distinct/total)
    * ``dup_line_char_frac`` — fraction of line characters sitting in
                               lines whose text occurs more than once
    * ``top_2gram``          — the most frequent word 2-gram (ties break
                               to the lexicographically smallest)
    * ``top_2gram_char_frac``— characters covered by occurrences of that
                               2-gram (count x non-space gram length)
                               over total document characters

    Scale shape: line stats need per-(doc, line) occurrence counts, so the
    lines explode once and aggregate in two partial-agg friendly levels
    (shuffle key = doc_id; an in-row higher-order alternative would be
    O(lines^2) per doc). The 2-gram stats build the gram array with
    zip_with (map-only) and reuse the same two-level aggregate. Every doc
    survives (left join back), zeros for empty docs.
    """
    ln = F.filter(F.transform(F.split(F.col(text_col), "\n"),
                              lambda x: F.trim(x)), lambda x: x != "")
    base = df.select("doc_id",
                     F.length(F.col(text_col)).alias("total_chars"),
                     ln.alias("lines"))
    per_line = (base.select("doc_id", F.explode("lines").alias("line"))
                .groupBy("doc_id", "line")
                .agg(F.count("*").alias("cnt")))
    line_stats = (per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.length("line"))
              .otherwise(0)).alias("dup_line_chars")))
    toks = tokens_expr(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.zip_with(F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))),
                   F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (df.select("doc_id", F.explode(grams).alias("gram"))
                .groupBy("doc_id", "gram").agg(F.count("*").alias("cnt")))
    # argmax with smallest-gram tie-break: min of (-cnt, gram)
    top_gram = (per_gram.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg_cnt"),
                       F.col("gram").alias("gram"))).alias("top")))
    out = (df.select("doc_id", F.length(F.col(text_col)).alias("total_chars"))
           .join(line_stats, "doc_id", "left")
           .join(top_gram, "doc_id", "left"))
    safe_lines = F.greatest(F.col("n_lines"), F.lit(1))
    safe_line_chars = F.greatest(F.col("line_chars"), F.lit(1))
    safe_chars = F.greatest(F.col("total_chars"), F.lit(1))
    top_cnt = -F.col("top.neg_cnt")
    # covered chars count the gram's non-space characters per occurrence
    # — same accounting as the public Gopher-filter implementations.
    # Occurrences of a self-overlapping 2-gram share their middle token,
    # so the raw product can exceed total_chars ("aa aa aa aa": top gram
    # "aa aa" occurs 3x); the fraction is clamped to 1.0 so consumers
    # can rely on a true [0, 1] range (the clamp only engages in that
    # degenerate all-repetition regime, where 1.0 is the honest signal).
    top_chars = top_cnt * (F.length(F.col("top.gram")) - 1)
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce((F.col("n_lines") - F.col("n_distinct_lines")) / safe_lines,
                   F.lit(0.0)).alias("dup_line_frac"),
        F.coalesce(F.col("dup_line_chars") / safe_line_chars,
                   F.lit(0.0)).alias("dup_line_char_frac"),
        F.col("top.gram").alias("top_2gram"),
        F.least(F.coalesce(top_chars / safe_chars, F.lit(0.0)),
                F.lit(1.0)).alias("top_2gram_char_frac"))


def unigram_lm(df: DataFrame, text_col: str = "text",
               vocab_size: int = 4096, alpha: float = 1.0):
    """Corpus unigram language model: the ``vocab_size`` most frequent
    tokens (ties broken by term ascending — deterministic) with
    Laplace-smoothed natural log-probs, p(t) = (c_t + alpha) /
    (total + alpha * (vocab_size + 1)); the reserved +1 slot is the
    out-of-vocabulary bucket, whose log-prob is returned separately.

    Scale shape: ONE token-count shuffle (map-side combined), a 1-row
    total aggregate, and a TakeOrdered(vocab_size) over the counts — the
    vocabulary never exceeds ``vocab_size`` rows, so the scorer can
    broadcast it no matter the corpus size.

    Returns (vocab DataFrame (term, logp), oov_logp float)."""
    import math
    toks = df.select(F.explode(tokens_expr(F.col(text_col))).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    counts = counts.persist()
    total = int(counts.agg(F.sum("c")).collect()[0][0] or 0)
    denom = float(total + alpha * (vocab_size + 1))
    vocab = (counts.orderBy(F.desc("c"), F.asc("term")).limit(vocab_size)
             .select("term",
                     F.log((F.col("c") + F.lit(alpha)) / F.lit(denom))
                     .alias("logp")))
    return vocab, math.log(alpha / denom)


def lm_quality_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", vocab_size: int = 4096,
                      alpha: float = 1.0, lm=None) -> DataFrame:
    """CCNet-style unigram-LM quality signal (Wenzek et al. 2020 score
    documents by LM perplexity and filter/bucket on it — public
    methodology; CCNet uses KenLM 5-grams, the unigram model here keeps
    the pipeline dependency-free while the plumbing — corpus-fit LM,
    broadcast scoring — is identical):

    (doc_id, n_tokens, oov_frac, avg_nll) for EVERY input doc —
    ``avg_nll`` is the mean negative log-likelihood per token (lower =
    more natural relative to the corpus; exp(avg_nll) is the perplexity
    proxy), ``oov_frac`` the fraction of tokens outside the top-
    ``vocab_size`` vocabulary. Zero-token docs keep n_tokens=0 and NULL
    scores. Pass ``lm=(vocab_df, oov_logp)`` to score against a model
    fitted on a REFERENCE corpus (the CCNet setup: fit on trusted text,
    score the crawl); default fits on ``df`` itself.

    Scale shape: the fit is one count shuffle; scoring is explode →
    broadcast hash join against the ≤ vocab_size vocabulary → one
    doc-keyed aggregate. No Python anywhere."""
    vocab, oov_logp = lm if lm is not None else \
        unigram_lm(df, text_col, vocab_size, alpha)
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens_expr(F.col(text_col))).alias("term"))
    per = (toks.join(F.broadcast(vocab), "term", "left")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_tokens"),
                F.sum(F.when(F.col("logp").isNull(), 1).otherwise(0))
                .alias("n_oov"),
                F.sum(F.coalesce(F.col("logp"), F.lit(oov_logp)))
                .alias("ll")))
    base = df.select(F.col(id_col).alias("doc_id"))
    return (base.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
                    (F.col("n_oov") / F.col("n_tokens")).alias("oov_frac"),
                    (-F.col("ll") / F.col("n_tokens")).alias("avg_nll")))


# Gopher quality-rule tier (Rae et al. 2021, arXiv:2112.11446 Table A1 —
# public methodology). Stop list is the paper's own 8-word set.
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_struct(text_col: Column) -> Column:
    """All Gopher document-quality signals + per-rule flags as ONE struct
    expression (pure JVM, fuses into the scan like `quality_struct`):

    * ``n_words``           — whitespace words; rule: 50 <= n <= 100,000
    * ``mean_word_len``     — rule: 3 <= mean <= 10
    * ``symbol_ratio``      — ('#' + ellipsis occurrences) / words <= 0.1
    * ``bullet_line_frac``  — lines starting with a bullet <= 0.9
    * ``ellipsis_line_frac``— lines ending with an ellipsis <= 0.3
    * ``alpha_word_frac``   — words containing a letter >= 0.8
    * ``stop_word_hits``    — distinct Gopher stop words present >= 2

    ``gopher_pass`` is the conjunction. Flags (not a filtered frame) so a
    curation pipeline can audit which rule fired; thresholds are the
    paper's. NULL text is gated to '' (fails words_ok) rather than
    propagating NULL flags (the ADVICE r4 null-text lesson)."""
    t = F.coalesce(text_col, F.lit(""))
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_w = F.greatest(n_words, F.lit(1))
    sum_len = F.aggregate(words, F.lit(0),
                          lambda acc, w: acc + F.length(w))
    mean_word_len = sum_len / safe_w
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    # ellipsis occurrences: actual "..." sequences (NOT total periods / 3 —
    # scattered sentence/decimal dots must not count) + Unicode ellipsis
    n_ellip = (F.floor((F.length(t)
                        - F.length(F.regexp_replace(t, r"\.\.\.", "")))
                       / F.lit(3))
               + F.length(t) - F.length(F.regexp_replace(t, "…", "")))
    symbol_ratio = (n_hash + n_ellip) / safe_w
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    safe_l = F.greatest(n_lines, F.lit(1))
    bullet_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^[•‣▪*-]")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    low = F.lower(t)
    stop_hits = sum(
        (F.when(low.rlike(rf"\b{w}\b"), 1).otherwise(0)
         for w in GOPHER_STOP_WORDS), start=F.lit(0))
    bullet_frac = bullet_lines / safe_l
    ellip_frac = ellipsis_lines / safe_l
    alpha_frac = alpha_words / safe_w
    rules = [
        ("words_ok", (n_words >= 50) & (n_words <= 100000)),
        ("mean_len_ok", (mean_word_len >= 3.0) & (mean_word_len <= 10.0)),
        ("symbol_ok", symbol_ratio <= 0.1),
        ("bullet_ok", bullet_frac <= 0.9),
        ("ellipsis_ok", ellip_frac <= 0.3),
        ("alpha_ok", alpha_frac >= 0.8),
        ("stop_ok", stop_hits >= 2),
    ]
    gopher_pass = rules[0][1]
    for _, r in rules[1:]:
        gopher_pass = gopher_pass & r
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellip_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_word_hits"),
        *[r.cast("int").alias(name) for name, r in rules],
        gopher_pass.cast("int").alias("gopher_pass"))


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, <gopher signals + flags>) — unpacked `gopher_struct`."""
    return (ensure_min_parallelism(df, "doc_id",
                           min_bytes=JVM_MIN_BYTES_PER_PARTITION)
            .withColumn("_g", gopher_struct(F.col(text_col)))
            .select("doc_id", "_g.*"))


def ppl_buckets(df: DataFrame, text_col: str = "text",
                vocab_size: int = 4096, spread: float = 0.25,
                lm=None) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020:
    score the crawl with a reference LM, split into quality tiers, train
    preferentially on the low-perplexity 'head').

    (doc_id, n_tokens, avg_nll, bucket): ``head`` when avg_nll <=
    mean - spread*std, ``tail`` when avg_nll > mean + spread*std,
    ``middle`` between; zero-token docs keep a NULL bucket. CCNet cuts
    at corpus TERCILES; this uses moment-based cutoffs (mean ± spread·σ
    over the scored docs) so the thresholds come from ONE tiny aggregate
    instead of a corpus-wide sort/percentile — the documented deviation
    that keeps the 100-TB plan sort-free. Variance uses the explicit
    E[x²] − E[x]² form so an external oracle can reproduce it verbatim.

    Scale shape: the LM scoring of :func:`lm_quality_scores` (one count
    shuffle + broadcast-scored aggregate) + a 1-row moment aggregate +
    a map-only CASE. Pass ``lm=`` to score against a reference-corpus
    model, exactly like ``lm_quality_scores``."""
    scored = lm_quality_scores(df, text_col, vocab_size=vocab_size, lm=lm)
    scored = scored.persist()
    m = scored.filter(F.col("avg_nll").isNotNull()).agg(
        F.sum("avg_nll").alias("s"),
        F.sum(F.col("avg_nll") * F.col("avg_nll")).alias("s2"),
        F.count("*").alias("n")).collect()[0]
    if not m["n"]:
        return scored.withColumn("bucket", F.lit(None).cast("string"))
    mean = m["s"] / m["n"]
    var = m["s2"] / m["n"] - mean * mean
    std = math.sqrt(max(var, 0.0))
    lo, hi = mean - spread * std, mean + spread * std
    bucket = (F.when(F.col("avg_nll").isNull(), F.lit(None).cast("string"))
              .when(F.col("avg_nll") <= F.lit(lo), "head")
              .when(F.col("avg_nll") > F.lit(hi), "tail")
              .otherwise("middle"))
    return scored.withColumn("bucket", bucket)


def vocab_stats(df: DataFrame, text_col: str = "text",
                top_n: int = 50) -> DataFrame:
    """(term, df, tf) for the ``top_n`` highest-document-frequency terms
    (ties break term-ascending) — the corpus vocabulary profile a
    training pipeline reads before choosing stop lists, tokenizer vocab
    coverage, or `max_shingle_df`-style hot-term caps.

    Scale shape: explode → ONE (term, doc_id) pre-aggregate (map-side
    combined, so a hot term contributes one row per partition, not one
    per occurrence) → per-term aggregate → TakeOrdered(top_n). The
    result is bounded at ``top_n`` rows regardless of corpus size."""
    toks = df.select("doc_id",
                     F.explode(tokens_expr(F.col(text_col))).alias("term"))
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    agg = per_doc.groupBy("term").agg(F.count("*").alias("df"),
                                      F.sum("c").alias("tf"))
    return agg.orderBy(F.desc("df"), F.asc("term")).limit(top_n)


def _bigram_pairs(toks: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs (overlapping)."""
    return F.filter(
        F.zip_with(toks,
                   F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        lambda p: p["w2"].isNotNull())


def stupid_backoff_scores(df: DataFrame, ref: DataFrame, alpha: float = 0.4,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Stupid Backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the web-scale LM built for
    exactly this setting: counts, not normalized probabilities): fit
    bigram/unigram counts on ``ref`` (the trusted corpus), score every
    doc in ``df`` by the mean log score over its adjacent token pairs,

        S(w2 | w1) = c2(w1 w2) / c1(w1)              if the bigram is seen
                   = alpha * (c1(w2) + 1) / (T + V + 1)   otherwise

    where T = ref token count, V = ref vocabulary size. The unseen
    branch add-one-smooths the unigram so unseen WORDS also get a finite
    score (documented deviation from the paper, which leaves the OOV
    floor to the application). Returns (doc_id, n_bigrams, sb_score)
    with NULL score for docs having < 2 tokens.

    Scale shape: two map-side-combined count aggregates over the ref
    (bigram table is ref-sized, unigram vocabulary-sized), then two
    equi-joins from the doc pair stream (AQE picks broadcast when the
    ref fits) and ONE doc-keyed aggregate. T and V are the only driver
    values (2 ints). No Python anywhere."""
    rtoks = ref.select(tokens_expr(F.col(text_col)).alias("toks"))
    uni = (rtoks.select(F.explode("toks").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c1")).persist())
    tv = uni.agg(F.sum("c1"), F.count("*")).collect()[0]
    t_total, v_size = int(tv[0] or 0), int(tv[1])
    bi = (rtoks.select(F.explode(_bigram_pairs(F.col("toks"))).alias("p"))
          .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
          .agg(F.count("*").alias("c2")))
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_bigram_pairs(tokens_expr(F.col(text_col)))).alias("p"))
    scored = (pairs
              .join(bi, (F.col("p.w1") == bi.w1) & (F.col("p.w2") == bi.w2),
                    "left")
              .join(uni.withColumnRenamed("w", "_w1")
                    .withColumnRenamed("c1", "c1_prev"),
                    F.col("p.w1") == F.col("_w1"), "left")
              .join(uni.withColumnRenamed("w", "_w2")
                    .withColumnRenamed("c1", "c1_cur"),
                    F.col("p.w2") == F.col("_w2"), "left"))
    s = F.when(F.col("c2").isNotNull(), F.col("c2") / F.col("c1_prev")) \
        .otherwise(F.lit(alpha) * (F.coalesce(F.col("c1_cur"), F.lit(0))
                                   + F.lit(1))
                   / F.lit(float(t_total + v_size + 1)))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.col("p.w1")).alias("n_bigrams"),
                 F.avg(F.when(F.col("p.w1").isNotNull(), F.log(s)))
                 .alias("sb_score"))
            .withColumn("n_bigrams", F.col("n_bigrams").cast("long")))
