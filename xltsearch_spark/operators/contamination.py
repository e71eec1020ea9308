"""Benchmark decontamination — train/test n-gram overlap flagging.

Standard practice for pretraining corpora (public methodology: GPT-3 /
PaLM / Llama reports all describe removing training documents that share
long word n-grams with evaluation benchmarks). This operator flags every
corpus document sharing at least one word ``n``-gram with a benchmark set
and reports how many distinct shingles overlap.

Scale shape (the part that matters at 100 TB):

* the CORPUS side never shuffles its shingles — grams are built with
  map-only higher-order expressions (split -> zip/slice), exploded, and
  immediately joined against the BROADCAST benchmark shingle set; only
  the surviving (doc_id, shingle-hit) rows reach the per-doc aggregate
  (partial-agg map-side combine on doc_id).
* the benchmark side is tiny by definition (eval sets are thousands of
  rows, not billions) — distinct shingles broadcast comfortably. For a
  pathological benchmark too big to broadcast, drop the explicit
  ``F.broadcast`` and AQE plans a shuffle join; semantics identical.
* everything is pure JVM column expressions / joins — no Python workers,
  and shingles join as STRINGS, so the DuckDB oracle is byte-identical
  (no hash-collision caveat needed).

Tokenization matches the dedup family: lowercase ``\\w+`` runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _gram_array(text_col: Column, n: int) -> Column:
    """Distinct word n-grams of a text column as 'w1 w2 ... wn' strings —
    map-only (split + per-index slice/join), no explode until the caller
    chooses to."""
    toks = F.filter(F.split(F.lower(text_col), r"[^\w]+"),
                    lambda t: t != "")
    k = F.size(toks) - n + 1
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def benchmark_shingles(benchmark: DataFrame, n: int = 8,
                       text_col: str = "text") -> DataFrame:
    """DISTINCT word n-grams of the benchmark set: one small relation,
    built once and reusable across corpus passes."""
    return (benchmark
            .select(F.explode(_gram_array(F.col(text_col), n)).alias("shingle"))
            .distinct())


def jaccard_contamination(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                          threshold: float = 0.5, text_col: str = "text",
                          id_col: str = "doc_id",
                          bench_id_col: str = "doc_id",
                          bench_text_col: str = "text") -> DataFrame:
    """(id, max_jaccard, matched_benchmark, contaminated): exact word
    n-gram Jaccard of every corpus doc against EVERY benchmark item, max
    over the benchmark — the FUZZY decontamination tier (public
    methodology: GPT-3 / Llama reports describe near-duplicate overlap
    flagging, not just single-shingle hits; a reworded or truncated eval
    item scores high Jaccard while sharing few exact long grams).

    Computed exactly (no LSH recall caveat) precisely because the
    benchmark side is small by definition: benchmark grams AND sizes
    broadcast; corpus grams are map-only and meet them in a broadcast
    join, so corpus shingles never shuffle. The only aggregates are the
    (doc, bench) intersection count and the per-doc ``max_by`` — both
    with map-side partials. Ties on Jaccard pick the smallest benchmark
    id (deterministic)."""
    bench_g = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(_gram_array(F.col(bench_text_col), n)).alias("shingle"))
    bench_sz = bench_g.groupBy("bench_id").agg(F.count("*").alias("sz_b"))
    doc_g = docs.select(
        F.col(id_col),
        F.explode(_gram_array(F.col(text_col), n)).alias("shingle"))
    # |A| is the distinct-gram array's size — map-only, no second explode
    # or doc_id shuffle (the corpus-never-shuffles-its-shingles invariant)
    doc_sz = docs.select(
        F.col(id_col),
        F.size(_gram_array(F.col(text_col), n)).alias("sz_a"))
    inter = (doc_g.join(F.broadcast(bench_g), "shingle")
             .groupBy(id_col, "bench_id").agg(F.count("*").alias("inter")))
    pair = (inter.join(F.broadcast(bench_sz), "bench_id")
            .join(doc_sz, id_col)
            .withColumn("jaccard", F.col("inter") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("inter"))))
    best = pair.groupBy(id_col).agg(
        F.max("jaccard").alias("max_jaccard"),
        F.max_by("bench_id", F.struct(F.col("jaccard"),
                                      (-F.col("bench_id")).alias("neg")))
        .alias("matched_benchmark"))
    return (docs.select(id_col).join(best, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
                    F.col("matched_benchmark"),
                    (F.coalesce("max_jaccard", F.lit(0.0)) >= threshold)
                    .alias("contaminated")))


def ngram_contamination(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str = "text") -> DataFrame:
    """(id, n_hit_shingles, contaminated) for every corpus document.

    ``contaminated`` is true iff the document shares >= 1 distinct word
    n-gram with the benchmark; ``n_hit_shingles`` counts the distinct
    shared shingles (the triage signal: 1 hit on a common phrase vs
    hundreds on an embedded eval item).
    """
    bench = benchmark_shingles(benchmark, n, bench_text_col)
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(_gram_array(F.col(text_col), n)).alias("shingle"))
    hits = (doc_sh.join(F.broadcast(bench), "shingle", "inner")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_hit_shingles")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_hit_shingles"), F.lit(0))
                    .alias("n_hit_shingles"))
            .withColumn("contaminated", F.col("n_hit_shingles") > 0))
