"""Capture physical-plan evidence for BENCH/plans.md (round-2 paths):
fuzzy expansion pruning, search_many per-query TakeOrdered, tombstone
anti-join. Appends sections to BENCH/plans.md."""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xltsearch_spark.catalog import IndexCatalog  # noqa: E402
from xltsearch_spark.config import IndexConfig  # noqa: E402
from xltsearch_spark.plans.parser import FuzzyQuery  # noqa: E402
from xltsearch_spark.session import get_spark  # noqa: E402
from xltsearch_spark.sources.corpus import generate_corpus  # noqa: E402


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    s = buf.getvalue()
    # compress the verbose per-node sections: keep the tree + scan details
    return s


def trim(s: str, keep_nodes=("Scan parquet", "PartitionFilters", "PushedFilters",
                             "TakeOrderedAndProject", "Join", "ReadSchema",
                             "Location")) -> str:
    head, _, rest = s.partition("\n\n")
    kept = [head]
    for block in rest.split("\n\n"):
        if any(k in block for k in keep_nodes):
            kept.append(block)
    return "\n\n".join(kept)


def main(out_path: str | None = None) -> int:
    import tempfile
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = out_path or os.path.join(repo, "BENCH", "plans.md")
    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    wh = tempfile.mkdtemp(prefix="plans_wh_")
    cfg = IndexConfig(doc_range_size=64, block_size=32, term_buckets=8)
    corpus = generate_corpus(256)
    cat = IndexCatalog(spark, wh, cfg)
    cat.build(spark.createDataFrame(corpus), fingerprint="v1")
    eng = cat.engine()
    sections = []

    # 0) core scans: pruned term lookup, single-pass conjunction, pushed
    #    prefix predicate — the plans SCALE.md's query-side claims cite
    eng.wand_enabled = False  # capture the general-path scan shape
    sections.append(("single term: score_all('graded')",
                     "Expected: (field, bucket) PartitionFilters + term "
                     "IN-list in PushedFilters on the postings scan; top-k "
                     "via TakeOrderedAndProject downstream.",
                     explain_str(eng.score_all("graded"))))
    sections.append(("conjunction: score_all('common_token AND graded')",
                     "Expected: ONE pruned scan + decode for the whole "
                     "boolean (conditional aggregation per clause), no "
                     "per-leaf rescan.",
                     explain_str(eng.score_all("common_token AND graded"))))
    sections.append(("prefix (pushed predicate): score_all('need*')",
                     "Expected: StartsWith(term, ...) reaches PushedFilters "
                     "— constant-score expansion never builds driver "
                     "IN-lists.", explain_str(eng.score_all("need*"))))
    sections.append(("regexp (pushed predicate): "
                     "score_all('/needle_[0-9]+/')",
                     "Expected (r5 Q7b): `field = content` partition "
                     "pruning on the scan; the anchored RLIKE evaluates "
                     "in the Filter directly above it (regex can't reach "
                     "parquet row-group stats, and bucket = hash(term) is "
                     "unknowable for a pattern — all buckets of ONE field "
                     "scan, no driver expansion, constant-score).",
                     explain_str(eng.score_all("/needle_[0-9]+/"))))
    eng.wand_enabled = True

    # 1) fuzzy candidates: length-window filter BEFORE levenshtein reaches
    #    the dictionary scan (the Damerau rerank runs driver-side over the
    #    collected survivors — never a full-dictionary collect)
    exp = eng._fuzzy_candidates_df(FuzzyQuery("content", "gradd", 1, 1.0))
    sections.append(("fuzzy expansion: dictionary scan for gradd~1",
                     "Expected: `length(term)` window filter reaches the scan "
                     "(before any levenshtein evaluation), final top-50 is "
                     "TakeOrderedAndProject.", explain_str(exp)))

    # 2) search_many: flat queries share ONE doc-keyed aggregate + struct
    #    explode; the rank filter is WindowGroupLimit (bounded per-group
    #    heaps), never a full sort of the match set
    many = eng.search_many({"q1": "graded", "q2": "alpha OR beta"}, limit=10,
                           materialize=False)
    sections.append(("search_many (2 flat queries, k=10): single-pass agg + "
                     "WindowGroupLimit",
                     "Expected: ONE HashAggregate(doc_id) with shared "
                     "per-clause conditional sums feeding a Generate "
                     "(explode of per-query structs); the rank cut is "
                     "WindowGroupLimit — the raw match set is never "
                     "globally sorted.",
                     explain_str(many, mode="simple")))

    # 2b) WAND with exact stats: the block skip is a PUSHED parquet filter;
    #     r4: tau is seeded from block metadata (no probe job) — recorded
    #     in the section title so the audit shows which phase ran
    eng.wand_min_df = 1
    eng.search_scores("common_token OR graded", 5).collect()
    if eng._last_wand_scan is not None:
        sections.append((f"WAND tau-prune (stats exact, tau from "
                         f"{eng._last_wand_tau_source}): pushed block_max filter",
                         "Expected: GreaterThanOrEqual(block_max_score, ...) in "
                         "PushedFilters — non-competitive blocks are skipped by "
                         "parquet row-group stats, never read. tau_source="
                         "metadata means the threshold came from block_min_score"
                         " metadata in the SAME aggregate that collected doc "
                         "freqs: 2 driver jobs total for the query.",
                         explain_str(eng._last_wand_scan)))
    eng.wand_min_df = 200_000

    # 2c) conjunction rarest-first doc-range pruning (r5, VERDICT r4 #2):
    #     a rare AND frequent query pushes the rare term's block doc-range
    #     envelope onto every other term's block scan — Lucene's leapfrog
    #     analog — so the frequent term's non-overlapping blocks are
    #     skipped via row-group stats. A/B block-row counts quantify it.
    eng.conj_prune_ratio = 1.0
    eng.score_all("needle_17 AND common_token").collect()
    pruned_scan = eng._last_scan
    n_pruned = pruned_scan.count()
    eng.conj_prune_enabled = False
    eng.score_all("needle_17 AND common_token").collect()
    n_brute = eng._last_scan.count()
    eng.conj_prune_enabled = True
    eng.conj_prune_ratio = 4.0
    sections.append((f"conjunction doc-range prune: 'needle_17 AND "
                     f"common_token' ({n_pruned} block rows pruned vs "
                     f"{n_brute} brute)",
                     "Expected: LessThanOrEqual(skip_first_doc, ...) / "
                     "GreaterThanOrEqual(skip_last_doc, ...) range "
                     "disjunction in PushedFilters alongside the term "
                     "IN-list — the frequent term decodes ONLY blocks whose "
                     "doc-id range intersects the rare term's ranges; "
                     "identical results verified in "
                     "tests/test_engine.py::test_conjunction_*.",
                     explain_str(pruned_scan)))

    # 2c-bis) phrase doc-range pruning (r5): phrase terms are implicit
    #     MUSTs, so the rare term's ranges prune the frequent term's
    #     position-carrying blocks — the most expensive decode in the index
    eng.conj_prune_ratio = 1.0
    eng.score_all('"needle_17 common_token"').collect()
    ph_scan = eng._last_scan
    ph_pruned = ph_scan.count()
    eng.conj_prune_enabled = False
    eng.score_all('"needle_17 common_token"').collect()
    ph_brute = eng._last_scan.count()
    eng.conj_prune_enabled = True
    eng.conj_prune_ratio = 4.0
    sections.append((f"phrase doc-range prune: '\"needle_17 common_token\"' "
                     f"({ph_pruned} block rows pruned vs {ph_brute} brute)",
                     "Expected: the same pushed skip_first_doc/skip_last_doc "
                     "range disjunction, now on a PHRASE scan (ReadSchema "
                     "includes pos_bin): the frequent term's position blocks "
                     "outside the rare term's doc ranges are never read.",
                     explain_str(ph_scan)))

    # 2d) TF-IDF (DefaultSimilarity, the reference's DEFAULT model) block-max
    #     WAND (r5, VERDICT r4 #4): blocks store model-native maxima, so the
    #     same pushed-filter machinery prunes under model=default
    import tempfile as _tf
    cfg_tfidf = IndexConfig(name="tfidf", scoring_model="default",
                            doc_range_size=64, block_size=32, term_buckets=8)
    cat_t = IndexCatalog(spark, _tf.mkdtemp(prefix="plans_wh_t_"), cfg_tfidf)
    cat_t.build(spark.createDataFrame(corpus), fingerprint="v1")
    eng_t = cat_t.engine()
    eng_t.wand_min_df = 1
    eng_t.search_scores("common_token OR graded", 5).collect()
    if eng_t._last_wand_scan is not None:
        sections.append((f"WAND under model=default (tau from "
                         f"{eng_t._last_wand_tau_source}): pushed block_max "
                         f"filter on TF-IDF maxima",
                         "Expected: GreaterThanOrEqual(block_max_score, ...) "
                         "in PushedFilters with blocks built under "
                         "DefaultSimilarity (sqrt(tf)*idf^2*norm) — coord "
                         "and queryNorm fold into the tau/ceiling math "
                         "(search._wand_topk docstring); rank-identity vs "
                         "brute force verified in tests/test_engine.py::"
                         "test_tfidf_wand_rank_identical_and_pushed_filter.",
                         explain_str(eng_t._last_wand_scan)))

    # 3) tombstones: persisted parquet anti-joined lazily
    v2 = corpus.iloc[: len(corpus) - 40]
    cat.update(spark.createDataFrame(v2), fingerprint="v2")
    eng2 = cat.engine()
    scored = eng2.score_all("common_token")
    sections.append(("tombstone filter: score_all over an index with deletes",
                     "Expected: LEFT ANTI join against the tombstones parquet "
                     "(no driver-side id list in the plan).",
                     explain_str(scored, mode="simple")))

    # 4) B3 parse stage: pure projection — no exchange, no Python eval
    # (reads parquet so the optimizer can't fold the chain into a local
    # relation: the interesting evidence is Project directly over FileScan)
    from pyspark.sql import functions as F
    from xltsearch_spark.operators.parse import extract_text
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.col("text").alias("content")))
    parsed = extract_text(docs)
    sections.append(("parse/extract stage: map-only JVM projection",
                     "Expected: a single Project over the scan — no Exchange "
                     "(no shuffle), no BatchEvalPython/ArrowEvalPython (no "
                     "Python workers); the whole Tika-parity chain is "
                     "codegen'd column expressions.",
                     explain_str(parsed, mode="simple")))

    # 5) packing/mixture: the chunked prefix sum is ONE hash-bucketed
    # exchange + sort + MapInPandas (no single-task global window AND no
    # range-boundary sampling job); mixture is map-only
    from xltsearch_spark.operators.packing import (mixture_resample,
                                                   pack_chunked)
    ntok = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    pdocs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
             .select("doc_id", "source", ntok.alias("n_tokens")))
    packed = pack_chunked(pdocs, budget=2048)
    sections.append(("pack_chunked: two-pass global prefix sum",
                     "Expected: ONE Exchange hashpartitioning on the "
                     "arithmetic hash bucket (`_b` = hash // width; NO "
                     "rangepartitioning, which would add a boundary-"
                     "sampling scan of the input) + Sort + MapInPandas — "
                     "and NO `Window` node with an empty partition spec "
                     "(a bare sum-over-order window would serialize the "
                     "whole corpus through one task).",
                     explain_str(packed, mode="simple")))
    mixed = mixture_resample(pdocs, "source", {"src0": 2.5, "src1": 0.5})
    sections.append(("mixture_resample: map-only domain reweighting",
                     "Expected: Generate (explode) + Project/Filter directly "
                     "over the scan — no Exchange, no join (the factor table "
                     "is a literal CASE), no Python eval.",
                     explain_str(mixed, mode="simple")))

    # 6) r5 surface ops: explain / facets / search_sorted / weighted_sample
    sections.append(("explain('alpha OR beta', limit=10): broadcast hit join",
                     "Expected: the SAME pruned postings scan the scorer "
                     "uses, BroadcastHashJoin against the <= limit hit ids "
                     "and the n_clauses metadata LocalTableScan — no second "
                     "corpus-wide pass, no shuffle of the decoded frame.",
                     explain_str(eng.explain("alpha OR beta", limit=10),
                                 mode="simple")))
    sections.append(("facets('graded', [lang, repo]): partial-agg counts",
                     "Expected: the hit set joins the stored-docs scan "
                     "(SortMergeJoin/shuffle or AQE broadcast — BOTH sides "
                     "stay distributed, no collect), then partial_count "
                     "before the tiny facet-key Exchange (map-side combine).",
                     explain_str(eng.facets("graded", ["lang", "repo"]),
                                 mode="simple")))
    sections.append(("search_sorted('graded', [lang, repo], 7): field-sort cut",
                     "Expected: TakeOrderedAndProject over the hit-docs "
                     "join — no global Sort node, no full-corpus ordering.",
                     explain_str(eng.search_sorted("graded", ["lang", "repo"],
                                                   7), mode="simple")))
    sections.append(("span_near('alpha', 'beta', slop=3, k=10): pruned "
                     "scan + vectorized span kernel",
                     "Expected (r5 spans family): the SAME (field, bucket) "
                     "PartitionFilters + two-term IN-list PushedFilters as "
                     "a boolean scan (a span clause IS a term for the "
                     "pushdown), ONE doc_id join of the two clauses' "
                     "decoded rows, the closest-predecessor pairing inside "
                     "a single MapInPandas (batch-global searchsorted — no "
                     "per-doc Python loop), top-k via "
                     "TakeOrderedAndProject.",
                     explain_str(eng.search_span_near("alpha", "beta", 3,
                                                      limit=10))))
    sections.append(("span_not('alpha', 'beta', 2, 2, k=10): fused "
                     "exclusion kernel",
                     "Expected (r5): pruned two-term scan, LEFT join of "
                     "exclude positions onto include docs, then ONE "
                     "MapInPandas that counts surviving spans AND applies "
                     "the similarity — no second Python stage, no "
                     "intermediate Arrow round-trip between counting and "
                     "scoring.",
                     explain_str(eng.search_span_not("alpha", "beta", 2, 2,
                                                     limit=10))))
    sections.append(("search_phrase_prefix('alpha bet', k=10): expanded "
                     "IN-list pushdown",
                     "Expected (r5 MultiPhraseQuery): the dictionary "
                     "expansion resolves driver-side (<= max_expansions "
                     "rows), then the postings scan carries the exact slot "
                     "PLUS every expansion in ONE pushed term IN-list — "
                     "blocks of non-matching terms are never read; one "
                     "repartition(doc_id) + one vectorized kernel, top-k "
                     "TakeOrderedAndProject.",
                     explain_str(eng.search_phrase_prefix("alpha bet",
                                                          limit=10))))
    sections.append(("search_after('alpha OR beta', cursor, k=10): "
                     "cursor-filter pagination",
                     "Expected (r5 searchAfter): the cursor predicate is a "
                     "map-only Filter fused into the scoring plan — no "
                     "page_number*k collector, no global sort; the cut "
                     "stays TakeOrderedAndProject at every page depth.",
                     explain_str(eng.search_after("alpha OR beta", 0.5, 3,
                                                  limit=10),
                                 mode="simple")))
    sections.append(("search_collapsed('graded', lang, 2, k=10): "
                     "WindowGroupLimit field collapsing",
                     "Expected (r5 grouping module): the per-group rank cut "
                     "plans as WindowGroupLimit (per-group bounded heaps "
                     "BEFORE the window sort — the full hit set is never "
                     "globally ranked), hit-docs join stays distributed, "
                     "final cut TakeOrderedAndProject.",
                     explain_str(eng.search_collapsed("graded", "lang", 2,
                                                      limit=10),
                                 mode="simple")))
    from xltsearch_spark.operators.sampling import weighted_sample
    wdf = pdocs.select("doc_id", F.col("n_tokens").alias("w"))
    sections.append(("weighted_sample(k=50): map-only key + TakeOrdered",
                     "Expected: the exponential race key is a Project fused "
                     "into the scan (no Exchange before the cut), the cut is "
                     "TakeOrderedAndProject(51-col limit 50) — executors "
                     "stream through k-bounded heaps, driver sees k rows.",
                     explain_str(weighted_sample(wdf, 50, "w"),
                                 mode="simple")))

    with open(out_path, "w") as f:  # fresh file: stale plans are worse
        f.write("# Plan evidence (regenerated at HEAD by "
                "scripts/capture_plans.py — one complete capture, "
                "overwritten each run)\n")
        for title, expect, plan in sections:
            plan = re.sub(r"#\d+", "#N", plan)  # stable ids for diffing
            f.write(f"\n## {title}\n\n{expect}\n\n```\n{plan}\n```\n")
    print(f"wrote {len(sections)} sections to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
