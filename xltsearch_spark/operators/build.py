"""SPIMI-style distributed inverted-index build (SURVEY.md §2.2 B1-B5).

Replaces the reference's single-node 3-thread pipeline
(``Catalog.updateIndex`` -> Select/Parse/IndexTask, ``Catalog.java:97-128``;
Lucene ``IndexWriter`` segment build at ``IndexTask.java:54-88``) with a
Spark-first plan designed for 10^12-file scale:

Stage 1  docs        corpus -> sha256(content) (built-in ``F.sha2``, B1) +
                     deterministic dense doc_id in (repo, path) order
                     (reproduces Lucene's docID-asc tie-break,
                     ``SearchTask.java:63``).
Stage 2  runs        ``mapInPandas`` partition-local SPIMI: tokenize with the
                     configured analyzer (B4) and emit one row per
                     (field, term, doc-range) = a sorted, delta+varint
                     compressed posting RUN, plus per-doc length rows.
                     Doc ranges are disjoint and ordered, so every term's
                     runs concatenate into a globally doc-sorted posting
                     list WITHOUT a comparison merge — the "two-level
                     (partition-local then global) posting merge": level 1
                     inside each partition, level 2 a concatenation.
Stage 3  dictionary  groupBy(field, term) over run *summaries* (column-
                     pruned: n_docs/sum_tf only) -> doc_freq/total_term_freq.
                     Map-side partial agg keeps the hot-term shuffle tiny.
Stage 4  postings    runs shuffled once by hash(field, term) bucket; inside
                     each bucket partition all runs of a term are local, so
                     df(term) and block encoding need NO further shuffle.
                     Emits ≤block_size-doc blocks with skip pointers
                     (first/last doc) and an exact per-block max BM25 score
                     (block-max WAND metadata).

Hot-term skew: a term appearing in every doc ("the", "def") is never a
single reducer row — its postings stay split across doc-range runs and
blocks; the only per-term single-point work is the tiny dictionary sum.

Every stage writes parquet + a lineage manifest (checkpoint/resume — see
``catalog.py``).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from xltsearch_spark.analyzers import analyze_flat, doc_lengths
from xltsearch_spark.config import IndexConfig
from xltsearch_spark.functions.norms import quantized_doc_length
from xltsearch_spark.functions.varint import (decode_deltas, decode_varint,
                                              encode_deltas, encode_varint,
                                              encode_varint_grouped,
                                              first_varint,
                                              varint_value_starts)

ANALYZED_FIELDS = ("content", "title")
KEYWORD_FIELDS = ("repo", "path", "commit", "lang", "hashsum",
                  "format", "parse_status")
# multi-valued metadata column: map<string, array<string>> — the reference's
# 29 Tika metadata fields (Config.java:112-144) are indexed as MULTIPLE
# analyzed field instances per doc (IndexTask.java:74-78); each map key k
# becomes searchable field "meta.<k>" with instance positions offset by
# position_increment_gap and dl = total kept tokens across instances.
META_COL = "meta"
META_FIELD_PREFIX = "meta."

RUN_SCHEMA = StructType([
    StructField("field", StringType()),
    StructField("term", StringType()),      # NULL => per-doc length row
    StructField("range_id", LongType()),
    StructField("bucket", IntegerType()),
    StructField("n_docs", IntegerType()),
    StructField("docs_bin", BinaryType()),  # delta+varint doc ids
    StructField("tfs_bin", BinaryType()),   # varint term freqs (or dl for NULL-term rows)
    StructField("dls_bin", BinaryType()),   # varint per-doc field lengths
    StructField("pos_bin", BinaryType()),   # varint within-doc position deltas
    StructField("sum_tf", LongType()),
])

POSTING_SCHEMA = StructType([
    StructField("field", StringType()),
    StructField("term", StringType()),
    StructField("bucket", IntegerType()),
    StructField("block_id", LongType()),
    StructField("n_docs", IntegerType()),
    StructField("skip_first_doc", LongType()),
    StructField("skip_last_doc", LongType()),
    StructField("block_max_score", DoubleType()),
    # exact per-block score FLOOR: lets the engine seed the WAND threshold
    # tau from metadata alone (a full block of n_docs >= k proves the k-th
    # best score >= block_min_score), skipping the probe-scoring job
    StructField("block_min_score", DoubleType()),
    # stats-independent bound ingredients: an upper bound that stays valid
    # after incremental updates shift N/df/avgdl (block_max_score is exact
    # only for the stats at build time)
    StructField("max_tf", LongType()),
    StructField("min_dl", LongType()),
    StructField("docs_bin", BinaryType()),
    StructField("tfs_bin", BinaryType()),
    StructField("dls_bin", BinaryType()),
    StructField("pos_bin", BinaryType()),
])


def term_bucket(term: pd.Series | np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic term -> bucket hash (stable across runs/languages)."""
    s = pd.Series(term, dtype=object).fillna("")
    # bucket = little-endian uint32 of MD5(utf-8(term))[:4] mod n_buckets —
    # part of the persisted index layout: readers MUST reproduce this exact
    # function to prune (field, bucket) partitions. Computed once per unique
    # term per batch (hashlib on uniques, mapped back vectorized).
    uniq = pd.unique(s)
    m = {t: int.from_bytes(hashlib.md5(str(t).encode("utf-8")).digest()[:4], "little") % n_buckets
         for t in uniq}
    return s.map(m).to_numpy(dtype=np.int32)


def assign_doc_ids(df: DataFrame, key_cols=("repo", "path"), id_base: int = 0,
                   out_count: list | None = None) -> DataFrame:
    """Deterministic dense doc_id in key sort order, without a global window.

    Range-partition + sort, persist (pins the sampled range bounds), count
    per partition (tiny collect), then doc_id = per-partition offset +
    within-partition row number — the scalable equivalent of sort +
    zipWithIndex. A single ``row_number()`` window would serialize on one
    task at 10^12 rows.

    The id arithmetic is PURE JVM: ``monotonically_increasing_id`` packs
    the within-partition record number in its low 33 bits (documented
    layout), and the per-partition offsets ride a literal array indexed by
    ``spark_partition_id`` (O(1) ``element_at``; n_parts longs in the
    plan). The previous implementation did the same arithmetic inside a
    ``mapInPandas``, which round-tripped the ENTIRE corpus — content
    columns included — through Arrow to a Python worker and back just to
    add one int64 column; at 100 TB that is the whole input crossing the
    JVM/Python boundary twice for no computation (guide §4: eliminate the
    boundary when built-ins exist).

    The input is persisted across the two jobs range partitioning implies
    (boundary sampling + the shuffle): without it the child plan — at this
    point the full parse/sha256 prep over the corpus — would EXECUTE TWICE,
    a 2x compute/IO amplification of stage 1 at 100 TB. The cache is
    released as soon as the sorted frame is materialized by the counts
    collect, so the transient footprint is one corpus copy (the same rows
    the shuffle writes anyway); under eviction pressure a recompute falls
    back to lineage — correct, just slower.
    """
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    sl = df.storageLevel
    caller_cached = sl.useMemory or sl.useDisk or sl.useOffHeap
    if not caller_cached:
        df = df.persist()
    sorted_df = df.repartitionByRange(n_parts, *[F.col(c) for c in key_cols]) \
                  .sortWithinPartitions(*key_cols).persist()
    counts = {r["pid"]: r["cnt"] for r in
              sorted_df.withColumn("pid", F.spark_partition_id())
                       .groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
    if not caller_cached:
        # sorted_df is materialized and the input is never re-read; only
        # release a cache THIS function created — a caller's own persist
        # must survive the call
        df.unpersist()
    offsets = []
    acc = id_base
    for pid in range(max(counts, default=-1) + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    if out_count is not None:
        out_count.append(acc - id_base)  # total rows: saves a later count job
    if not offsets:
        offsets = [id_base]
    off_arr = F.array(*[F.lit(int(o)).cast("long") for o in offsets])
    row_in_part = F.monotonically_increasing_id().bitwiseAND(
        F.lit((1 << 33) - 1))
    doc_id = (F.element_at(off_arr, F.spark_partition_id() + 1)
              + row_in_part).cast("long")
    return sorted_df.withColumn("doc_id", doc_id)


@dataclass
class BuildStats:
    n_docs: int
    avgdl: dict[str, float]
    sum_ttf: dict[str, int]


def make_tokenize_udf(config: IndexConfig, fields_present: list[str]):
    """mapInPandas generator: doc batches -> posting runs + doc-length rows."""
    range_size = config.doc_range_size
    n_buckets = config.term_buckets
    analyzed = [f for f in ANALYZED_FIELDS if f in fields_present]
    keywords = [f for f in KEYWORD_FIELDS if f in fields_present]
    has_meta = META_COL in fields_present
    profile = config.analyzer
    max_tok = config.max_token_length
    gap = config.position_increment_gap

    def tokenize(it):
        for pdf in it:
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            out_rows = []
            for field in analyzed:
                flat = analyze_flat(pdf[field], profile, max_tok)
                dl = doc_lengths(flat, len(pdf))
                # per-doc length rows (term NULL), grouped by doc range
                _emit_dl_rows(out_rows, field, doc_ids, dl, range_size)
                if len(flat) == 0:
                    continue
                rows = flat["row"].to_numpy(dtype=np.int64)
                terms = flat["term"].to_numpy(dtype=object)
                pos = flat["pos"].to_numpy(dtype=np.int64)
                _emit_runs(out_rows, field, terms, doc_ids[rows], pos, dl, rows,
                           range_size, n_buckets)
            for field in keywords:
                vals = pdf[field].fillna("").astype(str).to_numpy(dtype=object)
                mask = vals != ""
                docs = doc_ids[mask]
                dl1 = mask.astype(np.int64)
                _emit_dl_rows(out_rows, field, doc_ids, dl1, range_size)
                if docs.size:
                    pos0 = np.zeros(docs.size, dtype=np.int64)
                    dl_k = np.ones(len(pdf), dtype=np.int64)
                    _emit_runs(out_rows, field, vals[mask], docs, pos0, dl_k,
                               np.nonzero(mask)[0], range_size, n_buckets)
            if has_meta:
                _emit_meta_fields(out_rows, pdf, doc_ids, profile, max_tok,
                                  gap, range_size, n_buckets)
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[f.name for f in RUN_SCHEMA.fields])

    return tokenize


def _meta_items(m):
    """Normalize one meta cell: Arrow map -> list[(k, v)], dict -> items."""
    if m is None:
        return ()
    if isinstance(m, dict):
        return m.items()
    return m  # pyarrow MapType converts to a list of (key, value) tuples


def _emit_meta_fields(out_rows, pdf, doc_ids, profile, max_tok, gap,
                      range_size, n_buckets):
    """Tokenize multi-valued metadata: per map key k, every value is an
    analyzed field INSTANCE of field "meta.<k>"; instance i's positions are
    offset by sum of previous instances' kept spans + gap (Lucene's
    positionIncrementGap between repeated fields); dl = kept tokens across
    all instances (what BM25 length-normalizes on)."""
    md = pdf[META_COL]
    per_name: dict[str, tuple[list[int], list[str]]] = {}
    for i, cell in enumerate(md):
        for k, vals in _meta_items(cell):
            if vals is None:
                continue
            rows_l, texts_l = per_name.setdefault(k, ([], []))
            for v in vals:
                if v is not None:
                    rows_l.append(i)
                    texts_l.append(v)
    for name in sorted(per_name):
        rows_l, texts_l = per_name[name]
        field = META_FIELD_PREFIX + name
        flat = analyze_flat(pd.Series(texts_l, dtype=object), profile, max_tok)
        inst_doc = np.asarray(rows_l, dtype=np.int64)  # instance -> pdf row
        spans = np.zeros(len(texts_l), dtype=np.int64)
        if len(flat):
            fr = flat["row"].to_numpy(dtype=np.int64)
            fp = flat["pos"].to_numpy(dtype=np.int64)
            np.maximum.at(spans, fr, fp + 1)
        # per-instance position offset: prefix sum of (span + gap), reset per doc
        cs = np.concatenate(([0], np.cumsum(spans + gap)[:-1]))
        starts = np.concatenate(([True], inst_doc[1:] != inst_doc[:-1]))
        grp_idx = np.nonzero(starts)[0]
        base = np.repeat(cs[grp_idx], np.diff(np.append(grp_idx, len(texts_l))))
        offs = cs - base
        dl_doc = np.zeros(len(pdf), dtype=np.int64)
        if len(flat):
            keep = ~flat["overlap"].to_numpy(dtype=bool)
            np.add.at(dl_doc, inst_doc[fr[keep]], 1)
        _emit_dl_rows(out_rows, field, doc_ids, dl_doc, range_size)
        if len(flat):
            tok_doc_row = inst_doc[fr]               # token -> pdf row
            pos_new = fp + offs[fr]
            _emit_runs(out_rows, field, flat["term"].to_numpy(dtype=object),
                       doc_ids[tok_doc_row], pos_new, dl_doc, tok_doc_row,
                       range_size, n_buckets)


def _emit_dl_rows(out_rows, field, doc_ids, dl, range_size):
    ranges = doc_ids // range_size
    for rid in np.unique(ranges):
        m = ranges == rid
        d, l = doc_ids[m], np.asarray(dl)[m]
        out_rows.append((field, None, int(rid), int(rid % 2**31), int(d.size),
                         encode_deltas(d), encode_varint(l.astype(np.uint64)),
                         None, None, int(l.sum())))


def _emit_runs(out_rows, field, terms, docs, pos, dl_per_row, rows,
               range_size, n_buckets):
    """Vectorized SPIMI: flat (term, doc, pos) -> one encoded run per
    (term, doc-range). The entire partition is encoded with FOUR batched
    varint calls (doc deltas / tfs / dls / position deltas); the only Python
    loop slices per-group byte ranges out of the shared buffers."""
    dl_arr = np.asarray(dl_per_row, dtype=np.int64)
    ranges = docs // range_size
    buckets = term_bucket(terms, n_buckets)
    # sort/group on factorized int codes — NEVER materialize a numpy unicode
    # array (itemsize = 4 x longest term would cost ~200MB per task and
    # saturate memory bandwidth across 32 concurrent workers)
    codes = pd.factorize(terms, use_na_sentinel=False)[0]
    order = np.lexsort((pos, docs, codes))
    terms, docs, pos, ranges, buckets, rows, codes = (
        terms[order], docs[order], pos[order], ranges[order], buckets[order],
        rows[order], codes[order])
    n = len(terms)
    # group boundaries at (term, range) change — token-stream index space
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (codes[1:] != codes[:-1]) | (ranges[1:] != ranges[:-1])
    grp_starts = np.nonzero(new_grp)[0]
    grp_ends = np.append(grp_starts[1:], n)
    # doc-entry boundaries (a (group, doc) pair) — token-stream index space
    new_doc = new_grp.copy()
    new_doc[1:] |= docs[1:] != docs[:-1]
    doc_starts = np.nonzero(new_doc)[0]
    doc_ends = np.append(doc_starts[1:], n)
    tf = (doc_ends - doc_starts).astype(np.uint64)          # per doc-entry
    d_vals = docs[doc_starts]
    d_dls = dl_arr[rows[doc_starts]].astype(np.uint64)
    # group starts in doc-entry index space (every group start IS a doc start)
    grp_doc_starts = np.searchsorted(doc_starts, grp_starts)
    grp_doc_ends = np.append(grp_doc_starts[1:], doc_starts.size)
    # doc-id deltas, reset to absolute at each group start
    deltas = np.empty(d_vals.size, dtype=np.int64)
    deltas[0] = d_vals[0]
    deltas[1:] = d_vals[1:] - d_vals[:-1]
    deltas[grp_doc_starts] = d_vals[grp_doc_starts]
    # per-token position deltas, reset to absolute at each doc-entry start
    pos_delta = np.empty(n, dtype=np.int64)
    pos_delta[0] = pos[0]
    pos_delta[1:] = pos[1:] - pos[:-1]
    pos_delta[doc_starts] = pos[doc_starts]
    # FOUR batched encodes for the whole partition
    docs_buf, docs_off = encode_varint_grouped(deltas.astype(np.uint64), grp_doc_starts)
    tfs_buf, tfs_off = encode_varint_grouped(tf, grp_doc_starts)
    dls_buf, dls_off = encode_varint_grouped(d_dls, grp_doc_starts)
    pos_buf, pos_off = encode_varint_grouped(pos_delta.astype(np.uint64), grp_starts)
    docs_end = np.append(docs_off[1:], len(docs_buf))
    tfs_end = np.append(tfs_off[1:], len(tfs_buf))
    dls_end = np.append(dls_off[1:], len(dls_buf))
    pos_end = np.append(pos_off[1:], len(pos_buf))
    n_docs_g = grp_doc_ends - grp_doc_starts
    sum_tf_g = grp_ends - grp_starts
    for g in range(grp_starts.size):
        s = grp_starts[g]
        out_rows.append((field, terms[s], int(ranges[s]), int(buckets[s]),
                         int(n_docs_g[g]),
                         docs_buf[docs_off[g]:docs_end[g]],
                         tfs_buf[tfs_off[g]:tfs_end[g]],
                         dls_buf[dls_off[g]:dls_end[g]],
                         pos_buf[pos_off[g]:pos_end[g]],
                         int(sum_tf_g[g])))


def make_block_to_run_udf():
    """Posting BLOCKS -> synthesized RUNS, for segment MERGING (Lucene
    forceMerge without retokenization — IndexWriter merges by copying
    postings, not re-analyzing). A clean block passes through byte-for-byte
    (delta/varint formats of blocks and runs are identical by construction;
    only its sum_tf is decoded); a block carrying tombstoned docs (its
    ``dead`` array column, attached by a bucketized range join) is
    re-encoded without them. ``range_id := skip_first_doc`` preserves the
    per-term doc order the block encoder requires — block doc spans are
    disjoint within and across segments (segment id ranges are disjoint)."""

    def conv(it):
        for pdf in it:
            has_dead = "dead" in pdf.columns
            out = []
            for r in pdf.itertuples(index=False):
                nd = int(r.n_docs)
                tfs = decode_varint(r.tfs_bin, nd).astype(np.int64)
                dead = r.dead if has_dead else None
                dead = [] if dead is None or (isinstance(dead, float)) else list(dead)
                if not dead:
                    out.append((r.field, r.term, int(r.skip_first_doc),
                                int(r.bucket), nd, r.docs_bin, r.tfs_bin,
                                r.dls_bin, r.pos_bin, int(tfs.sum())))
                    continue
                docs = decode_deltas(r.docs_bin, nd)
                dls = decode_varint(r.dls_bin, nd)
                keep = ~np.isin(docs, np.asarray(dead, dtype=np.int64))
                if not keep.any():
                    continue
                if r.pos_bin is not None and len(r.pos_bin):
                    # per-doc byte spans in the positions stream: doc i owns
                    # tf[i] varint values (tf >= 1 always, spans contiguous)
                    starts = varint_value_starts(r.pos_bin)
                    cum = np.concatenate(([0], np.cumsum(tfs)))
                    bstart = starts[cum[:-1]]
                    bend = np.append(bstart[1:], len(r.pos_bin))
                    pos_out = b"".join(r.pos_bin[bstart[i]:bend[i]]
                                       for i in np.nonzero(keep)[0])
                else:
                    pos_out = r.pos_bin
                out.append((r.field, r.term, int(r.skip_first_doc),
                            int(r.bucket), int(keep.sum()),
                            encode_deltas(docs[keep]),
                            encode_varint(tfs[keep].astype(np.uint64)),
                            encode_varint(dls[keep].astype(np.uint64)),
                            pos_out, int(tfs[keep].sum())))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in RUN_SCHEMA.fields])

    return conv


def make_block_merge_udf():
    """Posting BLOCKS -> posting blocks for the FAST merge path: a clean
    block is copied byte-for-byte; a block carrying tombstoned docs drops
    them and refreshes n_docs / skip span / max_tf / min_dl. The stored
    block_max_score is NOT recomputed — for the kept subset the old value
    stays a valid (possibly loose) upper bound, and the engine's
    stale-stats WAND bounds handle the rest (catalog marks the index
    block_max_exact=False). This is Lucene's merge: postings are copied,
    never re-scored or re-analyzed — cost tracks index bytes, not CPU."""

    def conv(it):
        for pdf in it:
            has_dead = "dead" in pdf.columns
            keep_cols = [f.name for f in POSTING_SCHEMA.fields]
            out = []
            for r in pdf.itertuples(index=False):
                dead = r.dead if has_dead else None
                dead = [] if dead is None or isinstance(dead, float) else list(dead)
                if not dead:
                    out.append((r.field, r.term, r.bucket, r.block_id,
                                r.n_docs, r.skip_first_doc, r.skip_last_doc,
                                r.block_max_score, r.block_min_score,
                                r.max_tf, r.min_dl,
                                r.docs_bin, r.tfs_bin, r.dls_bin, r.pos_bin))
                    continue
                nd = int(r.n_docs)
                docs = decode_deltas(r.docs_bin, nd)
                tfs = decode_varint(r.tfs_bin, nd).astype(np.int64)
                dls = decode_varint(r.dls_bin, nd).astype(np.int64)
                keep = ~np.isin(docs, np.asarray(dead, dtype=np.int64))
                if not keep.any():
                    continue
                if r.pos_bin is not None and len(r.pos_bin):
                    starts = varint_value_starts(r.pos_bin)
                    cum = np.concatenate(([0], np.cumsum(tfs)))
                    bstart = starts[cum[:-1]]
                    bend = np.append(bstart[1:], len(r.pos_bin))
                    pos_out = b"".join(r.pos_bin[bstart[i]:bend[i]]
                                       for i in np.nonzero(keep)[0])
                else:
                    pos_out = r.pos_bin
                kd, kt, kl = docs[keep], tfs[keep], dls[keep]
                # old block_min_score stays a valid FLOOR for the kept subset
                # (min over a subset can only rise); the stored value is kept,
                # like block_max_score, and the post-merge stats_exact=False
                # gate keeps the engine from seeding tau off it anyway
                out.append((r.field, r.term, r.bucket, r.block_id,
                            int(keep.sum()), int(kd.min()), int(kd.max()),
                            r.block_max_score, r.block_min_score,
                            int(kt.max()), int(kl.min()),
                            encode_deltas(kd),
                            encode_varint(kt.astype(np.uint64)),
                            encode_varint(kl.astype(np.uint64)), pos_out))
            if out:
                yield pd.DataFrame(out, columns=keep_cols)

    return conv


def make_postings_summary_udf():
    """postings -> (field, term, bucket, n_docs, sum_tf) rows: the cheap
    varint-decode pass that rebuilds dictionary/stats after a fast merge."""
    schema = StructType([
        StructField("field", StringType()), StructField("term", StringType()),
        StructField("bucket", IntegerType()), StructField("n_docs", LongType()),
        StructField("sum_tf", LongType()),
    ])

    def conv(it):
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                tfs = decode_varint(r.tfs_bin, int(r.n_docs))
                out.append((r.field, r.term, int(r.bucket), int(r.n_docs),
                            int(tfs.sum())))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    conv.schema = schema
    return conv


def make_block_udf(config: IndexConfig, n_docs: int, avgdl: dict[str, float]):
    """mapInPandas over bucket partitions: merge each term's (ordered,
    disjoint) runs by concatenation and emit fixed-size blocks with exact
    block-max score metadata. All runs of a term are guaranteed local
    (bucket hash).

    Block max/min scores are computed under the CONFIGURED similarity —
    exactly Lucene, where the IndexWriterConfig's Similarity shapes the
    index-time norms (IndexTask.java:57): a ``scoring_model="default"``
    index stores TF-IDF per-term scores (sqrt(tf) * idf^2 * norm(dl)), a
    BM25 index stores BM25 ones, and quantize_norms participates either
    way. The engine verifies this provenance (block_score_model /
    block_quantize) before trusting the metadata for WAND pruning.

    Fully batch-vectorized: ONE decode per stream kind for the whole
    partition, segment-cumsum for absolute doc ids, ``reduceat`` for block
    max/min metadata, byte-slicing (no re-encode) for tf/dl/pos payloads;
    only doc-id deltas are re-encoded (blocks must restart at an absolute
    id). The sole Python loop assembles output tuples."""
    k1, b, quantize = config.k1, config.b, config.quantize_norms
    model = config.scoring_model
    block = config.block_size

    def to_blocks(it):
        chunks = list(it)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        del chunks
        # sort runs grouped by (field, term) with ranges ascending (doc-range
        # order = doc-id order). Factorized int codes, never unicode arrays.
        fields = pdf["field"].to_numpy(dtype=object)
        terms = pdf["term"].to_numpy(dtype=object)
        fcodes = pd.factorize(fields, use_na_sentinel=False)[0]
        tcodes = pd.factorize(terms, use_na_sentinel=False)[0]
        # order runs by their FIRST DOC ID, not range_id: several input
        # partitions can emit runs for the SAME doc range (a range straddling
        # a partition boundary), and cross-segment runs reuse range ids —
        # range_id ties would concatenate doc-unsorted and corrupt the block
        # skip spans. The first varint of docs_bin IS the absolute first doc
        # (deltas restart per run), so the key is read without a full decode.
        first_docs = np.fromiter((first_varint(b) for b in pdf["docs_bin"]),
                                 dtype=np.int64, count=len(pdf))
        order = np.lexsort((first_docs, tcodes, fcodes))
        pdf = pdf.iloc[order].reset_index(drop=True)
        fcodes, tcodes = fcodes[order], tcodes[order]
        fields = pdf["field"].to_numpy(dtype=object)
        terms = pdf["term"].to_numpy(dtype=object)
        buckets = pdf["bucket"].to_numpy(dtype=np.int64)
        nd = pdf["n_docs"].to_numpy(dtype=np.int64)
        R = len(pdf)
        D = int(nd.sum())
        if D == 0:
            return
        run_doc_starts = np.concatenate(([0], np.cumsum(nd)[:-1]))
        # ---- batch decode of all runs ----
        docs_raw = b"".join(pdf["docs_bin"])
        tfs_raw = b"".join(pdf["tfs_bin"])
        dls_raw = b"".join(pdf["dls_bin"])
        pos_raw = b"".join(x if x is not None else b"" for x in pdf["pos_bin"])
        deltas = decode_varint(docs_raw, D).astype(np.int64)
        tfs = decode_varint(tfs_raw, D).astype(np.int64)
        dls = decode_varint(dls_raw, D).astype(np.int64)
        # absolute doc ids: segment cumsum (deltas reset at each run start)
        g = np.cumsum(deltas)
        corr = np.repeat(g[run_doc_starts] - deltas[run_doc_starts], nd)
        abs_ids = g - corr
        # ---- term groups (runs are sorted; ranges disjoint & ordered) ----
        new_term_run = np.empty(R, dtype=bool)
        new_term_run[0] = True
        new_term_run[1:] = (tcodes[1:] != tcodes[:-1]) | (fcodes[1:] != fcodes[:-1])
        term_run_idx = np.nonzero(new_term_run)[0]
        term_doc_starts = run_doc_starts[term_run_idx]
        term_doc_counts = np.diff(np.append(term_doc_starts, D))
        tidx = np.repeat(np.arange(term_run_idx.size), term_doc_counts)
        # per-term scoring constants (model-aware: see docstring)
        df_term = term_doc_counts.astype(np.float64)
        if model == "bm25":
            idf_t = np.log(1 + (n_docs - df_term + 0.5) / (df_term + 0.5))
            uniq_fields = pd.unique(fields[term_run_idx])
            ad_map = {f: (avgdl.get(f, 1.0) or 1.0) for f in uniq_fields}
            ad_t = pd.Series(fields[term_run_idx]).map(ad_map).to_numpy(dtype=np.float64)
            dlq = quantized_doc_length(dls) if quantize else dls.astype(np.float64)
            scores = idf_t[tidx] * (k1 + 1) * tfs / (
                tfs + k1 * (1 - b + b * dlq / ad_t[tidx]))
        else:  # DefaultSimilarity: sqrt(tf) * idf^2 * norm(dl), same
            # formula as the engine's decode kernel (search._decode_blocks)
            from xltsearch_spark.functions.norms import decoded_tf_idf_norm
            idf_t = 1 + np.log(n_docs / (df_term + 1))
            nrm = (decoded_tf_idf_norm(dls) if quantize
                   else np.where(dls > 0,
                                 1.0 / np.sqrt(np.maximum(dls, 1)), 0.0))
            scores = np.sqrt(tfs.astype(np.float64)) * (idf_t * idf_t)[tidx] * nrm
        # ---- block boundaries (within-term, never spanning terms) ----
        w = np.arange(D) - np.repeat(term_doc_starts, term_doc_counts)
        blk_starts = np.nonzero(w % block == 0)[0]
        blk_ends = np.append(blk_starts[1:], D)
        blk_ids = w[blk_starts] // block
        blk_tidx = tidx[blk_starts]
        # block metadata via segment reductions
        blk_max_score = np.maximum.reduceat(scores, blk_starts)
        blk_min_score = np.minimum.reduceat(scores, blk_starts)
        blk_max_tf = np.maximum.reduceat(tfs, blk_starts)
        blk_min_dl = np.minimum.reduceat(dls, blk_starts)
        skip_first = abs_ids[blk_starts]
        skip_last = abs_ids[blk_ends - 1]
        # doc-id deltas re-anchored at block starts, one grouped encode
        bdeltas = np.empty(D, dtype=np.int64)
        bdeltas[0] = abs_ids[0]
        bdeltas[1:] = abs_ids[1:] - abs_ids[:-1]
        bdeltas[blk_starts] = abs_ids[blk_starts]
        docs_buf, docs_off = encode_varint_grouped(bdeltas.astype(np.uint64), blk_starts)
        docs_end = np.append(docs_off[1:], len(docs_buf))
        # tf/dl payloads: slice the RAW concatenated streams at value offsets
        tf_starts_b = varint_value_starts(tfs_raw)
        dl_starts_b = varint_value_starts(dls_raw)
        tf_off = tf_starts_b[blk_starts]
        tf_end = np.append(tf_off[1:], len(tfs_raw))
        dl_off = dl_starts_b[blk_starts]
        dl_end = np.append(dl_off[1:], len(dls_raw))
        # position payloads: token-space offsets -> byte offsets
        tok_starts = np.concatenate(([0], np.cumsum(tfs)))
        pos_starts_b = varint_value_starts(pos_raw)
        total_pos_bytes = len(pos_raw)
        pos_tok0 = tok_starts[blk_starts]
        pos_off = pos_starts_b[pos_tok0] if pos_starts_b.size else np.zeros(blk_starts.size, np.int64)
        pos_end = np.append(pos_off[1:], total_pos_bytes)
        # ---- assemble ----
        run_fields = fields[term_run_idx]
        run_terms = terms[term_run_idx]
        run_buckets = buckets[term_run_idx]
        out = []
        for i in range(blk_starts.size):
            t = blk_tidx[i]
            out.append((run_fields[t], run_terms[t], int(run_buckets[t]),
                        int(blk_ids[i]), int(blk_ends[i] - blk_starts[i]),
                        int(skip_first[i]), int(skip_last[i]),
                        float(blk_max_score[i]), float(blk_min_score[i]),
                        int(blk_max_tf[i]), int(blk_min_dl[i]),
                        docs_buf[docs_off[i]:docs_end[i]],
                        tfs_raw[tf_off[i]:tf_end[i]],
                        dls_raw[dl_off[i]:dl_end[i]],
                        pos_raw[pos_off[i]:pos_end[i]]))
        cols = [f.name for f in POSTING_SCHEMA.fields]
        for j in range(0, len(out), 50000):
            yield pd.DataFrame(out[j:j + 50000], columns=cols)

    return to_blocks


class IndexBuilder:
    """Orchestrates the staged build. Used directly (in-memory DataFrames)
    or through ``catalog.IndexCatalog`` (persisted + checkpoint/resume)."""

    def __init__(self, spark: SparkSession, config: IndexConfig | None = None):
        self.spark = spark
        self.config = config or IndexConfig()

    def docs_stage(self, corpus: DataFrame, id_base: int = 0) -> DataFrame:
        """Stage 1: hashsum (B1, ``SelectTask.java:165-178`` w/ sha256 per
        BASELINE.json) + deterministic doc ids (dense from ``id_base`` in
        (repo, path) order — incremental segments pass maxDoc as the base,
        replicating Lucene's append-docids-at-the-end updateDocument).
        Pure built-in exprs."""
        df = corpus
        if "title" not in df.columns:
            df = df.withColumn("title", F.lit(None).cast("string"))
        if "hashsum" not in df.columns:
            # over the RAW content, before any parse: the sha256 row
            # invariant hashes input bytes (SelectTask.java:165-178)
            df = df.withColumn("hashsum", F.sha2(F.col("content").cast("binary"), 256))
        if self.config.parse_content:
            # B3 Tika stage inside the pipeline (ParseTask.java:55-77):
            # markup -> text. Failure contract per config.parse_keep_failed:
            # default = reference parity (failed docs skipped entirely,
            # IndexTask's `case PASS: break;`); True = metadata-only rows
            # survive as a documented extension.
            from xltsearch_spark.operators.parse import extract_text
            df = extract_text(df, "content", out_col="_extracted")
            if not self.config.parse_keep_failed:
                df = df.filter(F.col("parse_ok"))
            df = (df.withColumn("content", F.col("_extracted"))
                  .withColumn("parse_status",
                              F.when(F.col("parse_ok"), F.lit("ok"))
                              .otherwise(F.lit("failed")))
                  .drop("_extracted", "parse_ok"))
        cnt: list = []
        out = assign_doc_ids(df, id_base=id_base, out_count=cnt)
        self._last_doc_count = cnt[0] if cnt else None
        return out

    def runs_stage(self, docs: DataFrame) -> DataFrame:
        fields = docs.columns
        udf = make_tokenize_udf(self.config, fields)
        return docs.mapInPandas(udf, schema=RUN_SCHEMA)

    def dictionary_stage(self, runs: DataFrame) -> DataFrame:
        # explicit projection before the exchange (guide §2.3): the binary
        # posting payloads must never ride the dictionary shuffle
        return (runs.select("field", "term", "bucket", "n_docs", "sum_tf")
                .filter(F.col("term").isNotNull())
                .groupBy("field", "term")
                .agg(F.first("bucket").alias("bucket"),
                     F.sum("n_docs").cast("long").alias("doc_freq"),
                     F.sum("sum_tf").cast("long").alias("total_term_freq")))

    def stats_stage(self, docs: DataFrame, runs: DataFrame,
                    n_docs: int | None = None) -> BuildStats:
        if n_docs is None:
            n_docs = getattr(self, "_last_doc_count", None)
        if n_docs is None:
            n_docs = docs.count()
        ttf_rows = (runs.filter(F.col("term").isNotNull())
                    .groupBy("field").agg(F.sum("sum_tf").alias("ttf")).collect())
        sum_ttf = {r["field"]: int(r["ttf"]) for r in ttf_rows}
        avgdl = {f: (v / n_docs if n_docs else 1.0) or 1.0 for f, v in sum_ttf.items()}
        return BuildStats(n_docs=n_docs, avgdl=avgdl, sum_ttf=sum_ttf)

    def postings_stage(self, runs: DataFrame, stats: BuildStats) -> DataFrame:
        shuffled = (runs.filter(F.col("term").isNotNull())
                    .repartition(self.config.term_buckets, F.col("field"), F.col("bucket")))
        udf = make_block_udf(self.config, stats.n_docs, stats.avgdl)
        return shuffled.mapInPandas(udf, schema=POSTING_SCHEMA)

    def doc_norms(self, runs: DataFrame) -> DataFrame:
        """Per-(field, doc) lengths from the NULL-term rows (doc_stats table)."""
        dl_schema = StructType([
            StructField("field", StringType()), StructField("doc_id", LongType()),
            StructField("dl", LongType()),
        ])

        def explode_dl(it):
            for pdf in it:
                out = []
                for r in pdf.itertuples(index=False):
                    d = decode_deltas(r.docs_bin, int(r.n_docs))
                    l = decode_varint(r.tfs_bin, int(r.n_docs)).astype(np.int64)
                    out.append(pd.DataFrame({"field": r.field, "doc_id": d, "dl": l}))
                if out:
                    yield pd.concat(out, ignore_index=True)

        return runs.filter(F.col("term").isNull()).mapInPandas(explode_dl, schema=dl_schema)
