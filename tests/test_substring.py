"""Span-level substring dedup (operators/substring.py) — hand-computed
maximal-span cases plus hashed/string key-path parity."""

import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators.substring import (
    duplicated_spans, remove_duplicated_spans, substring_dedup_stats)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def words(prefix, k):
    return " ".join(f"{prefix}{i}" for i in range(k))


def test_cross_doc_duplicated_span(spark):
    # docs 0 and 1 share an exact 6-token passage embedded in unique text;
    # doc 2 is fully unique
    shared = words("dup", 6)
    docs = _docs(spark, [
        f"{words('a', 4)} {shared} {words('b', 4)}",
        f"{words('c', 2)} {shared}",
        words("z", 14),
    ])
    spans = {(r.doc_id, r.span_start, r.span_len)
             for r in duplicated_spans(docs, min_len=6, hashed=False).collect()}
    # doc 0: span starts at token 4; doc 1: at token 2; doc 2: nothing
    assert spans == {(0, 4, 6), (1, 2, 6)}


def test_overlapping_windows_merge_to_maximal_span(spark):
    # a shared 9-token passage with min_len=6 produces 4 overlapping
    # windows (starts 0..3 within the passage) that must merge into ONE
    # maximal span of length 9
    shared = words("s", 9)
    docs = _docs(spark, [
        f"{shared} {words('x', 3)}",
        f"{words('y', 5)} {shared}",
    ])
    rows = sorted((r.doc_id, r.span_start, r.span_len)
                  for r in duplicated_spans(docs, min_len=6, hashed=False).collect())
    assert rows == [(0, 0, 9), (1, 5, 9)]


def test_self_repetition_counts_as_duplication(spark):
    # the same 5-token phrase twice in ONE doc: both occurrences are
    # duplicated windows (Lee et al. count any corpus-wide repeat);
    # separated by > min_len unique tokens they stay two distinct spans
    phrase = words("r", 5)
    docs = _docs(spark, [f"{phrase} {words('m', 8)} {phrase}"])
    rows = sorted((r.span_start, r.span_len)
                  for r in duplicated_spans(docs, min_len=5, hashed=False).collect())
    assert rows == [(0, 5), (13, 5)]


def test_short_docs_and_no_dup_emit_nothing(spark):
    docs = _docs(spark, ["one two three", words("u", 30)])
    assert duplicated_spans(docs, min_len=6, hashed=False).count() == 0


def test_stats_rollup_and_dup_frac(spark):
    shared = words("d", 6)
    # doc 0 = exactly the shared passage (fully duplicated, dup_frac 1.0)
    docs = _docs(spark, [shared, f"{words('p', 6)} {shared} {words('q', 6)}"])
    st = {r.doc_id: r for r in
          substring_dedup_stats(docs, min_len=6, hashed=False).collect()}
    assert st[0].n_spans == 1 and st[0].dup_tokens == 6
    assert st[0].n_tokens == 6 and st[0].dup_frac == 1.0
    assert st[1].dup_tokens == 6 and st[1].n_tokens == 18
    assert st[1].dup_frac == pytest.approx(6 / 18, abs=1e-6)
    assert st[1].max_span_len == 6


def test_hashed_path_matches_string_path(spark, small_corpus):
    pdf = small_corpus[["content"]].rename(columns={"content": "text"})
    pdf.insert(0, "doc_id", range(len(pdf)))
    docs = spark.createDataFrame(pdf)
    a = sorted(map(tuple, duplicated_spans(docs, 10, hashed=False).collect()))
    b = sorted(map(tuple, duplicated_spans(docs, 10, hashed=True).collect()))
    assert a == b


def test_remove_spans_keeps_first_occurrence_only(spark):
    # doc 0 holds the corpus-first occurrence -> untouched; docs 1 and 2
    # get the shared passage cut but keep their unique tokens
    shared = words("d", 6)
    docs = _docs(spark, [
        f"{shared} {words('a', 3)}",
        f"{words('b', 3)} {shared}",
        f"{shared}",
    ])
    out = {r.doc_id: r for r in
           remove_duplicated_spans(docs, min_len=6, hashed=False).collect()}
    assert out[0].n_cut_tokens == 0 and out[0].clean_text == \
        f"{shared} {words('a', 3)}"
    assert out[1].n_cut_tokens == 6 and out[1].clean_text == words("b", 3)
    assert out[2].n_cut_tokens == 6 and out[2].clean_text == ""
    assert all(out[i].n_tokens == 9 for i in (0, 1)) and out[2].n_tokens == 6


def test_remove_spans_self_repetition_keeps_first_copy(spark):
    phrase = words("r", 5)
    docs = _docs(spark, [f"{phrase} {words('m', 8)} {phrase}"])
    out = remove_duplicated_spans(docs, 5, hashed=False).collect()[0]
    assert out.clean_text == f"{phrase} {words('m', 8)}"
    assert out.n_cut_tokens == 5


def test_remove_spans_noop_without_duplicates(spark):
    docs = _docs(spark, [words("u", 30), "short one"])
    out = {r.doc_id: r for r in
           remove_duplicated_spans(docs, 6, hashed=False).collect()}
    assert out[0].n_cut_tokens == 0 and out[0].clean_text == words("u", 30)
    assert out[1].n_cut_tokens == 0 and out[1].clean_text == "short one"


def test_tokenization_matches_dedup_family(spark):
    # punctuation / case folds away exactly like the \w+ dedup convention:
    # the two docs differ only in case+punctuation -> same token windows
    base = words("t", 7)
    docs = _docs(spark, [base, base.upper().replace(" ", ", ") + "!"])
    rows = duplicated_spans(docs, min_len=7, hashed=False).collect()
    assert sorted((r.doc_id, r.span_start, r.span_len) for r in rows) == \
        [(0, 0, 7), (1, 0, 7)]


def test_max_window_df_drops_hot_windows_from_report(spark):
    """Hot-window skew cap (VERDICT r4 #6): a boilerplate header stamped
    across 10^4 docs is ONE join key — with max_window_df set below its
    occurrence count it vanishes from span REPORTING while the normal
    2-copy passage still reports; remove_duplicated_spans (no cap) still
    cuts the hot passage down to exactly one surviving copy."""
    hot = words("hot", 6)          # appears in 10_000 docs
    shared = words("dup", 6)       # appears in exactly 2 docs
    n_hot = 10_000
    texts = [f"{words('u%d_' % i, 2)} {hot}" for i in range(n_hot)]
    texts.append(f"{words('a', 3)} {shared}")
    texts.append(f"{shared} {words('b', 3)}")
    docs = _docs(spark, texts)

    capped = duplicated_spans(docs, min_len=6, hashed=True,
                              max_window_df=100).collect()
    assert sorted((r.doc_id, r.span_start, r.span_len) for r in capped) == \
        [(n_hot, 3, 6), (n_hot + 1, 0, 6)]  # only the 2-copy passage

    # uncapped: every hot doc reports its span too
    full = duplicated_spans(docs, min_len=6, hashed=True).count()
    assert full == n_hot + 2

    # the ACTION is cap-independent: one copy of the hot passage survives
    cleaned = remove_duplicated_spans(docs, 6, hashed=True)
    survivors = cleaned.filter(F.col("n_cut_tokens") == 0) \
        .filter(F.col("clean_text").contains("hot0"))
    assert survivors.count() == 1  # argmin (doc 0) keeps its copy


def test_max_window_df_stats_passthrough(spark):
    hot = words("h", 6)
    docs = _docs(spark, [hot, hot, hot, hot])
    assert substring_dedup_stats(docs, 6, max_window_df=3).count() == 0
    assert substring_dedup_stats(docs, 6).count() == 4
