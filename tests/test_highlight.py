"""functions/highlight.py: first-match snippet extraction invariants."""

import pytest

from pyspark.sql import functions as F

from xltsearch_spark.functions.highlight import highlight, snippet_cols


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "alpha beta merge gamma"),           # plain mid-string match
        (2, "merge at the very start"),          # pos 1, window clips left
        (3, "merged merges premerge vector x"),  # \b: only 'vector' matches
        (4, "no hits here at all"),              # no match -> NULLs
        (5, "x" * 200 + " merge " + "y" * 200),  # window clipping both ways
        (6, "vector then merge later"),          # earliest term wins
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snippet_positions_and_terms(frame):
    pos, term, snip = snippet_cols(F.col("text"), ["merge", "vector"])
    got = {r["doc_id"]: (r["p"], r["t"], r["s"]) for r in
           frame.select("doc_id", pos.alias("p"), term.alias("t"),
                        snip.alias("s")).collect()}
    # python-side oracle: same rule, independent implementation
    import re
    pat = re.compile(r"\b(merge|vector)\b")
    for did, text in [(1, "alpha beta merge gamma"),
                      (2, "merge at the very start"),
                      (3, "merged merges premerge vector x"),
                      (5, "x" * 200 + " merge " + "y" * 200),
                      (6, "vector then merge later")]:
        m = pat.search(text)
        start = max(m.start() - 40, 0)
        assert got[did] == (m.start() + 1, m.group(1),
                            text[start:start + 100]), did
    assert got[4] == (None, None, None)


def test_word_boundary_not_substring(frame):
    _, term, _ = snippet_cols(F.col("text"), ["merge"])
    r = {r["doc_id"]: r["t"] for r in
         frame.select("doc_id", term.alias("t")).collect()}
    assert r[3] is None  # merged/merges/premerge must NOT match 'merge'
    assert r[1] == "merge"


def test_highlight_join_keeps_hit_columns(spark, frame):
    hits = spark.createDataFrame([(1, 2.5), (4, 1.0)],
                                 "doc_id long, score double")
    out = {r["doc_id"]: r for r in
           highlight(hits, frame, ["merge"]).collect()}
    assert set(out) == {1, 4}
    assert out[1]["score"] == 2.5 and out[1]["term"] == "merge"
    assert out[4]["snippet"] is None


def test_empty_terms_raises(frame):
    with pytest.raises(ValueError):
        snippet_cols(F.col("text"), [])


def test_regex_metachar_terms_escaped(spark):
    df = spark.createDataFrame([(1, "a c++ b ab1_c d")],
                               "doc_id long, text string")
    # re.escape keeps a literal '+' from becoming a quantifier: the term
    # must not crash pattern compilation; it can't match either, because
    # \b needs a word char at the edge (analyzed tokens always are)
    _, term, _ = snippet_cols(F.col("text"), ["c++"])
    assert df.select(term.alias("t")).collect()[0]["t"] is None
    _, term2, _ = snippet_cols(F.col("text"), ["ab1_c"])
    assert df.select(term2.alias("t")).collect()[0]["t"] == "ab1_c"
