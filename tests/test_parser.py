"""Classic QueryParser grammar tests (SURVEY.md Q1)."""

import pytest

from xltsearch_spark.plans.parser import (BooleanQuery, FuzzyQuery, MatchAllQuery,
                                          MUST, MUST_NOT, PhraseQuery, PrefixQuery,
                                          QueryParser, QueryParseError, RangeQuery, RegexpQuery,
                                          SHOULD, TermQuery, WildcardQuery)

P = QueryParser("standard", keyword_fields=("repo", "path", "commit", "lang", "hashsum"))


def test_single_term_default_field():
    assert P.parse("needle_17") == TermQuery("content", "needle_17")


def test_and_promotes_both_sides():
    q = P.parse("foo AND bar")
    assert q.clauses == ((MUST, TermQuery("content", "foo")),
                         (MUST, TermQuery("content", "bar")))


def test_default_operator_is_or():
    q = P.parse("foo bar")
    assert all(occ == SHOULD for occ, _ in q.clauses)


def test_not_and_minus_and_plus():
    q = P.parse("+foo -bar NOT baz")
    assert q.clauses[0][0] == MUST
    assert q.clauses[1][0] == MUST_NOT
    assert q.clauses[2][0] == MUST_NOT


def test_phrase_with_slop_and_stop_gap():
    q = P.parse('"alpha the beta"~1')
    assert isinstance(q, PhraseQuery)
    assert q.terms == (("alpha", 0), ("beta", 2))  # gap where 'the' was stopped
    assert q.slop == 1


def test_field_scoped_term_is_analyzed():
    assert P.parse("title:Module") == TermQuery("title", "module")


def test_keyword_field_not_analyzed():
    # lang is a StringField-like keyword: no lowercasing/analysis
    assert P.parse("lang:Python") == TermQuery("lang", "Python")


def test_field_group_propagates():
    q = P.parse("title:(foo bar)")
    assert all(c.field == "title" for _, c in q.clauses)


def test_boost_on_term_and_group():
    assert P.parse("graded^2").boost == 2.0
    g = P.parse("(foo bar)^3")
    assert g.boost == 3.0


def test_prefix_wildcard_fuzzy_range():
    assert P.parse("need*") == PrefixQuery("content", "need")
    assert P.parse("wi?d*") == WildcardQuery("content", "wi?d*")
    assert P.parse("gradd~1") == FuzzyQuery("content", "gradd", 1)
    assert P.parse("fuzzy~") == FuzzyQuery("content", "fuzzy", 2)  # bare ~ = 2 edits
    r = P.parse("{a0 TO b0}")
    assert r == RangeQuery("content", "a0", "b0", False, False)


def test_match_all():
    assert P.parse("*:*") == MatchAllQuery()


def test_stopword_only_clause_dropped():
    # 'the' analyzes to nothing -> clause dropped, like classic QP
    q = P.parse("the foo")
    assert q == TermQuery("content", "foo")


def test_escapes():
    # escaped ':' defeats field syntax; the analyzer then splits on ':'
    q = P.parse(r"foo\:bar")
    assert isinstance(q, BooleanQuery)
    assert [c.term for _, c in q.clauses] == ["foo", "bar"]
    assert all(c.field == "content" for _, c in q.clauses)


def test_hyphen_inside_term_is_not_negation():
    q = P.parse("wi-fi")
    # analyzer splits on '-', giving an OR of the two tokens
    assert isinstance(q, BooleanQuery)
    assert [c.term for _, c in q.clauses] == ["wi", "fi"]


def test_unbalanced_paren_raises():
    with pytest.raises(QueryParseError):
        P.parse("foo)")


def test_a_and_b_or_c_classic_semantics():
    q = P.parse("x1 AND y1 OR z1")
    assert q.clauses == ((MUST, TermQuery("content", "x1")),
                         (MUST, TermQuery("content", "y1")),
                         (SHOULD, TermQuery("content", "z1")))


def test_escaped_wildcard_stays_literal():
    """foo\\*bar* : escaped * is a literal, trailing * is the only wildcard
    (classic QP keeps escaped wildcards literal)."""
    from xltsearch_spark.plans.parser import QueryParser, WildcardQuery, PrefixQuery
    from xltsearch_spark.plans.rewrite import _wildcard_regex
    p = QueryParser("standard")
    # only wildcard is the trailing * -> prefix fast path with LITERAL '*'
    q = p.parse(r"foo\*bar*")
    assert isinstance(q, PrefixQuery) and q.prefix == "foo*bar"
    # mixed: unescaped ? is a wildcard, escaped * stays literal
    q1 = p.parse(r"me?g\*e")
    assert isinstance(q1, WildcardQuery)
    rx = _wildcard_regex(q1.pattern)
    assert rx.match("mexg*e") and not rx.match("mexgye") and not rx.match("meg*e")
    # a lone escaped * is not a wildcard at all -> literal term via analyzer
    q2 = p.parse(r"me\?ge")
    assert not isinstance(q2, (WildcardQuery, PrefixQuery))
    # trailing unescaped * still takes the prefix fast path
    q3 = p.parse(r"mer*")
    assert isinstance(q3, PrefixQuery) and q3.prefix == "mer"


def test_escaped_backslash_then_wildcard():
    r"""foo\\* = escaped backslash + LIVE wildcard -> prefix query for 'foo\'
    (a naive lookbehind reads the * as escaped and drops the wildcard)."""
    from xltsearch_spark.plans.parser import QueryParser, PrefixQuery
    p = QueryParser("standard")
    q = p.parse("foo\\\\*")
    assert isinstance(q, PrefixQuery) and q.prefix == "foo\\"


def test_regexp_term():
    # classic QP /regexp/ syntax (Lucene 4.x RegexpQuery)
    assert P.parse("/merg(e|ing)/") == RegexpQuery("content", "merg(e|ing)")
    assert P.parse("lang:/de|fr/") == RegexpQuery("lang", "de|fr")
    q = P.parse("/nee.le_[0-9]+/^2")
    assert q == RegexpQuery("content", "nee.le_[0-9]+", 2.0)
    # lowercaseExpandedTerms applies to the pattern
    assert P.parse("/MerGe/") == RegexpQuery("content", "merge")
    # escaped slash stays literal inside the pattern
    assert P.parse("/src\\/main/") == RegexpQuery("content", "src/main")
    # a path-like atom with interior unescaped slashes is NOT a regexp
    got = P.parse("src/main")
    assert isinstance(got, BooleanQuery)
    # composes with boolean operators
    b = P.parse("merge AND /vec.+/")
    assert b.clauses[1] == (MUST, RegexpQuery("content", "vec.+"))
