"""Robustness: parser fuzzing, unknown terms/fields, empty results."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from xltsearch_spark.config import IndexConfig
from xltsearch_spark.oracle.pyoracle import OracleIndex
from xltsearch_spark.plans.parser import QueryParseError, QueryParser

P = QueryParser("standard", keyword_fields=("repo", "lang"))


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_unexpectedly(q):
    """Any input either parses to an AST or raises QueryParseError."""
    try:
        ast = P.parse(q)
        assert ast is not None
    except QueryParseError:
        pass


@given(st.text(alphabet="abc ()\"~^+-*?:[]{}\\", min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_parser_special_char_soup(q):
    try:
        P.parse(q)
    except QueryParseError:
        pass


def mini():
    return pd.DataFrame({
        "repo": ["r0", "r0"], "path": ["a", "b"], "commit": ["c", "c"],
        "lang": ["py", "go"], "content": ["foo bar", "bar baz"],
        "title": [None, None]})


def test_unknown_term_and_field_empty():
    idx = OracleIndex(mini(), IndexConfig())
    assert idx.search("zzz_not_there", 10) == []
    assert idx.search("nosuchfield:foo", 10) == []
    assert idx.search("foo AND zzz_not_there", 10) == []
    # unknown MUST_NOT term doesn't block results
    assert len(idx.search("foo -zzz_not_there", 10)) == 1


def test_fuzzy_and_wildcard_no_matches():
    idx = OracleIndex(mini(), IndexConfig())
    assert idx.search("qqqqqqqq~1", 10) == []
    assert idx.search("zz*", 10) == []


def test_phrase_single_token_degrades_to_term():
    idx = OracleIndex(mini(), IndexConfig())
    one = idx.search('"foo"', 10)
    term = idx.search("foo", 10)
    assert [(h["doc_id"], h["score"]) for h in one] == \
        [(h["doc_id"], h["score"]) for h in term]


def test_stop_only_query_raises():
    idx = OracleIndex(mini(), IndexConfig())
    with pytest.raises(QueryParseError):
        idx.search("the", 10)
