"""Analyzer golden tests (SURVEY.md §5.1): token streams (term, position)
per profile over the FIXTURES.md §3 probe strings."""

import pandas as pd
import pytest

from xltsearch_spark.analyzers import (ENGLISH_STOP_WORDS, analyze_flat,
                                       analyze_text, doc_lengths, profiles)

PROBE = ("The Author's book and I.B.M. went to http://example.com/q?x=1 "
         "mail dev@example.com")


def test_stop_set_is_lucene_433():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "a", "into", "such", "will"} <= ENGLISH_STOP_WORDS


def test_standard_profile_golden():
    assert analyze_text(PROBE, "standard") == [
        ("author's", 1), ("book", 2), ("i.b.m", 4), ("went", 5),
        ("http", 7), ("example.com", 8), ("q", 9), ("x", 10), ("1", 11),
        ("mail", 12), ("dev", 13), ("example.com", 14)]


def test_classic_profile_golden():
    # ClassicFilter: acronym dots stripped, trailing 's stripped, email whole
    assert analyze_text(PROBE, "classic") == [
        ("author", 1), ("book", 2), ("ibm", 4), ("went", 5),
        ("http", 7), ("example.com", 8), ("q", 9), ("x", 10), ("1", 11),
        ("mail", 12), ("dev@example.com", 13)]


def test_uax29urlemail_profile_golden():
    assert analyze_text(PROBE, "uax29urlemail") == [
        ("author's", 1), ("book", 2), ("i.b.m", 4), ("went", 5),
        ("http://example.com/q?x=1", 7), ("mail", 8), ("dev@example.com", 9)]


def test_english_profile_possessive_and_stemming():
    toks = analyze_text("The runner's dogs were running quickly", "english")
    assert toks == [("runner", 1), ("dog", 2), ("were", 3), ("run", 4), ("quickli", 5)]


def test_code_profile_subtokens_overlap():
    toks = analyze_text("CamelCaseIdentifier snake_case_name", "code")
    # parent token + sub-tokens at the SAME position (posIncr=0 overlaps)
    assert ("camelcaseidentifier", 0) in toks and ("camel", 0) in toks
    assert ("case", 0) in toks and ("identifier", 0) in toks
    assert ("snake_case_name", 1) in toks and ("snake", 1) in toks


def test_stop_words_leave_position_gaps():
    toks = analyze_text("alpha the beta", "standard")
    assert toks == [("alpha", 0), ("beta", 2)]


def test_max_token_length_chunks():
    long_tok = "x" * 300
    toks = analyze_text(f"start {long_tok} end", "standard")
    assert toks[0] == ("start", 0)
    assert toks[1] == ("x" * 255, 1)
    assert toks[2] == ("x" * 45, 2)
    assert toks[3] == ("end", 3)


def test_doc_lengths_discount_overlaps():
    texts = pd.Series(["CamelCaseIdentifier alpha", "alpha beta gamma"])
    flat = analyze_flat(texts, "code")
    dl = doc_lengths(flat, 2)
    # sub-tokens are overlaps; dl counts only parent tokens
    assert dl.tolist() == [2, 3]


def test_mixed_case_folds_together():
    a = analyze_text("Foo foo FOO", "standard")
    assert [t for t, _ in a] == ["foo", "foo", "foo"]


@pytest.mark.parametrize("profile", profiles())
def test_empty_and_null_safe(profile):
    flat = analyze_flat(pd.Series(["", None, "   "]), profile)
    assert len(flat) == 0
    assert doc_lengths(flat, 3).tolist() == [0, 0, 0]
