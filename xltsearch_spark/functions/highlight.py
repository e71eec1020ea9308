"""Result highlighting: first-match snippet extraction (the Lucene
``highlighter`` module's SimpleFragmenter analog — public semantics; the
reference's details pane shows stored metadata only, App.java:184, so
this is an engine extension like MoreLikeThis/suggest).

Rule (deterministic, oracle-checkable): the snippet anchors on the FIRST
occurrence of any query term at a token boundary (alternation tries the
terms in sorted order at each position, so overlapping-prefix ties are
lexicographic); the fragment is a fixed-length character window starting
``before`` chars left of the match, clipped to the text start.

Scale shape: one map-only composed JVM expression (two regexp_extract +
substring) over ONLY the k hit rows it is applied to — highlighting is
meant to run AFTER top-k, on a broadcast-joined hits x doc-store frame,
never corpus-wide.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# (?s): '.' spans newlines so the lazy prefix crosses line boundaries the
# same way in Spark (Java regex) and any RE2-based oracle.
_PAT = r"(?s)^(.*?)\b({alts})\b"


def _pattern(terms: list[str]) -> str:
    if not terms:
        raise ValueError("highlight needs at least one term")
    return _PAT.format(alts="|".join(re.escape(t) for t in sorted(terms)))


def snippet_cols(text: Column, terms: list[str], before: int = 40,
                 length: int = 100) -> tuple[Column, Column, Column]:
    """(pos, term, snippet) columns for the first token-boundary match of
    any of ``terms`` in ``text``. ``pos`` is the 1-based char offset of
    the match; all three are NULL when nothing matches."""
    pat = _pattern(terms)
    pre = F.regexp_extract(text, pat, 1)
    term = F.regexp_extract(text, pat, 2)
    matched = term != F.lit("")
    pos = F.when(matched, F.length(pre) + F.lit(1))
    start = F.greatest(F.length(pre) + F.lit(1) - F.lit(before), F.lit(1))
    snippet = F.when(matched, F.substring(text, start, F.lit(length)))
    return pos, F.when(matched, term), snippet


def highlight(hits: DataFrame, doc_store: DataFrame, terms: list[str],
              id_col: str = "doc_id", text_col: str = "text",
              before: int = 40, length: int = 100) -> DataFrame:
    """Attach (pos, term, snippet) to a top-k ``hits`` frame by fetching
    ``text_col`` from ``doc_store`` — hits are broadcast (k rows), the
    store scan prunes to the id join keys."""
    pos, term, snip = snippet_cols(F.col(text_col), terms, before, length)
    j = F.broadcast(hits).join(doc_store.select(id_col, text_col), id_col)
    return j.select(*hits.columns, pos.alias("pos"), term.alias("term"),
                    snip.alias("snippet"))
