"""B3 — document parsing / text extraction (the reference's Tika stage).

The reference pipes every file through Tika's ``AutoDetectParser``
(ParseTask.java:55-77): content-type detection, markup-to-text extraction,
and the failure-degradation contract — a document whose body fails to parse
is still indexed with its metadata, flagged as a parse failure
(ParseTask.java:70-75 catches per-document and keeps going).

Spark-first re-expression: both stages are pure column expressions
(``F.when`` + ``F.regexp_replace`` chains), so they run inside whole-stage
codegen on the JVM — no UDF, no Python worker, trivially scalable: the
plan is a map-only projection with full predicate pushdown below it.

Supported formats (the text-bearing subset that matters for a plain-text /
source-code corpus; binary formats like PDF/DOCX need external parser libs
not present in this sandbox and degrade per the contract):

* ``html`` / ``xml``  — drop <script>/<style> subtrees and comments, strip
  tags (replaced by a space, as Tika's ToTextContentHandler inserts
  whitespace between elements), decode the five XML entities + ``&nbsp;``.
* ``markdown``        — strip ATX heading markers, code-fence markers,
  emphasis/backtick runs, and rewrite ``[text](url)`` links to ``text``.
* ``plain``           — identity.
* ``binary``          — detection only: content containing NUL/control
  bytes sets ``parse_ok=false`` and extracts an empty body; the row (and
  its metadata columns) stays in the output, mirroring Tika's degradation.

All regexes are deliberately RE2-compatible (no lookaround, no backrefs in
patterns) so the DuckDB oracle can run the byte-identical chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# format sniffing, in priority order (first match wins) -------------------
# NUL or C0 control chars (minus \t \n \r) => binary payload
_BINARY_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_XML_DECL_RE = "^\\s*<\\?xml"
_HTML_RE = "(?is)^\\s*(<!doctype\\s+html|<html[\\s>])"
# any tag pair further down still means markup (html snippet without prolog)
_TAG_RE = "(?is)<[a-z][a-z0-9]*(\\s[^>]*)?>.*</[a-z][a-z0-9]*>"
# markdown: an ATX heading line, a code fence, or a [text](url) link
_MARKDOWN_RE = "(?m)(^#{1,6} )|(^```)|(\\[[^\\]]+\\]\\([^)]+\\))"


# Tika sniffs a bounded head window (its detectors read a prefix, not the
# whole stream); we do the same. This is also the scale guard: _TAG_RE's
# `.*` backtracks O(tags x bytes) on pathological markup, so detection
# regexes must never see an unbounded document — 4 KiB caps that cost,
# while the extraction chain below stays full-doc and linear.
SNIFF_LEN = 4096


def detect_format(content: Column, sniff_len: int = SNIFF_LEN) -> Column:
    """Content-type sniffing as a single JVM CASE expression.

    Mirrors Tika detection priorities: container/binary signatures first,
    declared markup prologs next, then content heuristics, else plain —
    all evaluated on the first ``sniff_len`` chars only.
    """
    head = F.substring(content, 1, sniff_len)
    return (
        F.when(content.isNull(), F.lit("binary"))
        .when(head.rlike(_BINARY_RE), F.lit("binary"))
        .when(head.rlike(_XML_DECL_RE), F.lit("xml"))
        .when(head.rlike(_HTML_RE), F.lit("html"))
        .when(head.rlike(_TAG_RE), F.lit("html"))
        .when(head.rlike(_MARKDOWN_RE), F.lit("markdown"))
        .otherwise(F.lit("plain")))


def _strip_markup(c: Column) -> Column:
    """HTML/XML -> text: script/style subtrees, comments, tags, entities."""
    c = F.regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, "(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, "<[^>]*>", " ")
    # entity decode; &amp; LAST so '&amp;lt;' becomes '&lt;' not '<'
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _strip_markdown(c: Column) -> Column:
    """Markdown -> text: headings, fences, emphasis, links."""
    c = F.regexp_replace(c, "(?m)^#{1,6} ", "")
    c = F.regexp_replace(c, "(?m)^```[a-zA-Z0-9]*$", " ")
    # [text](url) -> text (RE2 and Java both support group refs in the
    # replacement; Spark spells it $1)
    c = F.regexp_replace(c, "\\[([^\\]]+)\\]\\([^)]+\\)", "$1")
    c = F.regexp_replace(c, "[*`]+", "")
    return c


def _collapse_ws(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def extract_text(df: DataFrame, content_col: str = "content",
                 out_col: str = "extracted") -> DataFrame:
    """Add ``format``, ``parse_ok`` and ``out_col`` columns.

    One map-only projection; rows never drop (Tika degradation: binary /
    unparseable content yields ``parse_ok=false`` with an empty body while
    the metadata columns survive to be indexed).
    """
    c = F.col(content_col)
    fmt = detect_format(c)
    markup = _collapse_ws(_strip_markup(c))
    md = _collapse_ws(_strip_markdown(c))
    plain = _collapse_ws(c)
    extracted = (
        F.when(fmt == "binary", F.lit(""))
        .when((fmt == "html") | (fmt == "xml"), markup)
        .when(fmt == "markdown", md)
        .otherwise(plain))
    return (df.withColumn("format", fmt)
            .withColumn("parse_ok", fmt != F.lit("binary"))
            .withColumn(out_col, extracted))
