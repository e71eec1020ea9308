"""B3 — document parsing / text extraction (the reference's Tika stage).

The reference pipes every file through Tika's ``AutoDetectParser``
(ParseTask.java:55-77): content-type detection and markup-to-text
extraction. The FAILURE contract differs by level:

* Operator level (``extract_text``): rows NEVER drop — every input row
  comes back with ``format`` / ``parse_ok`` / extracted-text columns and
  the caller decides. Unparseable (binary) content yields ``parse_ok=false``
  and an empty body.
* Pipeline level (``parse_content=True`` builds): the reference SKIPS a
  parse-failed document entirely — ``ParseTask`` catches per-document and
  sets ``Status.PASS`` (ParseTask.java:70-75), and ``IndexTask``'s
  ``case PASS: break;`` never indexes it. The build mirrors that: failed
  rows are DROPPED by default. ``parse_keep_failed=True`` is a documented
  EXTENSION beyond the reference: failed docs stay indexed metadata-only
  (``parse_status:failed`` is queryable), counted in N/avgdl.

Spark-first re-expression: detection and extraction are pure column
expressions (``F.when`` + ``F.regexp_replace`` chains), so they run inside
whole-stage codegen on the JVM — no UDF, no Python worker; the plan is a
map-only projection with full predicate pushdown below it.

Pluggable parser registry — the ``AutoDetectParser`` seam: each format is a
``ParserSpec(name, detect, extract)`` held in priority order. ``detect``
receives (full content, head window) and returns a boolean Column;
``extract`` maps the content Column to extracted text, or is ``None`` for
formats that are *detected* but not parseable here (they degrade exactly
like ``binary``). A real deployment registers e.g. a PDF extractor with
``register_parser`` without touching the pipeline; this sandbox ships the
text-bearing built-ins (html/xml/markdown + binary detection) because
binary-format parser libraries are not available here.

Built-in formats:

* ``binary``   — NUL/C0-control detection over the FULL content (the check
  is a linear scan, so unlike the markup heuristics it needs no head cap;
  a control byte after the sniff window still degrades the row, matching
  Tika's stream-wide behavior). No extractor: ``parse_ok=false``.
* ``xml`` / ``html`` — drop <script>/<style> subtrees and comments, strip
  tags (replaced by a space, as Tika's ToTextContentHandler inserts
  whitespace between elements), decode entities per ``XML_ENTITIES``.
* ``markdown`` — strip ATX heading markers, code-fence markers,
  emphasis/backtick runs, and rewrite ``[text](url)`` links to ``text``.
* ``plain``    — identity (the fallback when nothing detects).

All regexes are deliberately RE2-compatible (no lookaround, no backrefs in
patterns) so the DuckDB oracle can run the byte-identical chain.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

# format sniffing regexes, used by the built-in specs ---------------------
# NUL or C0 control chars (minus \t \n \r) => binary payload
_BINARY_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_XML_DECL_RE = "^\\s*<\\?xml"
_HTML_RE = "(?is)^\\s*(<!doctype\\s+html|<html[\\s>])"
# any tag pair further down still means markup (html snippet without prolog)
_TAG_RE = "(?is)<[a-z][a-z0-9]*(\\s[^>]*)?>.*</[a-z][a-z0-9]*>"
# markdown: an ATX heading line, a code fence, or a [text](url) link
_MARKDOWN_RE = "(?m)(^#{1,6} )|(^```)|(\\[[^\\]]+\\]\\([^)]+\\))"


# Tika sniffs a bounded head window (its detectors read a prefix, not the
# whole stream); the markup/markdown heuristics do the same. This is also
# the scale guard: _TAG_RE's `.*` backtracks O(tags x bytes) on pathological
# markup, so those detection regexes must never see an unbounded document —
# 4 KiB caps that cost. The BINARY check is exempt: a character-class scan
# is linear, so it runs over the full content (a control byte after the
# window must still degrade the row). The extraction chain below is
# full-doc and linear too.
SNIFF_LEN = 4096

# entity -> character decode table (literal replaces; none of these emit
# '&', so order among them is irrelevant and no cascade is possible).
# Numeric/hex forms: a regexp chain cannot compute arbitrary codepoints, so
# the frequent markup-relevant ones are mapped and the rest pass through
# literally — a documented gap vs Tika's full entity decoding.
XML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&#34;", "\""), ("&#60;", "<"), ("&#62;", ">"), ("&#160;", " "),
    ("&#x22;", "\""), ("&#x27;", "'"), ("&#x3c;", "<"), ("&#x3e;", ">"),
)
# every '&'-PRODUCING entity (&amp; / &#38; / &#x26;) decodes in ONE regexp
# pass, run LAST: regex replacement output is never rescanned, so
# '&amp;lt;' -> '&lt;' and '&#38;amp;' -> '&amp;' each decode exactly one
# level (a sequence of literal replaces cannot achieve this — whichever
# amp-form ran later would re-decode the earlier one's output).
AMP_ENTITY_RE = "&(amp;|#38;|#x26;)"


def _strip_markup(c: Column) -> Column:
    """HTML/XML -> text: script/style subtrees, comments, tags, entities."""
    c = F.regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, "(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, "<[^>]*>", " ")
    for ent, ch in XML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.regexp_replace(c, AMP_ENTITY_RE, "&")


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


# ------------------------- parser registry -------------------------------
@dataclass(frozen=True)
class ParserSpec:
    """One registered format.

    ``detect(content, head)`` -> boolean Column; specs are tried in registry
    order, first match wins (Tika detector priority). ``extract(content)``
    -> extracted-text Column, or ``None`` when the format is detectable but
    not parseable in this deployment — such rows degrade exactly like
    ``binary`` (``parse_ok=false``, empty body, metadata survives)."""
    name: str
    detect: Callable[[Column, Column], Column]
    extract: Callable[[Column], Column] | None


_BUILTINS = (
    # binary first (container signatures beat declared markup in Tika);
    # NULL content is unreadable-stream degradation
    ParserSpec("binary",
               lambda c, h: c.isNull() | c.rlike(_BINARY_RE), None),
    ParserSpec("xml",
               lambda c, h: h.rlike(_XML_DECL_RE),
               lambda c: _collapse_ws(_strip_markup(c))),
    ParserSpec("html",
               lambda c, h: h.rlike(_HTML_RE) | h.rlike(_TAG_RE),
               lambda c: _collapse_ws(_strip_markup(c))),
    ParserSpec("markdown",
               lambda c, h: h.rlike(_MARKDOWN_RE),
               lambda c: _collapse_ws(_strip_markdown(c))),
)

# insertion order = detection priority; "plain" is the implicit fallback
# (identity + whitespace collapse) and cannot be unregistered
_REGISTRY: dict[str, ParserSpec] = {p.name: p for p in _BUILTINS}


def registered_parsers() -> tuple[str, ...]:
    """Format names in detection-priority order (excluding the 'plain'
    fallback)."""
    return tuple(_REGISTRY)


def register_parser(name: str,
                    detect: Callable[[Column, Column], Column],
                    extract: Callable[[Column], Column] | None,
                    before: str | None = None) -> None:
    """Register (or replace) a format parser — the AutoDetectParser seam.

    ``before`` inserts the spec ahead of an existing format in detection
    priority (default: lowest priority, just above the 'plain' fallback).
    Pass ``extract=None`` to register detection-only (rows of that format
    degrade like binary)."""
    spec = ParserSpec(name, detect, extract)
    if before is not None:
        if before not in _REGISTRY:
            raise KeyError(f"unknown format to insert before: {before!r}")
        items = []
        for k, v in list(_REGISTRY.items()):
            if k == before:
                items.append((name, spec))
            if k != name:
                items.append((k, v))
        _REGISTRY.clear()
        _REGISTRY.update(items)
    else:
        _REGISTRY.pop(name, None)
        _REGISTRY[name] = spec


def unregister_parser(name: str) -> None:
    if name not in _REGISTRY:
        raise KeyError(f"format not registered: {name!r}")
    del _REGISTRY[name]


def detect_format(content: Column, sniff_len: int = SNIFF_LEN) -> Column:
    """Content-type sniffing as a single JVM CASE expression over the
    registry (first matching spec wins, else 'plain')."""
    head = F.substring(content, 1, sniff_len)
    expr = None
    for spec in _REGISTRY.values():
        cond = spec.detect(content, head)
        expr = F.when(cond, F.lit(spec.name)) if expr is None \
            else expr.when(cond, F.lit(spec.name))
    if expr is None:
        return F.lit("plain")
    return expr.otherwise(F.lit("plain"))


def extract_text(df: DataFrame, content_col: str = "content",
                 out_col: str = "extracted") -> DataFrame:
    """Add ``format``, ``parse_ok`` and ``out_col`` columns.

    One map-only projection; rows never drop at THIS level (the
    ``parse_content=True`` build applies the reference's skip-on-failure
    afterwards — see the module docstring for the two-level contract).
    """
    c = F.col(content_col)
    fmt = detect_format(c)
    extracted = None
    failed_cond = None
    for spec in _REGISTRY.values():
        hit = fmt == F.lit(spec.name)
        if spec.extract is None:
            failed_cond = hit if failed_cond is None else (failed_cond | hit)
            branch = F.lit("")
        else:
            branch = spec.extract(c)
        extracted = F.when(hit, branch) if extracted is None \
            else extracted.when(hit, branch)
    plain = _collapse_ws(c)
    extracted = plain if extracted is None else extracted.otherwise(plain)
    parse_ok = F.lit(True) if failed_cond is None else ~failed_cond
    return (df.withColumn("format", fmt)
            .withColumn("parse_ok", parse_ok)
            .withColumn(out_col, extracted))


def chunk_documents(df, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 128, overlap: int = 32):
    """Split documents into overlapping word-window chunks — the RAG /
    long-context ingestion step (chunk i covers words
    [i*step, i*step + chunk_tokens), step = chunk_tokens - overlap).

    Deterministic layout: n_chunks = ceil((n_words - overlap) / step)
    (>= 1 for any non-empty doc; empty/NULL text yields no rows), so
    chunk ids are reproducible under any partitioning. Chunk text is
    whitespace-canonicalized (split + single-space join) — the same
    canonical form `textstats.fingerprints` hashes.

    Scale shape: pure built-in expressions (split → sequence →
    posexplode → slice → array_join), map-only — fuses into the scan
    with no shuffle; output rows ~ corpus_tokens / step.
    """
    from pyspark.sql import functions as F
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens "
                         f"({chunk_tokens})")
    step = chunk_tokens - overlap
    words = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                     lambda w: w != "")
    base = df.select(F.col(id_col), words.alias("_w"),
                     F.size(words).alias("_n"))
    n_chunks = F.when(F.col("_n") <= 0, F.lit(0)).otherwise(
        F.greatest(F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(step)),
                   F.lit(1)))
    chunks = (base.withColumn("_k", n_chunks)
              .filter(F.col("_k") > 0)
              .select(id_col, "_w", "_n",
                      F.explode(F.sequence(F.lit(0), F.col("_k") - 1))
                      .alias("chunk_id")))
    piece = F.slice(F.col("_w"), F.col("chunk_id") * step + 1, chunk_tokens)
    return chunks.select(
        F.col(id_col), F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
