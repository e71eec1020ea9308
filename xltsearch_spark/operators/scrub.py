"""PII scrubbing for training-data pipelines.

Pre-training corpora are routinely scrubbed of personally identifying
strings (emails, IPs, phone numbers) before anything downstream sees them.
This stage is a pure JVM projection, exactly like ``operators/parse.py``:
chained ``regexp_replace`` column expressions — no UDF, no shuffle, scales
with scan bytes, and the whole chain is whole-stage-codegen'd.

Patterns are deliberately RE2-compatible (no lookaround, no backrefs) so
the DuckDB oracle runs the byte-identical chain:

* email  -> ``<EMAIL>``  — local@domain.tld with the common charset
* ipv4   -> ``<IP>``     — strict dotted quad, each octet 0-255 with no
                           leading zeros, word-bounded. Out-of-range quads
                           (``999.999.999.999``) and zero-padded octets
                           (``010.1.2.3``) are NOT redacted: the pattern
                           validates ranges rather than over-matching.
* phone  -> ``<PHONE>``  — international-style ``+`` then 7-15 digits
                           (optionally separated by single spaces/dashes)

Replacement ORDER matters and is part of the contract: emails first (an
address can contain digits that a later pass might chew), then IPs, then
phones. ``pii_counts`` reports per-category match counts computed on the
ORIGINAL text — audit metrics survive even though the raw values don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (category, pattern, replacement) in REPLACEMENT ORDER — RE2-safe.
# valid octet: 250-255 | 200-249 | 100-199 | 0-99 without leading zeros
_OCTET = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
PII_PATTERNS = (
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", f"\\b{_OCTET}(?:\\.{_OCTET}){{3}}\\b", "<IP>"),
    ("phone", "\\+\\d[\\d -]{5,13}\\d\\b", "<PHONE>"),
)


def redact_pii(df: DataFrame, content_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Add ``out_col`` (scrubbed text) and ``n_<category>`` count columns.

    Map-only projection; counts are measured on the original text so the
    audit trail is independent of replacement interactions.
    """
    c = F.col(content_col)
    out = df
    for cat, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{cat}",
                             F.size(F.regexp_extract_all(c, F.lit(pat), 0)))
    red = c
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)
