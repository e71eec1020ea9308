"""Analyzer profiles — vectorized token pipelines mirroring xltsearch's set.

The reference exposes four Lucene 4.6 analyzers via ``Config.java:72-78``
(Standard, Classic, UAX29URLEmail, English) applied identically at index
time (``IndexTask.java:54-55``) and query time (``SearchTask.java:59-60``).
We re-express each as a *flat, batch-vectorized* pipeline over a pandas
Series of texts: pandas ``.str`` kernels tokenize/normalize whole Arrow
batches; the only per-element Python runs over the unique *vocabulary*
(Porter stemming), never over rows/tokens. A fifth ``code`` profile (the
north-star's code-aware analyzer) adds camelCase/snake_case sub-token
expansion at the same position (Lucene-style posIncr=0 overlaps, discounted
from doc length exactly as ``discountOverlaps=true`` does).

Semantics reproduced (public Lucene 4.6 knowledge):

* StandardTokenizer = UAX#29 word boundaries, maxTokenLength 255 (longer
  tokens split into 255-char chunks); approximated by a script-aware regex:
  word runs are ``\\w`` minus the CJK script blocks, with MidNumLet
  ``.``/``'`` joining alphanumeric runs (``_`` is ExtendNumLet and joins —
  ``snake_case`` is ONE token in Lucene's StandardTokenizer). CJK follows
  the Lucene 4.6 jflex grammar's emission types: IDEOGRAPHIC (Han) and
  HIRAGANA emit ONE CODEPOINT per token, KATAKANA and HANGUL emit runs
  (StandardTokenizerImpl's <IDEOGRAPHIC>/<HIRAGANA>/<KATAKANA>/<HANGUL>
  token types). Accented Latin/Greek/Cyrillic etc. ride on Python's
  Unicode-aware ``\\w``; the full WB4 ignore class — combining marks
  (Hebrew niqqud, Arabic harakat, Indic matras, Thai vowels, incl.
  non-BMP) plus Format chars (soft hyphen, bidi controls, ZWNJ/ZWJ) —
  is generated from the Unicode tables at import, as is the full
  ExtendNumLet tier (WB13a/b: every Pc connector — undertie, character
  tie, fullwidth low line — joins runs exactly like ``_``, r5).
* LowerCaseFilter then StopFilter with the 33-word English default stop set;
  stop removal leaves position *gaps* (enablePositionIncrements=true), so a
  phrase across a stopped word does NOT match adjacent terms.
* Classic = pre-3.1 grammar: acronyms (``I.B.M.`` -> ``ibm``), emails and
  hosts kept whole; ClassicFilter strips acronym dots and trailing ``'s``.
* UAX29URLEmail = Standard + full URLs/emails as single tokens.
* English = Standard + EnglishPossessiveFilter (strip ``'s``) + PorterStem.

Tokens are Lucene-style: positions are 0-based ordinals *before* stop
removal; ``overlap`` marks posIncr==0 tokens (code sub-tokens).
"""

from __future__ import annotations

import re
import unicodedata
from itertools import chain

import numpy as np
import pandas as pd

from xltsearch_spark.analyzers.porter import stem as porter_stem

# Lucene StopAnalyzer.ENGLISH_STOP_WORDS_SET (33 words) — the default stop
# set of StandardAnalyzer/ClassicAnalyzer/EnglishAnalyzer in 4.6.
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# UAX#29 script blocks with special word-break behavior (Lucene 4.6
# StandardTokenizer): Han ideographs + Hiragana emit one codepoint per
# token; Katakana (incl. halfwidth, prolonged-sound mark, and the SPACING
# voice marks U+309B-309C, whose Word_Break property IS Katakana) and
# Hangul (syllables + jamo) emit runs. U+30FB KATAKANA MIDDLE DOT and
# U+30A0 are punctuation (excluded so they break runs, as UAX#29 does).
# Hiragana = Script:Hiragana proper (U+3041-3096 + iteration marks /
# digraph U+309D-309F): the voice/combining marks inside the U+3040 block
# are NOT Hiragana and must not emit as single-char tokens.
_IDEO = "\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
_HIRA = "\u3041-\u3096\u309d-\u309f"
_KATA = ("\u30a1-\u30fa\u30fc-\u30ff\u31f0-\u31ff\uff66-\uff9f"
         "\u309b\u309c\u3031-\u3035")  # + vertical kana repeat marks (WB=Katakana)
_HANGUL = "\u1100-\u11ff\uac00-\ud7a3"
# UAX#29 Extend: combining marks attach to the preceding base character
# and never break a token (WB4: X (Extend)* — the jflex grammar's
# {...Ex} aliases). Word_Break=Extend is, to a very close
# approximation, "general category M* plus ZWNJ/ZWJ" (Unicode 6.1, the
# version Lucene 4.6 ships): the class is GENERATED from the
# interpreter's Unicode tables instead of hand-enumerated blocks, which
# covers Hebrew niqqud, Arabic harakat, Indic matras/viramas, Thai/Lao
# vowel signs, the kana voice marks U+3099-309A, variation selectors,
# etc., and (r4) the Format class (category Cf — soft hyphen, bidi
# controls), which WB4 equally ignores mid-run, over the FULL codepoint
# range including non-BMP marks. The running tables are newer than 6.1;
# the delta is codepoints UNASSIGNED in 6.1 (marks encoded later), which
# cannot occur in 6.1-era text — behavior on real corpora is identical.
# A test asserts every _EXT codepoint is category M* or Cf (guards range
# typos that would swallow letters into the ignore class).


def _combining_mark_class(scan) -> str:
    """The WB4 ignore set — combining marks (categories Mn/Mc/Me, the
    UAX#29 Extend backbone) plus Format (category Cf, which subsumes
    ZWNJ/ZWJ — Extend in Unicode 6.1 word break — soft hyphen, bidi
    controls, and interlinear annotation) — over the FULL codepoint
    range (non-BMP marks: Kaithi, Brahmi, musical symbols, plane-14
    tags), as a regex class body. Per WB4 neither ever breaks a run:
    ``X (Extend | Format)* -> X``. Computed once at import (~0.3 s,
    amortized over the reused Python worker's lifetime)."""
    spans = []
    prev, start, last = False, 0, 0
    # planes 4-13 (U+40000-U+DFFFF) hold no assigned characters in any
    # Unicode version to date — skipped to halve the import-time scan;
    # the full-range class-exactness test in tests/test_analyzers.py
    # fails loudly if the interpreter's tables ever assign marks there.
    for cp in scan:
        cat = unicodedata.category(chr(cp))
        # Cf minus U+200B ZERO WIDTH SPACE (WB=Other in UAX#29 — ZWSP
        # is the invisible word DELIMITER of Thai/Khmer/Myanmar text
        # and must break runs) and minus U+180E MONGOLIAN VOWEL
        # SEPARATOR (category Zs/whitespace in Unicode 6.1, the Lucene
        # 4.6 tables; reclassified Cf in 6.3 — parity says break).
        m = cat[0] == "M" or (cat == "Cf" and cp not in (0x200B, 0x180E))
        if m and not prev:
            start = cp
        elif prev and not m:
            spans.append((start, last))
        prev, last = m, cp
    if prev:
        spans.append((start, last))

    def esc(c: int) -> str:
        return f"\\u{c:04x}" if c <= 0xFFFF else f"\\U{c:08x}"

    return "".join(esc(a) if a == b else f"{esc(a)}-{esc(b)}"
                   for a, b in spans)


# Split at the BMP boundary: a class containing ANY non-BMP codepoint
# makes CPython's sre skip its bitmap (BIGCHARSET) optimization and
# fall back to a linear scan over ~250 ranges PER MEMBERSHIP TEST —
# measured ~1.2-2x on the tokenize hot path, paid at every word-run
# end even on pure-ASCII corpora. So the BMP ignore set stays one
# bitmap-optimized class, and astral marks live in a separate class
# used only by the _PATTERNS_FULL tier (see below).
_EXT = _combining_mark_class(range(0x10000))  # ZWNJ/ZWJ arrive via Cf
_EXT_ASTRAL = _combining_mark_class(
    list(range(0x10000, 0x40000)) + list(range(0xE0000, 0x110000)))
# UAX#29 ExtendNumLet (WB13a/b) = general category Pc in Unicode 6.1:
# connector punctuation joins word runs exactly like '_' does (which
# Python's \w already covers — 'snake_case' is ONE token). The REST of
# the class (U+203F undertie, U+2040 character tie, U+2054, the vertical
# and dashed low lines U+FE33-34/FE4D-4F, U+FF3F fullwidth low line) is
# outside \w, so it rides the slow-tier routing below: a batch containing
# one of these (vanishingly rare in real corpora) compiles the word class
# as an alternation; the pure-\w fast tier stays a single bitmap class.
# Generated from the interpreter's tables like _EXT; all Pc are BMP.
_ENL = "".join(
    (f"\\u{cp:04x}" for cp in range(0x10000)
     if cp != 0x5F and unicodedata.category(chr(cp)) == "Pc"))
# a "word" char = \w minus the CJK blocks above (identical to plain \w on
# ASCII/Latin text, so the pre-CJK fixtures tokenize unchanged)
_WC = f"[^\\W{_IDEO}{_HIRA}{_KATA}{_HANGUL}]"
_ACRONYM_PATTERN = r"(?:[A-Za-z]\.){2,}"


# Supplementary-plane script blocks for the FULL tier (assigned in
# Unicode 6.1, so Lucene 4.6 knows them): Han Ext B/C/D + CJK Compat
# Supplement emit IDEOGRAPHIC singles; U+1B000/U+1B001 are the archaic
# KATAKANA E / HIRAGANA YE. The fast tier never sees these (astral
# routing), so its classes stay BMP-only and bitmap-optimized.
_IDEO_SUP = ("\U00020000-\U0002a6d6\U0002a700-\U0002b734"
             "\U0002b740-\U0002b81d\U0002f800-\U0002fa1d")
_HIRA_SUP = "\U0001b001"
_KATA_SUP = "\U0001b000"


def _pattern_set(ext_atom: str, ideo: str = _IDEO, hira: str = _HIRA,
                 kata: str = _KATA, enl: str = "") -> dict:
    """Compile the five profile patterns with ``ext_atom`` as the WB4
    ignore unit (a full regex atom, used as ``{ext_atom}+`` etc.) and
    the given script classes. ``enl`` extends the word class with the
    ExtendNumLet connectors beyond '_' (WB13a/b — they join runs exactly
    like '_'); empty keeps the word class a single bitmap-optimized
    negated class (the fast tier — routing guarantees it never sees an
    ENL char).

    Run shape note: the natural WB4 form ``(X [EXT]*)+`` pays a
    per-CHARACTER quantifier check, measured ~1.45x slower on pure-ASCII
    corpora (the build hot path). The equivalent ``X+ ([EXT]+ X*)*``
    scans the run flat and only branches when an ignored char actually
    appears — same language ((X EXT*)+ == X (X|EXT)* == X+ (EXT+ X*)*,
    first char always X), verified by the randomized equivalence tests
    in tests/test_analyzers.py."""
    wc = f"[^\\W{ideo}{hira}{kata}{_HANGUL}]"
    if enl:
        # (\w∖CJK) ∪ ENL, common class first so ASCII pays one branch
        wc = f"(?:{wc}|[{enl}])"
    wrun = rf"{wc}+(?:{ext_atom}+{wc}*)*"
    standard = (
        f"[{kata}]+(?:{ext_atom}+[{kata}]*)*|"
        f"[{_HANGUL}]+(?:{ext_atom}+[{_HANGUL}]*)*|"
        f"[{ideo}{hira}]{ext_atom}*|"
        rf"{wrun}(?:[.']{wrun})*")
    # email/URL sub-grammars use the SAME CJK-excluding word class: a
    # CJK codepoint adjacent to an address must emit as its own token,
    # never be absorbed into the email/URL token (raw \w would swallow
    # it — '分abc@x.io' must tokenize as 分 + abc@x.io)
    email = rf"{wc}+(?:[.+-]{wc}+)*@{wc}+(?:[.-]{wc}+)+"
    url = rf"{wc}+://[^\s<>\"']+"
    return {
        "standard": re.compile(standard),
        "english": re.compile(standard),
        "code": re.compile(standard),
        "classic": re.compile(
            f"{email}|{_ACRONYM_PATTERN}|{standard}"),
        "uax29urlemail": re.compile(
            f"{url}|{email}|{standard}"),
    }


# Two pattern tiers with IDENTICAL semantics on any text free of astral
# (plane 1+) codepoints — which is every batch the fast tier ever sees:
# analyze_flat routes a batch to _PATTERNS_FULL iff some row contains a
# codepoint > U+FFFF (one vectorized single-range scan), so the hot path
# keeps the bitmap-optimized BMP class and astral marks still attach per
# WB4 when they actually occur. In the full tier the astral class hides
# behind a one-range lookahead guard: a failed ignore-test (the common
# case, once per word-run end) costs one bitmap probe plus one range
# compare, never the ~100-range astral scan.
_ASTRAL = "\\U00010000-\\U0010ffff"
_PATTERNS = _pattern_set(f"[{_EXT}]")
_PATTERNS_FULL = _pattern_set(
    f"(?:[{_EXT}]|(?=[{_ASTRAL}])[{_EXT_ASTRAL}])",
    ideo=_IDEO + _IDEO_SUP, hira=_HIRA + _HIRA_SUP,
    kata=_KATA + _KATA_SUP, enl=_ENL)
# slow-tier routing trigger: astral codepoints (supplementary scripts /
# marks) OR a non-'_' ExtendNumLet connector — either needs _PATTERNS_FULL
_ASTRAL_RE = re.compile(f"[{_ASTRAL}{_ENL}]")

# camelCase / digit-run sub-token splitter for the code profile
_SUBTOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z]+[0-9]*|[0-9]+")
_ACRONYM_FULL_RE = re.compile(r"^(?:[A-Za-z]\.)+$")
_POSSESSIVE_RE = re.compile(r"'[sS]$")


def profiles() -> tuple[str, ...]:
    return tuple(_PATTERNS)


def _explode(texts: pd.Series, pattern: re.Pattern, max_token_length: int):
    """texts -> (row_idx int64[], tokens object[]) with long tokens chunked.

    Vectorized: regex runs through pandas' cython str engine; chunk expansion
    only loops over the (rare) >max-length tokens.
    """
    lists = texts.str.findall(pattern)
    lengths = lists.str.len().fillna(0).to_numpy(dtype=np.int64)
    n = len(texts)
    rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    toks = np.array(list(chain.from_iterable(lists.dropna())), dtype=object)
    if toks.size:
        tok_len = np.frompyfunc(len, 1, 1)(toks).astype(np.int64)
        long_mask = tok_len > max_token_length
        if long_mask.any():
            # split each long token into max_token_length-char chunks
            # (StandardTokenizer continues a new token past maxTokenLength)
            pieces_rows, pieces_toks = [], []
            order = np.arange(toks.size)
            for i in np.nonzero(long_mask)[0]:
                t = toks[i]
                chunks = [t[j:j + max_token_length] for j in range(0, len(t), max_token_length)]
                pieces_rows.append(np.full(len(chunks), rows[i]))
                pieces_toks.append(np.array(chunks, dtype=object))
            keep = ~long_mask
            # rebuild preserving document order: interleave by original index
            all_rows = [rows[keep]] + pieces_rows
            all_toks = [toks[keep]] + pieces_toks
            all_order = [order[keep]] + [np.full(len(p), order[i], dtype=np.float64) + np.linspace(0, 0.9, len(p), endpoint=False)
                                         for i, p in zip(np.nonzero(long_mask)[0], pieces_toks)]
            rows = np.concatenate(all_rows)
            toks = np.concatenate(all_toks)
            sort = np.argsort(np.concatenate(all_order), kind="stable")
            rows, toks = rows[sort], toks[sort]
    return rows, toks


def _positions(rows: np.ndarray) -> np.ndarray:
    """Within-row ordinal for a row-sorted flat token stream."""
    if rows.size == 0:
        return np.zeros(0, dtype=np.int32)
    starts = np.concatenate(([0], np.nonzero(np.diff(rows))[0] + 1))
    counts = np.diff(np.concatenate((starts, [rows.size])))
    return (np.arange(rows.size) - np.repeat(starts, counts)).astype(np.int32)


def _stem_unique(terms: pd.Series) -> pd.Series:
    """Porter-stem via the unique vocabulary (O(|vocab|) Python)."""
    vocab = pd.unique(terms)
    mapping = {t: porter_stem(t) for t in vocab}
    return terms.map(mapping)


def analyze_flat(texts: pd.Series, profile: str = "standard",
                 max_token_length: int = 255) -> pd.DataFrame:
    """Tokenize a batch of texts into a flat (row, term, pos, overlap) frame.

    ``row`` indexes into ``texts`` positionally; ``pos`` is the Lucene token
    position (gaps where stop words were removed); ``overlap`` is True for
    posIncr==0 tokens (code-profile sub-tokens) which are excluded from doc
    length (discountOverlaps=true, as Lucene's BM25/Default similarities do).
    """
    if profile not in _PATTERNS:
        raise KeyError(f"unknown analyzer profile: {profile!r}")
    texts = texts.fillna("").astype(str)
    pats = _PATTERNS_FULL if bool(texts.str.contains(_ASTRAL_RE).any()) \
        else _PATTERNS
    rows, toks = _explode(texts, pats[profile], max_token_length)
    pos = _positions(rows)
    s = pd.Series(toks, dtype=object)
    overlap = np.zeros(rows.size, dtype=bool)

    if profile == "classic":
        # ClassicFilter: strip dots from acronyms, strip trailing 's
        is_acro = s.str.match(_ACRONYM_FULL_RE).to_numpy(dtype=bool) if len(s) else np.zeros(0, bool)
        if is_acro.any():
            s = s.mask(pd.Series(is_acro), s.str.replace(".", "", regex=False))
        s = s.str.replace(_POSSESSIVE_RE, "", regex=True)
    elif profile == "english":
        # EnglishPossessiveFilter (before lowercase in Lucene's chain)
        s = s.str.replace(_POSSESSIVE_RE, "", regex=True)
    elif profile == "code":
        # sub-token expansion: identifiers with >=2 camel/snake parts emit
        # each part at the SAME position as the parent (posIncr=0 overlap)
        subs = s.str.findall(_SUBTOKEN_RE)
        n_subs = subs.str.len().to_numpy(dtype=np.int64) if len(s) else np.zeros(0, np.int64)
        expand = n_subs >= 2
        if expand.any():
            sub_rows = np.repeat(rows[expand], n_subs[expand])
            sub_pos = np.repeat(pos[expand], n_subs[expand])
            sub_toks = np.array(list(chain.from_iterable(subs[expand])), dtype=object)
            rows = np.concatenate((rows, sub_rows))
            pos = np.concatenate((pos, sub_pos))
            s = pd.concat([s, pd.Series(sub_toks, dtype=object)], ignore_index=True)
            overlap = np.concatenate((overlap, np.ones(sub_rows.size, dtype=bool)))
            order = np.lexsort((overlap, pos, rows))
            rows, pos, overlap = rows[order], pos[order], overlap[order]
            s = s.iloc[order].reset_index(drop=True)

    s = s.str.lower()

    if profile == "english":
        keep = ~s.isin(ENGLISH_STOP_WORDS).to_numpy(dtype=bool)
        s, rows, pos, overlap = s[keep].reset_index(drop=True), rows[keep], pos[keep], overlap[keep]
        s = _stem_unique(s)
    else:
        keep = ~s.isin(ENGLISH_STOP_WORDS).to_numpy(dtype=bool)
        s, rows, pos, overlap = s[keep].reset_index(drop=True), rows[keep], pos[keep], overlap[keep]

    return pd.DataFrame({"row": rows, "term": s.to_numpy(dtype=object),
                         "pos": pos, "overlap": overlap})


def doc_lengths(flat: pd.DataFrame, n_rows: int) -> np.ndarray:
    """Per-row Lucene field length: emitted tokens minus overlaps."""
    rows = flat.loc[~flat["overlap"], "row"].to_numpy(dtype=np.int64)
    return np.bincount(rows, minlength=n_rows).astype(np.int64)


def analyze_text(text: str, profile: str = "standard",
                 max_token_length: int = 255) -> list[tuple[str, int]]:
    """Query-side single-string analysis -> [(term, position)]."""
    flat = analyze_flat(pd.Series([text]), profile, max_token_length)
    return list(zip(flat["term"].tolist(), flat["pos"].tolist()))
