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


# ---- UAX#29 script-aware tokenization (Lucene 4.6 StandardTokenizerImpl
# emission types, public jflex grammar: IDEOGRAPHIC and HIRAGANA emit one
# codepoint per token, KATAKANA and HANGUL emit runs) ----

def test_uax29_ideographic_single_char_tokens():
    assert [t for t, _ in analyze_text("中文分词", "standard")] == \
        ["中", "文", "分", "词"]


def test_uax29_hiragana_single_katakana_run():
    # 速い -> ideograph + hiragana, エンジン stays one katakana token
    toks = [t for t, _ in analyze_text("分散索引エンジンは速い", "standard")]
    assert toks == ["分", "散", "索", "引", "エンジン", "は", "速", "い"]


def test_uax29_hangul_runs():
    assert [t for t, _ in analyze_text("한국어 처리", "standard")] == \
        ["한국어", "처리"]


def test_uax29_script_switch_splits_latin_from_cjk():
    assert [t for t, _ in analyze_text("abc中文def", "standard")] == \
        ["abc", "中", "文", "def"]


def test_uax29_katakana_middle_dot_breaks_run():
    # U+30FB is punctuation in UAX#29 word-break (not Katakana continue)
    assert [t for t, _ in analyze_text("サ・カ", "standard")] == ["サ", "カ"]


def test_uax29_halfwidth_katakana_is_katakana():
    assert [t for t, _ in analyze_text("ﾊﾝｶｸ kana", "standard")] == \
        ["ﾊﾝｶｸ", "kana"]


def test_uax29_accented_latin_and_cyrillic_word_runs():
    # non-CJK scripts ride Python's unicode \w and lowercase-fold
    assert [t for t, _ in analyze_text("Café Привет", "standard")] == \
        ["café", "привет"]


def test_uax29_positions_are_token_ordinals():
    toks = analyze_text("spark 索引 engine", "standard")
    assert toks == [("spark", 0), ("索", 1), ("引", 2), ("engine", 3)]


def test_uax29_ascii_behavior_unchanged():
    # the pre-CJK approximation must be bit-identical on ASCII corpora
    toks = [t for t, _ in analyze_text(
        "Spark_index v1.2 don't MERGE-sort", "standard")]
    assert toks == ["spark_index", "v1.2", "don't", "merge", "sort"]


def test_uax29_extend_combining_marks_join_word_runs():
    # UAX#29 WB4: Extend attaches to the base char — an NFD-decomposed
    # accent must not split the run, and the mark stays IN the token
    # (Lucene StandardAnalyzer does no folding)
    import unicodedata
    nfd = unicodedata.normalize("NFD", "Café résumé")
    toks = [t for t, _ in analyze_text(nfd, "standard")]
    assert toks == [unicodedata.normalize("NFD", "café"),
                    unicodedata.normalize("NFD", "résumé")]


def test_uax29_combining_voice_mark_joins_kana():
    # U+3099 COMBINING KATAKANA-HIRAGANA VOICED SOUND MARK is Extend:
    # katakana runs continue through it, hiragana singles absorb it
    assert [t for t, _ in analyze_text("デ゙ータ", "standard")] == \
        ["デ゙ータ"]
    assert [t for t, _ in analyze_text("が", "standard")] == \
        ["が"]


def test_uax29_spacing_voice_mark_is_katakana():
    # U+309B/309C (SPACING voice marks) have Word_Break=Katakana: they
    # emit as/join katakana tokens and BREAK from a preceding hiragana
    # single (they are not Script:Hiragana)
    assert [t for t, _ in analyze_text("は゛", "standard")] == ["は", "゛"]
    assert [t for t, _ in analyze_text("カ゛キ", "standard")] == ["カ゛キ"]


def test_email_url_patterns_do_not_absorb_cjk():
    # a CJK codepoint adjacent to an address/URL emits separately instead
    # of being swallowed into the email/URL token (the sub-grammars use
    # the CJK-excluding word class, not raw \w)
    assert [t for t, _ in analyze_text("分abc@x.io", "uax29urlemail")] == \
        ["分", "abc@x.io"]
    assert [t for t, _ in analyze_text("分abc@x.io", "classic")] == \
        ["分", "abc@x.io"]
    assert [t for t, _ in analyze_text("分http://x.io/a", "uax29urlemail")] == \
        ["分", "http://x.io/a"]


def test_uax29_remaining_deviations_documented():
    # vertical kana repeat marks U+3031-3035 (Word_Break=Katakana) join
    # katakana runs as of r4:
    toks = [t for t, _ in analyze_text("〱ア", "standard")]
    assert toks == ["〱ア"]


def test_extendnumlet_full_tier_joins_like_underscore():
    # WB13a/b (r5): every Pc connector joins runs exactly like '_' —
    # U+203F undertie, U+2040 character tie, U+FF3F fullwidth low line.
    # The token keeps the connector (Lucene emits the raw span).
    import re
    import unicodedata
    for joiner in ("‿", "⁀", "⁔", "︳", "＿"):
        got = [t for t, _ in analyze_text(f"foo{joiner}bar baz", "standard")]
        want_underscore = [t.replace("_", joiner) for t, _ in
                           analyze_text("foo_bar baz", "standard")]
        assert got == want_underscore == [f"foo{joiner}bar", "baz"], joiner
    # leading/trailing connectors attach like '_' does; numerics join too
    assert [t for t, _ in analyze_text("⁀1⁀2⁀", "standard")] \
        == [t.replace("_", "⁀") for t, _ in analyze_text("_1_2_", "standard")]
    # the generated class is exactly category Pc minus '_' (all-BMP guard)
    from xltsearch_spark.analyzers import _ENL
    gen = set(re.findall(r"\\u([0-9a-f]{4})", _ENL))
    pc = {f"{cp:04x}" for cp in range(0x110000)
          if cp != 0x5F and unicodedata.category(chr(cp)) == "Pc"}
    assert gen == pc
    # the code profile splits ENL-joined identifiers into posIncr=0
    # sub-tokens, same as snake_case
    flat = analyze_flat(pd.Series(["foo⁀bar"]), "code")
    assert flat["term"].tolist() == ["foo⁀bar", "foo", "bar"]
    assert flat["overlap"].tolist() == [False, True, True]


def test_format_chars_join_runs_wb4():
    # Format (Cf) chars are ignored mid-run per WB4, kept in the token
    # text (Lucene behavior): soft hyphen, LRM, and Arabic letter mark
    assert [t for t, _ in analyze_text("co­operate", "standard")] == \
        ["co­operate"]
    assert [t for t, _ in analyze_text("abc‎def gh", "standard")] == \
        ["abc‎def", "gh"]
    # a standalone Format char is not a token
    assert [t for t, _ in analyze_text("x ­ y", "standard")] == \
        ["x", "y"]


def test_non_bmp_marks_join_runs():
    # plane-1 combining marks (Brahmi U+11038 vowel sign AA) attach
    assert [t for t, _ in
            analyze_text("\U00011013\U00011038 base", "standard")] == \
        ["\U00011013\U00011038", "base"]


def test_zwsp_and_mongolian_separator_break_runs():
    # U+200B ZWSP is WB=Other (the invisible word delimiter of
    # Thai/Khmer/Myanmar) and U+180E was whitespace in Unicode 6.1:
    # both BREAK runs despite being category Cf in modern tables
    assert [t for t, _ in analyze_text("ab\u200bcd", "standard")] == \
        ["ab", "cd"]
    assert [t for t, _ in analyze_text("ab\u180ecd", "standard")] == \
        ["ab", "cd"]


def test_supplementary_cjk_scripts():
    # plane-2 Han (Ext B) emits IDEOGRAPHIC singles like BMP Han
    assert [t for t, _ in
            analyze_text("\U00020000\U00020001 ok", "standard")] == \
        ["\U00020000", "\U00020001", "ok"]
    # archaic KATAKANA E (U+1B000) joins a katakana run; archaic
    # HIRAGANA YE (U+1B001) emits a single like BMP hiragana
    assert [t for t, _ in analyze_text("\U0001b000ア", "standard")] == \
        ["\U0001b000ア"]
    assert [t for t, _ in analyze_text("\U0001b001か", "standard")] == \
        ["\U0001b001", "か"]


def test_extend_class_is_exactly_marks_and_format():
    """Every codepoint matched by the [_EXT] class must be category M*
    or Cf (the WB4 ignore set) — a range typo that swallowed a LETTER
    into the ignore class would silently glue unrelated words together.
    Checked over the full codepoint range (the class includes non-BMP
    marks as of r4)."""
    import re
    import unicodedata
    from xltsearch_spark.analyzers import _EXT, _EXT_ASTRAL
    cls = re.compile(f"[{_EXT}]|[{_EXT_ASTRAL}]")
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue  # surrogates: not encodable text
        ch = chr(cp)
        in_cls = bool(cls.match(ch))
        cat = unicodedata.category(ch)
        # ZWSP (WB=Other: the invisible word delimiter) and U+180E
        # (whitespace in Unicode 6.1) are excluded from the Cf tier
        is_ign = (cat[0] == "M" or cat == "Cf") and \
            cp not in (0x200B, 0x180E)
        assert in_cls == is_ign, hex(cp)
    # and the split is clean: _EXT is BMP-only (keeps sre's bitmap
    # optimization), _EXT_ASTRAL is astral-only
    assert "\\U" not in _EXT
    assert "\\u" not in _EXT_ASTRAL


def test_generated_extend_goldens():
    # Devanagari matras + virama join (कर्म is one token, as in Lucene)
    assert [t for t, _ in analyze_text("कर्म durchgeführt", "standard")] == \
        ["कर्म", "durchgeführt"]
    # Hebrew niqqud joins
    assert [t for t, _ in analyze_text("שָׁלוֹם", "standard")] == ["שָׁלוֹם"]
    # Arabic harakat + shadda join
    assert [t for t, _ in analyze_text("مُحَمَّد", "standard")] == ["مُحَمَّد"]
    # Thai vowel signs / tone marks join
    assert [t for t, _ in analyze_text("ภาษาไทย", "standard")] == ["ภาษาไทย"]
    # ZWNJ is Extend in Unicode 6.1 word-break (Persian morphology)
    assert [t for t, _ in analyze_text("می‌خواهم", "standard")] == \
        ["می‌خواهم"]


def test_standard_pattern_flat_run_equivalence_fuzz():
    """The performance-shaped run form `X+ ([EXT]+ X*)*` must accept
    exactly the language of the natural WB4 form `(X [EXT]*)+` — fuzzed
    over mixed script/mark/punctuation soup."""
    import random
    import re
    from xltsearch_spark.analyzers import (_EXT, _HANGUL, _HIRA, _IDEO,
                                           _KATA, _PATTERNS, _WC)
    wcx = f"{_WC}[{_EXT}]*"
    natural = re.compile(
        f"(?:[{_KATA}][{_EXT}]*)+|(?:[{_HANGUL}][{_EXT}]*)+|"
        f"[{_IDEO}{_HIRA}][{_EXT}]*|"
        rf"(?:{wcx})+(?:[.'](?:{wcx})+)*")
    fast = _PATTERNS["standard"]
    alphabet = list("ab1_.' -") + ["́", "゙", "カ", "ー", "分",
                                   "か", "한", "ᄀ", "゛", "・", "é"]
    rng = random.Random(42)
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        assert fast.findall(s) == natural.findall(s), repr(s)


def test_full_tier_pattern_equivalence_fuzz():
    """The astral-guarded full-tier pattern must agree with (a) the fast
    tier on astral-free text, and (b) a natural-form full pattern on
    soup containing astral marks/letters and Format chars."""
    import random
    import re
    from xltsearch_spark.analyzers import (_EXT, _EXT_ASTRAL, _HANGUL,
                                           _HIRA, _HIRA_SUP, _IDEO,
                                           _IDEO_SUP, _KATA, _KATA_SUP,
                                           _PATTERNS, _PATTERNS_FULL)
    fast = _PATTERNS["standard"]
    full = _PATTERNS_FULL["standard"]
    ideo, hira, kata = _IDEO + _IDEO_SUP, _HIRA + _HIRA_SUP, \
        _KATA + _KATA_SUP
    wc = f"[^\\W{ideo}{hira}{kata}{_HANGUL}]"
    ext_any = f"(?:[{_EXT}]|[{_EXT_ASTRAL}])"
    wcx = f"{wc}{ext_any}*"
    natural_full = re.compile(
        f"(?:[{kata}]{ext_any}*)+|(?:[{_HANGUL}]{ext_any}*)+|"
        f"[{ideo}{hira}]{ext_any}*|"
        rf"(?:{wcx})+(?:[.'](?:{wcx})+)*")
    bmp_alpha = list("ab1_.' -") + ["́", "゙", "カ", "分", "é", "­", "‎"]
    astral_alpha = bmp_alpha + ["\U00011038", "\U0001D165", "𐐷", "😀",
                                "\U00020000", "\U0001b000", "\U0001b001"]
    rng = random.Random(7)
    for _ in range(400):
        s = "".join(rng.choice(bmp_alpha)
                    for _ in range(rng.randint(0, 25)))
        assert full.findall(s) == fast.findall(s), repr(s)
    for _ in range(400):
        s = "".join(rng.choice(astral_alpha)
                    for _ in range(rng.randint(0, 25)))
        assert full.findall(s) == natural_full.findall(s), repr(s)
