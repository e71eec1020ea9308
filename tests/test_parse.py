"""B3 parse/extract stage (ParseTask.java:55-77 semantics, JVM-side)."""
import pytest
from pyspark.sql import functions as F

from xltsearch_spark.operators import parse


def _extract(spark, rows):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(rows)],
                               "doc_id long, content string")
    out = parse.extract_text(df).orderBy("doc_id")
    return [(r["format"], r["parse_ok"], r["extracted"]) for r in out.collect()]


def test_html_strip_tags_script_style_entities(spark):
    [(fmt, ok, text)] = _extract(spark, [
        '<html><head><title>T</title><style>p {c: 1}</style></head>'
        '<body><h1>A &amp; B</h1><p>hello <b>world</b></p>'
        '<script>if (1 < 2) x();</script></body></html>'])
    assert (fmt, ok) == ("html", True)
    assert text == "T A & B hello world"


def test_xml_decl_detection_and_entity_after_tag_strip(spark):
    [(fmt, ok, text)] = _extract(spark, [
        '<?xml version="1.0"?><doc><t>X&lt;Y</t><b>body text</b></doc>'])
    assert (fmt, ok) == ("xml", True)
    assert text == "X<Y body text"


def test_html_snippet_without_prolog(spark):
    [(fmt, _, text)] = _extract(spark, ['<p>just a fragment</p>'])
    assert fmt == "html"
    assert text == "just a fragment"


def test_markdown_headings_links_emphasis(spark):
    [(fmt, ok, text)] = _extract(spark, [
        '# Title\n\nsome **bold** and `code` with [a link](http://x.y/z)\n'
        '```python\npass\n```\n'])
    assert (fmt, ok) == ("markdown", True)
    assert text == "Title some bold and code with a link pass"


def test_binary_degrades_but_keeps_row(spark):
    # Tika degradation: parse failure -> metadata-only row, never dropped
    out = _extract(spark, ["\x00\x01binarystuff", "plain words"])
    assert out[0] == ("binary", False, "")
    assert out[1] == ("plain", True, "plain words")


def test_plain_text_whitespace_collapse(spark):
    [(fmt, _, text)] = _extract(spark, ["  two\t\twords \n here "])
    assert fmt == "plain"
    assert text == "two words here"


def test_null_content_is_binary_degradation(spark):
    out = _extract(spark, [None])
    assert out[0] == ("binary", False, "")


def test_amp_entity_decoded_last(spark):
    # '&amp;lt;' must decode to the literal text '&lt;', not '<'
    [(_, _, text)] = _extract(spark, ['<p>&amp;lt;</p>'])
    assert text == "&lt;"


def test_extract_plan_is_udf_free(spark):
    """The whole stage must be pure column expressions (no BatchEvalPython /
    ArrowEvalPython nodes): that's what makes it a map-only JVM projection."""
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, content string")
    plan = parse.extract_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---- parse_content=True: the B3 stage inside the index pipeline ----

def _parse_corpus(spark):
    rows = [
        ("r", "p0", "c0", "en", '<html><body><p>hidden gem inside markup</p>'
                                '<script>var secretword = 1;</script></body></html>', None),
        ("r", "p1", "c1", "de", 'plain body with gem too', None),
        ("r", "p2", "c2", "fr", '\x00\x02unparseable binary payload', None),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, title string")


def test_parse_content_indexes_extracted_text(spark, tmp_path):
    """Default = reference parity: a parse-failed doc is NOT indexed at all
    (ParseTask.java:70-75 sets Status.PASS on failure; IndexTask's
    `case PASS: break;` skips it)."""
    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig
    cfg = IndexConfig(name="p", parse_content=True, term_buckets=4,
                      quantize_norms=False)
    cat = IndexCatalog(spark, str(tmp_path / "wh"), cfg)
    cat.build(_parse_corpus(spark), fingerprint="v1")
    eng = cat.engine()
    # term inside markup body is indexed
    hits = eng.search("gem", 10).collect()
    assert sorted(h["path"] for h in hits) == ["p0", "p1"]
    # term that only occurred inside <script> is NOT indexed
    assert eng.search("secretword", 10).collect() == []
    # parse-failed doc is skipped entirely: no content terms, no metadata
    # row, not counted in N (reference parity)
    assert eng.search("unparseable", 10).collect() == []
    assert eng.search("parse_status:failed", 10).collect() == []
    assert {h["path"] for h in eng.search("*:*", 10).collect()} == {"p0", "p1"}
    assert eng.stats.n_docs == 2
    fmt = eng.search("format:html", 10).collect()
    assert [h["path"] for h in fmt] == ["p0"]


def test_parse_keep_failed_extension(spark, tmp_path):
    """parse_keep_failed=True (documented extension): the failed doc stays
    as a metadata-only row, queryable via parse_status/format keywords and
    counted in N."""
    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig
    cfg = IndexConfig(name="pk", parse_content=True, parse_keep_failed=True,
                      term_buckets=4, quantize_norms=False)
    cat = IndexCatalog(spark, str(tmp_path / "whk"), cfg)
    cat.build(_parse_corpus(spark), fingerprint="v1")
    eng = cat.engine()
    assert eng.search("unparseable", 10).collect() == []  # no content terms
    failed = eng.search("parse_status:failed", 10).collect()
    assert [h["path"] for h in failed] == ["p2"]
    assert eng.stats.n_docs == 3


def test_parse_content_hashsum_is_raw_content(spark, tmp_path):
    """The sha256 row invariant hashes the INPUT bytes, not extracted text
    (keep_failed=True so the binary doc's hash is checked too)."""
    import hashlib
    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig
    cfg = IndexConfig(name="p2", parse_content=True, parse_keep_failed=True,
                      term_buckets=4)
    cat = IndexCatalog(spark, str(tmp_path / "wh2"), cfg)
    corpus = _parse_corpus(spark)
    cat.build(corpus, fingerprint="v1")
    raw = {r["path"]: hashlib.sha256(r["content"].encode()).hexdigest()
           for r in corpus.collect()}
    stored = {r["path"]: r["hashsum"] for r in cat.engine().docs.collect()}
    assert stored == raw


def test_parse_content_flag_changes_config_hash():
    from xltsearch_spark.config import IndexConfig
    a = IndexConfig(name="x", parse_content=False)
    b = IndexConfig(name="x", parse_content=True)
    assert a.config_hash() != b.config_hash()


def test_detection_sniffs_head_window_only(spark):
    # Tika-style bounded sniff: markup that first appears beyond SNIFF_LEN
    # does not flip the format (and detection cost stays bounded on huge docs)
    late_markup = "x " * (parse.SNIFF_LEN // 2) + "<p>late tag</p>"
    out = _extract(spark, [late_markup])
    assert out[0][0] == "plain"
    # the same marker inside the window is detected
    assert _extract(spark, ["<p>early tag</p>" + "x " * 50])[0][0] == "html"


def test_binary_detection_is_full_content(spark):
    """The binary check is a linear character-class scan, so unlike the
    markup heuristics it is NOT head-capped: a NUL past the sniff window
    still degrades the row (Tika detects from the whole stream)."""
    late_binary = "x " * (parse.SNIFF_LEN // 2) + "tail\x00garbage"
    out = _extract(spark, [late_binary])
    assert out[0] == ("binary", False, "")


def test_numeric_and_hex_entities_decode(spark):
    [(_, _, text)] = _extract(spark, [
        '<p>&#60;a&#62; &#x27;q&#x27; &#34;w&#34; A&#38;B &#x26;amp;</p>'])
    # &#38; -> '&' decodes ONCE (the output '&amp;' stays literal), same
    # single-level contract as test_amp_entity_decoded_last
    assert text == "<a> 'q' \"w\" A&B &amp;"


def test_register_custom_parser_end_to_end(spark, tmp_path):
    """The AutoDetectParser seam: a custom format registered at runtime
    flows through detection, extraction, and a parse_content=True build."""
    from pyspark.sql import functions as F
    from xltsearch_spark.catalog import IndexCatalog
    from xltsearch_spark.config import IndexConfig
    parse.register_parser(
        "csvish",
        detect=lambda c, h: h.rlike("^#csv\\b"),
        extract=lambda c: parse._collapse_ws(
            F.regexp_replace(F.regexp_replace(c, "^#csv", " "), ",", " ")),
        before="markdown")
    try:
        out = _extract(spark, ["#csv alpha,beta,gamma"])
        assert out[0] == ("csvish", True, "alpha beta gamma")
        rows = [("r", "p0", "c0", "en", "#csv findme,too", None),
                ("r", "p1", "c1", "en", "plain text here", None)]
        corpus = spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, "
                  "content string, title string")
        cfg = IndexConfig(name="reg", parse_content=True, term_buckets=4)
        cat = IndexCatalog(spark, str(tmp_path / "whreg"), cfg)
        cat.build(corpus, fingerprint="v1")
        eng = cat.engine()
        assert [h["path"] for h in eng.search("findme", 10).collect()] == ["p0"]
        assert [h["path"] for h in
                eng.search("format:csvish", 10).collect()] == ["p0"]
    finally:
        parse.unregister_parser("csvish")


def test_register_detection_only_parser_degrades(spark):
    """extract=None registers detection WITHOUT a parser: rows of that
    format degrade exactly like binary (ParseTask.java:68-77 contract for
    formats Tika detects but cannot parse)."""
    parse.register_parser("pdf", detect=lambda c, h: h.startswith("%PDF-"),
                          extract=None, before="xml")
    try:
        out = _extract(spark, ["%PDF-1.7 stream...", "plain words"])
        assert out[0] == ("pdf", False, "")
        assert out[1] == ("plain", True, "plain words")
    finally:
        parse.unregister_parser("pdf")


def test_chunk_documents_layout(spark):
    from xltsearch_spark.operators.parse import chunk_documents
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [(0, text), (1, "a b c"), (2, ""), (3, None)], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 words, step 48: ceil(84/48) = 2 chunks, second covers 48..100
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c0] == [0, 1]
    assert c0[0]["n_chunk_tokens"] == 64
    assert c0[0]["chunk_text"].startswith("w0 w1 ") and c0[0]["chunk_text"].endswith("w63")
    assert c0[1]["n_chunk_tokens"] == 52  # words 48..99
    assert c0[1]["chunk_text"].startswith("w48 ")
    # overlap: words 48..63 appear in both chunks
    assert "w50" in c0[0]["chunk_text"] and "w50" in c0[1]["chunk_text"]
    # short doc -> one chunk; empty/NULL -> no rows
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "a b c"
    assert 2 not in by_doc and 3 not in by_doc


def test_chunk_documents_rejects_bad_overlap(spark):
    from xltsearch_spark.operators.parse import chunk_documents
    import pytest as _pt
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=32, overlap=32)
