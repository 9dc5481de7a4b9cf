"""Main-content extraction (north_rule: HTML boilerplate strip + DOM
heuristics): the density + chrome-blocklist extractor must recover the
wrapped text exactly and reject every boilerplate line, shuffle-free."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata missing")


def _recoverable(text: str) -> bool:
    """Docs the extractor guarantees to recover EXACTLY: every line long
    enough for the density rule, no markup characters (the tag-strip
    regex would eat them), no surrounding whitespace (lines are
    trimmed)."""
    lines = text.split("\n")
    return all(len(ln) >= 30 and "<" not in ln and ">" not in ln
               and ln == ln.strip() for ln in lines)


def test_extracts_exact_text_and_rejects_chrome(spark):
    from ocr_proofreader_spark.operators.extraction import (
        extract_main_html, synth_html)
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "text"))
    out = extract_main_html(synth_html(docs))
    joined = {r["doc_id"]: r["main_text"] for r in out.collect()}
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    clean = {k: v for k, v in originals.items() if _recoverable(v)}
    assert len(clean) >= len(originals) * 0.9   # corpus is mostly clean
    for k, v in clean.items():
        assert joined[k] == v, k                # exact recovery
    # boilerplate never leaks into the extraction of clean docs
    chrome = ("Home", "Buy now", "rights reserved", "synthetic page")
    for k in clean:
        assert not any(c in joined[k] for c in chrome
                       if c not in originals[k])
    # in-test synthetic edge docs: markup-bearing and short docs go
    # through without error (lossy by design, identical in the oracle)
    edge = spark.createDataFrame(
        [(9001, "tiny"), (9002, "a < b but still " + "x" * 30)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["main_text"]
           for r in extract_main_html(synth_html(edge)).collect()}
    assert got[9001] == ""                      # all lines filtered
    assert "<" not in got[9002]                 # markup stripped


def test_pdf_roundtrip_property():
    """Arbitrary text survives the write-PDF -> parse-PDF roundtrip
    losslessly, including PDF-special characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_proofreader_spark.functions.pdf import (PdfError,
                                                     extract_pdf_text,
                                                     synth_pdf)

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=9,
                                          blacklist_categories=("Cs",)),
                   max_size=200))
    def check(t):
        assert extract_pdf_text(synth_pdf(t)) == t

    check()
    # document TEXT mentioning FlateDecode must NOT be misclassified as
    # a compressed PDF (the guard scans metadata, not stream bodies)
    t = "this chapter explains the FlateDecode filter"
    assert extract_pdf_text(synth_pdf(t)) == t
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode "
                         b">>\nstream\nxx\nendstream\nendobj")
    # foreign-PDF escapes must never raise bare ValueError: octal parses
    # (\101='A'), \8 drops the backslash per spec, and octal overflow
    # (\777 -> masked 0xFF, invalid UTF-8) raises the CLASSIFIED error
    assert extract_pdf_text(
        b"%PDF-1.4\nstream\n(\\101 a\\8b) Tj\nendstream") == "A a8b"
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.4\nstream\n(\\777) Tj\nendstream")
    # an INACCURATE direct /Length (real-world PDFs carry them) must
    # not mis-frame the body: when the framed slice is not followed by
    # 'endstream', the parser falls back to the delimiter scan
    # (ADVICE r03).  /Length 3 would otherwise truncate '(hi there) Tj'.
    wrong_len = (b"%PDF-1.4\n1 0 obj\n<< /Length 3 >>\n"
                 b"stream\n(hi there) Tj\nendstream\nendobj")
    assert extract_pdf_text(wrong_len) == "hi there"
    # and an ACCURATE /Length still frames exactly
    body = b"(ok) Tj"
    right_len = (b"%PDF-1.4\n1 0 obj\n<< /Length "
                 + str(len(body)).encode()
                 + b" >>\nstream\n" + body + b"\nendstream\nendobj")
    assert extract_pdf_text(right_len) == "ok"


def test_pdf_roundtrip_on_corpus(spark):
    from pyspark.sql import functions as F
    from ocr_proofreader_spark.operators.extraction import pdf_text_roundtrip
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = pdf_text_roundtrip(docs)
    joined = out.join(docs.select("doc_id",
                                  F.md5("text").alias("expected")),
                      "doc_id")
    bad = joined.filter(F.col("pdf_text_digest")
                        != F.col("expected")).count()
    assert bad == 0 and out.count() == docs.count()


def test_extraction_is_shuffle_free(spark):
    from ocr_proofreader_spark.operators.extraction import (
        extract_main_html, synth_html)
    from ocr_proofreader_spark.plans import physical as P
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "text"))
    assert P.count_exchanges(extract_main_html(synth_html(docs))) == 0


def test_pdf_flate_roundtrip_property():
    """Arbitrary text survives the roundtrip through a /FlateDecode-
    compressed content stream, and stream-length framing (not the
    endstream scan) delimits the compressed bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_proofreader_spark.functions.pdf import (PdfError,
                                                     extract_pdf_text,
                                                     synth_pdf)

    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet=st.characters(min_codepoint=9,
                                          blacklist_categories=("Cs",)),
                   max_size=200))
    def check(t):
        assert extract_pdf_text(synth_pdf(t, compress=True)) == t

    check()
    # a compressed stream whose inflated body happens to contain the
    # word endstream must still parse (the /Length framing wins)
    t = "before\nendstream\nafter"
    assert extract_pdf_text(synth_pdf(t, compress=True)) == t
    # backslash-EOL is a line continuation: both chars vanish
    assert extract_pdf_text(
        b"%PDF-1.4\nstream\n(ab\\\ncd) Tj\nendstream") == "abcd"
    assert extract_pdf_text(
        b"%PDF-1.4\nstream\n(ab\\\r\ncd) Tj\nendstream") == "abcd"
    # unsupported filters are classified, not crashed on
    import pytest
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< /Filter /DCTDecode >>\n"
                         b"stream\nxx\nendstream\nendobj")
