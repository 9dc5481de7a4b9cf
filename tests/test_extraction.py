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


def test_extracts_exact_text_and_rejects_chrome(spark):
    from ocr_proofreader_spark.operators.extraction import (
        extract_main_html, synth_html)
    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .select("doc_id", "text"))
    out = extract_main_html(synth_html(docs))
    joined = {r["doc_id"]: r["main_text"] for r in out.collect()}
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    long_docs = {k: v for k, v in originals.items() if len(v) >= 30}
    assert long_docs
    for k, v in long_docs.items():
        assert joined[k] == v, k               # exact recovery
    chrome = ("Home", "Buy now", "rights reserved", "synthetic page")
    for v in joined.values():
        assert not any(c in v for c in chrome)


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
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.4\n... /Filter /FlateDecode ...")


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
