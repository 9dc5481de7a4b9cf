"""Unit semantics for the text-analysis training ops on hand-built docs
(the sf-contract checks run on mostly-ASCII synthetic text, so the
interesting cases — composed vs decomposed accents, token order, punct
classes — are pinned here)."""

import hashlib
import unicodedata

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "déjà vu"),          # decomposed é / à
        (2, "déjà vu"),            # precomposed — same NFC
        (3, "alpha beta gamma"),
        (4, "gamma beta alpha"),             # same tokens, other order
        (5, "Stop. Really, stop! Why?"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_normalize_text_unifies_composition(spark, docs):
    from ocr_proofreader_spark.operators.training_ops import normalize_text
    out = {r["doc_id"]: r["nfc_hash"] for r in normalize_text(docs).collect()}
    assert out[1] == out[2]                  # NFC unifies the two forms
    expected = hashlib.md5(
        unicodedata.normalize("NFC", "déjà vu").encode()
    ).hexdigest()
    assert out[1] == expected


def test_rolling_fingerprint_is_order_sensitive(spark, docs):
    from ocr_proofreader_spark.operators.training_ops import \
        doc_fingerprint_rolling
    out = {r["doc_id"]: r["rolling_hash"]
           for r in doc_fingerprint_rolling(docs).collect()}
    assert out[3] != out[4]                  # permuted tokens differ
    # python reimplementation of the fold
    h = 0
    for t in "alpha beta gamma".split():
        tok = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        h = (h * 1000003 + tok) % 2147483647
    assert out[3] == h


def test_quality_metrics_counts(spark, docs):
    from ocr_proofreader_spark.operators.training_ops import quality_metrics
    out = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    r = out[5]                               # "Stop. Really, stop! Why?"
    assert r["n_tokens"] == 4
    assert r["n_punct"] == 4                 # one each of . , ! ?
    assert r["n_chars"] == len("Stop. Really, stop! Why?")
    assert out[3]["n_punct"] == 0
