"""Per-language lexicon plumbing: docs select their dictionary via the
input's ``lang`` column (broadcast lang->lexicon map), with parity vs the
frozen oracle run per doc with the same dictionary — and the proof that
language SELECTION matters: the same corrupted French text corrects under
the fr lexicon and only flags under en."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FR_TEXT = ("la pre-\nmière histoire du probléme\n"
           "\n"
           "le cœur était déjà là")
EN_TEXT = "the housa was fine\n\nthe probléme word"

SCHEMA = ("doc_id string, lang string, spans array<struct<"
          "kind:string,text:string,media_ref:string,offset:int>>")


def _docs(spark):
    rows = [
        ("fr-1", "fr", [("text", FR_TEXT, None, 0),
                        ("media", None, "scan/fr-1/p0.png", 1)]),
        ("en-1", "en", [("text", EN_TEXT, None, 0)]),
        ("xx-1", "xx", [("text", EN_TEXT, None, 0)]),  # falls to default
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def lexicons():
    from ocr_proofreader_spark.lexicon import load_base_lexicon
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    en = load_base_lexicon(os.path.join(root, "fixtures",
                                        "lexicon_base.txt"))
    fr = load_base_lexicon(os.path.join(root, "fixtures",
                                        "lexicon_fr.txt"))
    return {"en": en, "fr": fr, "default": en}


def _run(spark, lexicons, **cfg_kw):
    from ocr_proofreader_spark.config import RunConfig
    from ocr_proofreader_spark.lexicon import broadcast_lexicons
    from ocr_proofreader_spark.operators.proofread import proofread
    cfg = RunConfig(**cfg_kw)
    out = proofread(spark, _docs(spark), cfg,
                    broadcast_lexicons(spark, lexicons))
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in out.collect()}


def test_lang_selected_correction_and_oracle_parity(spark, lexicons):
    from oracle.refsem import proofread_document
    got = _run(spark, lexicons)

    fr_text = " ".join(t for _, t, _, _ in got["fr-1"] if t)
    assert "première" in fr_text          # R2 repair via the fr lexicon
    assert "problème" in fr_text          # R4 scorer via the fr lexicon
    assert "cœur" in fr_text              # known fr word left intact
    en_text = " ".join(t for _, t, _, _ in got["en-1"])
    assert "house" in en_text             # R4 via the en lexicon
    assert "probléme" in en_text          # NOT corrected under en: flagged

    # frozen-oracle parity, each doc proofread with its own dictionary
    docs = {"fr-1": ("fr", FR_TEXT, True), "en-1": ("en", EN_TEXT, False),
            "xx-1": ("en", EN_TEXT, False)}
    for doc_id, (lang, text, has_media) in docs.items():
        spans = [{"kind": "text", "text": text, "media_ref": None,
                  "offset": 0}]
        if has_media:
            spans.append({"kind": "media", "text": None,
                          "media_ref": "scan/fr-1/p0.png", "offset": 1})
        expected, _ = proofread_document(spans, lexicons[lang])
        exp = [(s["kind"], s["text"], s["media_ref"] or "", s["order"])
               for s in expected]
        norm = [(k, t, m or "", o) for k, t, m, o in got[doc_id]]
        assert norm == exp, doc_id


def test_lang_plumbing_on_skew_path(spark, lexicons):
    fast = _run(spark, lexicons)
    chunked = _run(spark, lexicons, chunk_threshold_spans=0)
    assert fast == chunked


def test_single_lexicon_mode_unchanged(spark, lexicons):
    """No lang column + plain frozenset broadcast == round-1 behavior."""
    from ocr_proofreader_spark.config import RunConfig
    from ocr_proofreader_spark.lexicon import broadcast_lexicon
    from ocr_proofreader_spark.operators.proofread import proofread
    docs = _docs(spark).drop("lang")
    out = proofread(spark, docs, RunConfig(),
                    broadcast_lexicon(spark, lexicons["en"]))
    texts = {r["doc_id"]: " ".join(s["text"] for s in r["spans"])
             for r in out.collect()}
    assert "house" in texts["en-1"]
    assert "première" not in texts["fr-1"]   # en lexicon: no fr repair
