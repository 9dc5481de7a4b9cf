"""Fixture generator sanity (FIXTURES.md section 3): determinism, shape,
corruption presence, and oracle round-trip (SURVEY.md test 5.2-2 precursor)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.gen import CorpusGenerator
from oracle.refsem import proofread_document

GEN = CorpusGenerator(seed=42)


def test_deterministic_and_order_independent():
    a = GEN.gen_doc(7)
    b = CorpusGenerator(seed=42).gen_doc(7)
    assert a == b


def test_schema_shape():
    doc_id, spans, expected = GEN.gen_doc(3)
    assert doc_id == "book-000003"
    for sp in spans:
        assert set(sp) == {"kind", "text", "media_ref", "offset"}
        assert sp["kind"] in ("text", "media")
    for sp in expected:
        assert set(sp) == {"kind", "text", "media_ref", "order"}
        assert sp["kind"] in ("chapter", "paragraph", "media")
    orders = [sp["order"] for sp in expected]
    assert orders == list(range(len(orders)))


def test_corruptions_present_in_corpus():
    lig_or_longs = 0
    for i in range(40):
        _, spans, _ = GEN.gen_doc(i)
        for sp in spans:
            if sp["kind"] == "text":
                t = sp["text"]
                if any(c in t for c in "ﬁﬂﬀſ") or "-\n" in t:
                    lig_or_longs += 1
    assert lig_or_longs > 0


def test_oracle_round_trip_on_corpus():
    """oracle(corrupted) == expected for every generated doc (by
    construction, but this guards generator regressions)."""
    for i in range(30):
        _, spans, expected = GEN.gen_doc(i)
        got, _ = proofread_document(spans, GEN.lexicon, GEN.freq_k)
        assert got == expected, f"doc {i} mismatch"


def test_skewed_doc_is_long():
    _, spans, _ = GEN.gen_doc(99)
    assert len(spans) >= 50  # base span count x50 (FIXTURES skew_factor)


def test_media_refs_unique_and_preserved():
    _, spans, expected = GEN.gen_doc(5)
    in_media = [s["media_ref"] for s in spans if s["kind"] == "media"]
    out_media = [s["media_ref"] for s in expected if s["kind"] == "media"]
    assert sorted(in_media) == sorted(out_media)
