"""Property-based tests (SURVEY.md test 5.2-4) on the pure-Python oracle
and the engine's doc processor — both must satisfy the same invariants."""

from hypothesis import given, settings, strategies as st

from fixtures.gen import CorpusGenerator
from ocr_proofreader_spark.functions.rules import DocProofreader, LexIndex
from oracle.refsem import load_base_lexicon, proofread_document

GEN = CorpusGenerator(seed=42)
LEX = GEN.lexicon
IDX = LexIndex(LEX)

WORDS = sorted(LEX)[:80]

span_strategy = st.lists(
    st.one_of(
        st.builds(lambda ws: ("text", " ".join(ws)),
                  st.lists(st.sampled_from(WORDS), min_size=1, max_size=12)),
        st.builds(lambda n: ("media", f"scan/p{n:03d}.png"),
                  st.integers(0, 999)),
    ),
    min_size=0, max_size=12)


def _mk_spans(items):
    return [{"kind": k,
             "text": v if k == "text" else "",
             "media_ref": v if k == "media" else "",
             "offset": i}
            for i, (k, v) in enumerate(items)]


@settings(max_examples=60, deadline=None)
@given(span_strategy)
def test_media_preserved_and_order_dense(items):
    spans = _mk_spans(items)
    out, _ = proofread_document(spans, LEX)
    # dense gapless order
    assert [s["order"] for s in out] == list(range(len(out)))
    # media refs byte-identical, relative order preserved
    in_refs = [s["media_ref"] for s in spans if s["kind"] == "media"]
    out_refs = [s["media_ref"] for s in out if s["kind"] == "media"]
    assert in_refs == out_refs
    # engine agrees with oracle on every random interleaving
    pr = DocProofreader(IDX, freq_k=GEN.freq_k)
    eng, _ = pr.run(spans)
    assert eng == [(s["kind"], s["text"], s["media_ref"], s["order"])
                   for s in out]


def _rebuild_input(out_spans):
    """Proofread output -> an equivalent input doc: consecutive text-kind
    spans join into one page with blank lines between blocks; a trailing
    blank line closes the last paragraph (R6)."""
    spans, buf = [], []

    def flush():
        if buf:
            spans.append({"kind": "text", "text": "\n\n".join(buf) + "\n",
                          "media_ref": "", "offset": len(spans)})
            buf.clear()

    for s in out_spans:
        if s["kind"] == "media":
            flush()
            spans.append({"kind": "media", "text": "",
                          "media_ref": s["media_ref"], "offset": len(spans)})
        else:
            buf.append(s["text"])
    flush()
    return spans


def test_idempotence_fixpoint():
    """Proofreading its own output changes nothing (SURVEY 5.2-4b)."""
    for i in range(25):
        _, corrupted, expected = GEN.gen_doc(i)
        rebuilt = _rebuild_input(expected)
        again, _ = proofread_document(rebuilt, LEX)
        assert again == expected, f"doc {i} not a fixpoint"


def test_clean_text_passthrough():
    """All-lexicon text suffers only re-segmentation (SURVEY 5.2-4c)."""
    spans = [{"kind": "text", "text": "the quick brown fox\njumps over the\n",
              "media_ref": "", "offset": 0}]
    out, m = proofread_document(spans, LEX)
    assert out == [{"kind": "paragraph",
                    "text": "the quick brown fox jumps over the",
                    "media_ref": "", "order": 0}]
    assert m.corrections == 0 and m.flagged == 0
