"""Golden micro-case table (FIXTURES.md section 4) against the frozen
pure-Python oracle.  These cases pin rules R1-R6 (SURVEY.md section 2.3);
prose never overrides this table."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle.refsem import load_base_lexicon, proofread_document

LEX = load_base_lexicon(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "fixtures", "lexicon_base.txt"))


def t(text, offset=0):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def m(ref, offset=0):
    return {"kind": "media", "text": "", "media_ref": ref, "offset": offset}


def run(spans):
    out, _ = proofread_document(spans, LEX)
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in out]


def test_g1_hyphen_join():
    assert run([t("the beau-\ntiful day")]) == [
        ("paragraph", "the beautiful day", "", 0)]


def test_g2_hyphen_nojoin_flagged_unaltered():
    assert run([t("the xq-\nzw day")]) == [
        ("paragraph", "the xq- zw day", "", 0)]


def test_g3_ligature_map():
    assert run([t("a ﬁne day")]) == [("paragraph", "a fine day", "", 0)]


def test_g4_long_s():
    assert run([t("fome fuch words")]) == [
        ("paragraph", "some such words", "", 0)]


def test_g5_scorer_len_tiebreak():
    assert run([t("the worde of dogs")]) == [
        ("paragraph", "the words of dogs", "", 0)]


def test_g6_capitalized_unknown_flag_only():
    spans = [t("the Zxqvw day")]
    out, metrics = proofread_document(spans, LEX)
    assert [(s["kind"], s["text"]) for s in out] == [
        ("paragraph", "the Zxqvw day")]
    assert metrics.flagged == 1


def test_g7_chapter_heading():
    assert run([t("CHAPTER II\n\nonce upon a time")]) == [
        ("chapter", "CHAPTER II", "", 0),
        ("paragraph", "once upon a time", "", 1)]


def test_g8_cross_boundary_merge_media_after():
    assert run([t("the quick", 0), m("p1.png", 1), t("brown fox.", 2)]) == [
        ("paragraph", "the quick brown fox.", "", 0),
        ("media", "", "p1.png", 1)]


def test_g9_media_order_preserved_dense():
    assert run([m("p0.png", 0), t("the dog", 1), m("p1.png", 2)]) == [
        ("media", "", "p0.png", 0),
        ("paragraph", "the dog", "", 1),
        ("media", "", "p1.png", 2)]


def test_g10_blank_line_split():
    assert run([t("one two\n\nthree day")]) == [
        ("paragraph", "one two", "", 0),
        ("paragraph", "three day", "", 1)]


def test_g11_long_s_recase_preserved():
    assert run([t("The houfe is fine")]) == [
        ("paragraph", "The house is fine", "", 0)]


def test_g12_empty_page_emits_nothing():
    assert run([t("")]) == []


def test_offsets_out_of_order_are_sorted():
    assert run([t("brown fox.", 2), m("p1.png", 1), t("the quick", 0)]) == [
        ("paragraph", "the quick brown fox.", "", 0),
        ("media", "", "p1.png", 1)]


def test_allcaps_heading_between_blanks():
    out = run([t("some words here\n\nTHE GREAT FOREST\n\nmore words here")])
    assert out == [
        ("paragraph", "some words here", "", 0),
        ("chapter", "THE GREAT FOREST", "", 1),
        ("paragraph", "more words here", "", 2)]


def test_consecutive_headings_merge():
    out = run([t("CHAPTER II\nPART I\n\nonce upon a time")])
    assert out == [
        ("chapter", "CHAPTER II PART I", "", 0),
        ("paragraph", "once upon a time", "", 1)]


def test_book_frequent_word_joins_lexicon():
    # 'zzyzx' appears 5 times (K=5): becomes known -> never flagged/corrected
    text = "zzyzx zzyzx zzyzx zzyzx zzyzx"
    out, metrics = proofread_document([t(text)], LEX)
    assert out[0]["text"] == text
    assert metrics.flagged == 0


def test_typo_distance1_autocorrect():
    # 'housr' -> 'house' (unique distance-1 candidate, same first letter)
    assert run([t("the housr is old")]) == [
        ("paragraph", "the house is old", "", 0)]


def test_scorer_lexicographic_tiebreak_is_deterministic():
    # 'hovse': 'horse' and 'house' both distance 1, freq 0, len_diff 0;
    # R4 tiebreak -> lexicographically smallest candidate wins.
    assert run([t("the hovse is old")]) == [
        ("paragraph", "the horse is old", "", 0)]


def test_unfixable_scramble_flagged_not_altered():
    spans = [t("the qzkvw is old")]
    out, metrics = proofread_document(spans, LEX)
    assert out[0]["text"] == "the qzkvw is old"
    assert metrics.flagged == 1
