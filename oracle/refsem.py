"""Frozen reference semantics for the OCR-proofreading pipeline.

This module is THE executable spec (SURVEY.md section 2.3, rules R0-R6).
The reference checkout at /root/reference was empty at survey time
(SURVEY.md section 0.1), so these frozen rules — pinned by the golden
micro-case table in FIXTURES.md section 4 — stand in for the reference
implementation of ``porcpine1967/ocr-proofreader``.  The Spark engine in
``ocr_proofreader_spark/`` is a second, independent, vectorized
implementation of the same rules; tests demand span-sequence equality
``(kind, text, media_ref, order)`` per document between the two
(BASELINE.json:15).

Pure Python, no Spark imports, deliberately simple and slow: clarity is
the point.  Every rule number below refers to SURVEY.md section 2.3.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# R1 tokenization: word chars incl. accented Latin, apostrophes, hyphens.
# NOTE: the class A-Za-zA0-\xff literally follows the frozen spec; it is used
# identically by oracle and engine, so both sides agree by construction.
TOKEN_RE = re.compile(r"[A-Za-zÀ-ÿ0-9'’-]+")
ALPHA_RE = re.compile(r"[A-Za-zÀ-ÿ]+\Z")
HAS_LETTER_RE = re.compile(r"[A-Za-zÀ-ÿ]")

# R2: trailing pure-alpha run followed by a hyphen at end of (rstripped) line,
# and leading pure-alpha run of the next (lstripped) line.
HYPHEN_TAIL_RE = re.compile(r"([A-Za-zÀ-ÿ]+)-\Z")
WORD_HEAD_RE = re.compile(r"[A-Za-zÀ-ÿ]+")

# R3a unconditional ligature / long-s character map.
LIG_MAP = {
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬀ": "ff",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ſ": "s",
}
# R3a conditional (token-level) map: applied only if the mapped token is in
# the lexicon and the raw one is not.
COND_LIG_MAP = {"Æ": "Ae", "æ": "ae", "Œ": "Oe", "œ": "oe"}

# R5 chapter-heading regex.
HEADING_RE = re.compile(r"^(CHAPTER|CHAPITRE|BOOK|PART)\b[A-Z0-9 .IVXLC-]*$")

DEFAULT_FREQ_K = 5  # S11: book words with freq >= K join the lexicon


def apply_lig_map(s: str) -> str:
    """R3a unconditional char map."""
    for k, v in LIG_MAP.items():
        s = s.replace(k, v)
    return s


def apply_cond_lig(tok: str) -> str:
    for k, v in COND_LIG_MAP.items():
        tok = tok.replace(k, v)
    return tok


def is_alpha(tok: str) -> bool:
    return bool(ALPHA_RE.match(tok))


def recase(candidate: str, original: str) -> str:
    """Re-case a (lowercase) corrected token to the original's pattern."""
    if original.isupper() and len(original) > 1:
        return candidate.upper()
    if original[:1].isupper():
        return candidate[:1].upper() + candidate[1:]
    return candidate


def edit_distance_le2(a: str, b: str) -> int:
    """Levenshtein distance capped at 3 (returns 3 for 'more than 2')."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 2:
        return 3
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            row_min = min(row_min, cur[j])
        if row_min > 2:
            return 3
        prev = cur
    return prev[lb] if prev[lb] <= 2 else 3


@dataclass
class Metrics:
    corrections: int = 0
    flagged: int = 0


@dataclass
class Lexicon:
    """Effective per-book lexicon: base dictionary + book-frequent words."""

    base: frozenset
    freq: Counter = field(default_factory=Counter)
    freq_k: int = DEFAULT_FREQ_K

    def known(self, tok: str) -> bool:
        w = tok.lower()
        if w in self.base:
            return True
        return self.freq.get(w, 0) >= self.freq_k and bool(ALPHA_RE.match(w))


def tokenize(text: str) -> list[str]:
    """R1: word tokens of a text blob (case preserved)."""
    return TOKEN_RE.findall(text)


def book_word_freq(spans) -> Counter:
    """S10: per-book word frequencies over RAW (pre-correction) text."""
    freq: Counter = Counter()
    for sp in spans:
        if sp["kind"] == "text" and sp.get("text"):
            for tok in TOKEN_RE.findall(sp["text"]):
                freq[tok.lower()] += 1
    return freq


# ---------------------------------------------------------------------------
# R2 hyphenation


def repair_hyphenation(lines: list[str], lex: Lexicon, m: Metrics) -> list[str]:
    lines = list(lines)
    i = 0
    while i < len(lines) - 1:
        tail = HYPHEN_TAIL_RE.search(lines[i].rstrip())
        if tail:
            nxt = lines[i + 1].lstrip()
            head = WORD_HEAD_RE.match(nxt)
            if head:
                word, rest = tail.group(1), head.group(0)
                joined = word + rest
                if lex.known(joined):
                    stripped = lines[i].rstrip()
                    prefix = stripped[: len(stripped) - len(word) - 1]
                    remainder = nxt[len(rest):].lstrip()
                    merged = prefix + joined + ((" " + remainder) if remainder else "")
                    lines[i] = merged
                    del lines[i + 1]
                    m.corrections += 1
                    continue  # re-check same line (chained breaks)
        i += 1
    return lines


# ---------------------------------------------------------------------------
# R3b long-s / f<->s swap candidates


def long_s_candidates(tok: str) -> list[tuple[int, str]]:
    """All variants of ``tok`` with exactly 1 or 2 lowercase f<->s swaps,
    as (n_swaps, variant)."""
    positions = [i for i, c in enumerate(tok) if c in ("f", "s")]
    out = []
    swap = {"f": "s", "s": "f"}
    n = len(positions)
    for a in range(n):
        i = positions[a]
        v1 = tok[:i] + swap[tok[i]] + tok[i + 1:]
        out.append((1, v1))
        for b in range(a + 1, n):
            j = positions[b]
            v2 = v1[:j] + swap[v1[j]] + v1[j + 1:]
            out.append((2, v2))
    return out


# ---------------------------------------------------------------------------
# R4 Levenshtein candidate scorer


def score_candidates(tok: str, lex: Lexicon) -> tuple[str, int, int] | None:
    """Best (candidate, distance, freq) for an unknown token, or None."""
    t = tok.lower()
    first = t[0]
    best = None  # (dist, -freq, len_diff, cand)
    for cand in lex.base | {w for w, c in lex.freq.items()
                            if c >= lex.freq_k and ALPHA_RE.match(w)}:
        if not cand or cand[0] != first:
            continue
        if abs(len(cand) - len(t)) > 2:
            continue
        d = edit_distance_le2(t, cand)
        if d > 2:
            continue
        f = lex.freq.get(cand, 0)
        key = (d, -f, abs(len(cand) - len(t)), cand)
        if best is None or key < best:
            best = key
    if best is None:
        return None
    d, negf, _ld, cand = best
    return cand, d, -negf


def correct_token(tok: str, lex: Lexicon, m: Metrics) -> str:
    """R3 conditional-ligature + R3b long-s + R4 scorer for one token."""
    if lex.known(tok):
        return tok
    # R3a conditional token-level ligatures (AE/ae/OE/oe)
    if any(c in tok for c in COND_LIG_MAP):
        mapped = apply_cond_lig(tok)
        if lex.known(mapped):
            m.corrections += 1
            return mapped
    # R3b long-s f<->s swaps
    if is_alpha(tok) and ("f" in tok or "s" in tok):
        cands = [(n, v) for n, v in long_s_candidates(tok) if lex.known(v)]
        if cands:
            # rank by R4's tuple: (distance=n_swaps, -freq, len_diff=0, variant)
            cands.sort(key=lambda nv: (nv[0], -lex.freq.get(nv[1].lower(), 0),
                                       nv[1].lower()))
            m.corrections += 1
            return cands[0][1]
    # R4 scorer
    if is_alpha(tok) and len(tok) >= 3:
        if tok[0].isupper():
            m.flagged += 1  # capitalized unknown: flag, never edit
            return tok
        scored = score_candidates(tok, lex)
        if scored is not None:
            cand, d, f = scored
            if d == 1 or (d == 2 and f >= 3):
                m.corrections += 1
                return recase(cand, tok)
        m.flagged += 1
        return tok
    # ineligible token: unknown-with-letter still counts flagged
    if HAS_LETTER_RE.search(tok):
        m.flagged += 1
    return tok


def correct_line(line: str, lex: Lexicon, m: Metrics) -> str:
    """R3a map + per-token R3/R4 over one line."""
    mapped = apply_lig_map(line)
    if mapped != line:
        m.corrections += 1
    out = []
    pos = 0
    for mt in TOKEN_RE.finditer(mapped):
        out.append(mapped[pos:mt.start()])
        out.append(correct_token(mt.group(0), lex, m))
        pos = mt.end()
    out.append(mapped[pos:])
    return "".join(out)


# ---------------------------------------------------------------------------
# R5 heading detection


def is_heading(line: str, prev_blank: bool, next_blank: bool) -> bool:
    s = line.strip()
    if not s:
        return False
    if HEADING_RE.match(s):
        return True
    # all-caps line of <= 6 tokens surrounded by blanks (span edges count)
    if (prev_blank and next_blank
            and not re.search(r"[a-zà-ÿ]", s)
            and re.search(r"[A-ZÀ-Þ]", s)
            and len(TOKEN_RE.findall(s)) <= 6):
        return True
    return False


# ---------------------------------------------------------------------------
# R6 doc-level segmentation state machine


class _Segmenter:
    def __init__(self) -> None:
        self.out: list[dict] = []
        self.para: list[str] = []
        self.deferred_media: list[dict] = []

    def emit(self, kind: str, text: str, media_ref: str) -> None:
        self.out.append({"kind": kind, "text": text, "media_ref": media_ref,
                         "order": len(self.out)})

    def close_para(self) -> None:
        if self.para:
            self.emit("paragraph", " ".join(self.para), "")
            self.para = []
        if self.deferred_media:
            for md in self.deferred_media:
                self.emit("media", "", md.get("media_ref") or "")
            self.deferred_media = []

    def media(self, span: dict) -> None:
        if self.para:
            self.deferred_media.append(span)
        else:
            self.emit("media", "", span.get("media_ref") or "")

    def text_lines(self, lines: list[str]) -> None:
        heading_buf: list[str] = []

        def flush_heading() -> None:
            if heading_buf:
                self.emit("chapter", " ".join(h.strip() for h in heading_buf), "")
                heading_buf.clear()

        n = len(lines)
        for idx, line in enumerate(lines):
            blank = not line.strip()
            prev_blank = idx == 0 or not lines[idx - 1].strip()
            next_blank = idx == n - 1 or not lines[idx + 1].strip()
            if blank:
                flush_heading()
                self.close_para()
            elif is_heading(line, prev_blank, next_blank):
                self.close_para()
                heading_buf.append(line)
            else:
                flush_heading()
                self.para.append(line.strip())
        flush_heading()
        # paragraph stays open across the span boundary (R6)

    def finish(self) -> list[dict]:
        self.close_para()
        return self.out


# ---------------------------------------------------------------------------
# public entry point


def proofread_document(spans, base_lexicon: frozenset,
                       freq_k: int = DEFAULT_FREQ_K) -> tuple[list[dict], Metrics]:
    """Run the full frozen pipeline (R1-R6) over one document's spans.

    ``spans``: iterable of dicts with keys kind/text/media_ref/offset.
    Returns (out_spans, metrics); out spans carry dense ``order``.
    """
    spans = sorted(spans, key=lambda s: s["offset"])
    lex = Lexicon(base=base_lexicon, freq=book_word_freq(spans), freq_k=freq_k)
    m = Metrics()
    seg = _Segmenter()
    for sp in spans:
        if sp["kind"] == "media":
            seg.media(sp)
            continue
        text = sp.get("text") or ""
        if not text.strip():
            continue  # G12: blank page emits nothing, paragraph stays open
        lines = text.split("\n")
        lines = repair_hyphenation(lines, lex, m)
        lines = [correct_line(ln, lex, m) for ln in lines]
        seg.text_lines(lines)
    return seg.finish(), m


def load_base_lexicon(path: str) -> frozenset:
    with open(path, encoding="utf-8") as fh:
        return frozenset(w.strip().lower() for w in fh if w.strip())
