"""Deterministic synthetic corpus generator (FIXTURES.md section 3).

Generates the interleaved text+media `documents` table (BASELINE.json:15
input_hint shape) plus the expected proofread output per doc.  No external
data; everything derives from `fixtures/lexicon_base.txt` and the seed.

Ground truth is obtained by running the frozen oracle on the CLEAN input
(all-lexicon words, no corruptions) — the oracle is a no-op speller there, so
ground truth is purely structural (R5/R6).  Corruptions are then injected and
each corrupted doc is validated: oracle(corrupted) must equal the ground
truth; if a random corruption happens to be ambiguous under rule R4 the doc's
corruptions are re-rolled with a new salt (up to 3), else the doc falls back
to clean.  Doc i uses Random(seed*1_000_003 + i) so generation is
parallelizable and order-independent.

Span-boundary semantics (rule R6): a text span whose last paragraph does NOT
continue into the next text span ends with a trailing newline (a blank final
line closes the paragraph); a continued span ends mid-paragraph with no
trailing blank, and the next text span starts directly with the
continuation lines.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle.refsem import (edit_distance_le2, load_base_lexicon,
                           long_s_candidates, proofread_document)

HERE = os.path.dirname(os.path.abspath(__file__))
LEXICON_PATH = os.path.join(HERE, "lexicon_base.txt")

WRAP_COLS = 60
LIGS = [("fi", "ﬁ"), ("fl", "ﬂ"), ("ff", "ﬀ")]
ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _roman(n: int) -> str:
    vals = [(100, "C"), (90, "XC"), (50, "L"), (40, "XL"), (10, "X"),
            (9, "IX"), (5, "V"), (4, "IV"), (1, "I")]
    out = []
    for v, s in vals:
        while n >= v:
            out.append(s)
            n -= v
    return "".join(out)


def _wrap(words: list[str], cols: int = WRAP_COLS) -> list[str]:
    lines, cur = [], ""
    for w in words:
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= cols:
            cur += " " + w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines


class CorpusGenerator:
    def __init__(self, seed: int = 42, freq_k: int = 5):
        self.seed = seed
        self.freq_k = freq_k
        self.lexicon = load_base_lexicon(LEXICON_PATH)
        self.words = sorted(self.lexicon)
        self.by_first: dict[str, list[str]] = {}
        for w in self.words:
            self.by_first.setdefault(w[0], []).append(w)

    # -- corruption-validity predicates (keep corrections unambiguous) ----

    def _swap_hits(self, tok: str) -> list[str]:
        """Known f<->s swap variants of tok (rule R3b candidates)."""
        return [v for _, v in long_s_candidates(tok.lower())
                if v in self.lexicon]

    def _d1_hits(self, tok: str) -> list[str]:
        """Same-first-letter lexicon words at edit distance exactly 1."""
        c = tok.lower()
        out = []
        for w in self.by_first.get(c[0], []):
            if abs(len(w) - len(c)) <= 1 and edit_distance_le2(c, w) == 1:
                out.append(w)
                if len(out) > 1:
                    break
        return out

    def _d2_reachable(self, tok: str) -> bool:
        """Any same-first-letter lexicon word within edit distance 2."""
        c = tok.lower()
        for w in self.by_first.get(c[0], []):
            if abs(len(w) - len(c)) <= 2 and edit_distance_le2(c, w) <= 2:
                return True
        return False

    # -- corruption helpers --------------------------------------------

    def _corrupt_word(self, rng: random.Random,
                      w: str) -> tuple[str, str | None]:
        """At most one corruption per word: (word', kind|None)."""
        # long-s: non-final 's' -> 'f' (p=0.03 per eligible s)
        for i in [k for k, c in enumerate(w[:-1]) if c == "s"]:
            if rng.random() < 0.03:
                cand = w[:i] + "f" + w[i + 1:]
                # R3b must map it back uniquely to w
                if (cand.lower() not in self.lexicon
                        and self._swap_hits(cand) == [w.lower()]):
                    return cand, "long_s"
        # ligature glyphs (p=0.02 per occurrence)
        for pat, lig in LIGS:
            if pat in w and rng.random() < 0.02:
                return w.replace(pat, lig, 1), "lig"
        # distance-1 typo (p=0.02 per word >= 4 chars; first letter kept so
        # the original stays in the R4 candidate bucket)
        if len(w) >= 4 and rng.random() < 0.02:
            i = rng.randrange(1, len(w))
            orig = w[i]
            if orig in ALPHABET:
                k = ALPHABET.index(orig)
                repl = ALPHABET[(k + rng.choice([-1, 1])) % 26]
                cand = w[:i] + repl + w[i + 1:]
                # must survive R3b untouched and be uniquely d1-correctable
                if (cand.lower() not in self.lexicon
                        and not self._swap_hits(cand)
                        and self._d1_hits(cand) == [w.lower()]):
                    return cand, "typo"
        # unfixable scramble (p=0.005): 3 substitutions -> must be flagged
        if len(w) >= 5 and rng.random() < 0.005:
            chars = list(w)
            for i in rng.sample(range(1, len(w)), 3):
                chars[i] = rng.choice("qzxjk")
            cand = "".join(chars)
            # must be flagged: out of R3b reach and > distance 2 from the
            # whole first-letter bucket
            if (cand.lower() not in self.lexicon
                    and not self._swap_hits(cand)
                    and not self._d2_reachable(cand)):
                return cand, "scramble"
        return w, None

    def _corrupt_wrap(self, rng: random.Random, words: list[str]) -> list[str]:
        """Wrap corrupted words, injecting end-of-line hyphen breaks."""
        lines, cur = [], ""
        for w in words:
            if not cur:
                cur = w
                continue
            if len(cur) + 1 + len(w) <= WRAP_COLS:
                cur += " " + w
                continue
            # wrap point: maybe hyphen-break this word (p=0.05, len >= 6,
            # only clean lexicon words so the rejoin is guaranteed known)
            if (len(w) >= 6 and w.lower() in self.lexicon
                    and rng.random() < 0.05):
                cut = rng.randrange(2, len(w) - 2)
                lines.append(cur + " " + w[:cut] + "-")
                cur = w[cut:]
            else:
                lines.append(cur)
                cur = w
        if cur:
            lines.append(cur)
        return lines

    # -- document construction ------------------------------------------

    def _gen_plans(self, rng: random.Random, doc_id: str, skewed: bool):
        """Span plans: ('media', ref) or
        ('text', heading|None, [word-lists], continues_prev: bool)."""
        n_spans = min(40, int(rng.expovariate(1 / 8.0)) + 1)
        if skewed:
            n_spans *= 50
        plans = []
        chapter_no = 0
        prev_continues = False  # previous text span ended mid-paragraph
        for j in range(n_spans):
            if rng.random() < 0.20:
                plans.append(("media", f"scan/{doc_id}/p{j:04d}.png"))
                continue
            heading = None
            if not prev_continues and rng.random() < 0.15:
                chapter_no += 1
                heading = f"CHAPTER {_roman(chapter_no)}"
            paras = [[rng.choice(self.words)
                      for _ in range(rng.randint(20, 60))]
                     for _ in range(rng.randint(1, 3))]
            plans.append(("text", heading, paras, prev_continues))
            prev_continues = rng.random() < 0.10
        return plans

    @staticmethod
    def _continues_out(plans, j: int) -> bool:
        """True iff the text plan at j is continued by the NEXT text plan."""
        for nxt in plans[j + 1:]:
            if nxt[0] == "text":
                return nxt[3]
        return False

    def _corrupt_plans(self, rng: random.Random, plans):
        """Decide corruptions once: word lists -> (truth, ocr) pair lists.

        Unfixable scrambles SURVIVE proofreading (flagged, not altered), so
        the scrambled token goes into the truth render too."""
        out = []
        for plan in plans:
            if plan[0] == "media":
                out.append(plan)
                continue
            _, heading, paras, cont = plan
            pair_paras = []
            for words in paras:
                pairs = []
                for w in words:
                    cw, survives = self._corrupt_word_pair(rng, w)
                    pairs.append((cw if survives else w, cw))
                pair_paras.append(pairs)
            out.append(("text", heading, pair_paras, cont))
        return out

    def _corrupt_word_pair(self, rng: random.Random,
                           w: str) -> tuple[str, bool]:
        """(possibly-corrupted word, survives_in_truth)."""
        cw, kind = self._corrupt_word(rng, w)
        return cw, kind == "scramble"

    def _render_plans(self, plans, which: str,
                      rng: random.Random | None = None):
        """Render (truth|ocr) spans from corruption-decided plans."""
        spans = []
        for offset, plan in enumerate(plans):
            if plan[0] == "media":
                spans.append({"kind": "media", "text": "",
                              "media_ref": plan[1], "offset": offset})
                continue
            _, heading, pair_paras, continues_prev = plan
            blocks = []
            if heading and not continues_prev:
                blocks.append(heading)
            for pairs in pair_paras:
                if which == "truth":
                    lines = _wrap([t for t, _ in pairs])
                else:
                    lines = self._corrupt_wrap(rng, [o for _, o in pairs])
                blocks.append("\n".join(lines))
            text = "\n\n".join(blocks)
            if not self._continues_out(plans, offset):
                text += "\n"  # blank final line closes the paragraph (R6)
            spans.append({"kind": "text", "text": text, "media_ref": "",
                          "offset": offset})
        return spans

    def gen_doc(self, i: int, validate: bool = True):
        """Return (doc_id, corrupted_spans, expected_out_spans)."""
        doc_id = f"book-{i:06d}"
        rng = random.Random(self.seed * 1_000_003 + i)
        plans = self._gen_plans(rng, doc_id, skewed=(i % 100 == 99))

        fallback = None
        for attempt in range(3):
            crng = random.Random(self.seed * 1_000_003 + i
                                 + attempt * 777_000_001 + 13)
            cplans = self._corrupt_plans(crng, plans)
            truth = self._render_plans(cplans, "truth")
            expected, _ = proofread_document(truth, self.lexicon, self.freq_k)
            corrupted = self._render_plans(cplans, "ocr", crng)
            if not validate:
                return doc_id, corrupted, expected
            got, _ = proofread_document(corrupted, self.lexicon, self.freq_k)
            if got == expected:
                return doc_id, corrupted, expected
            if fallback is None:
                fallback = (truth, expected)
        # fallback: emit the truth render (proofreads to itself modulo
        # structure; re-verify cheaply — truth is mostly lexicon words)
        truth, expected = fallback
        return doc_id, truth, expected

    def gen_corpus(self, n_docs: int, validate: bool = True):
        for i in range(n_docs):
            yield self.gen_doc(i, validate=validate)


def write_parquet(out_dir: str, n_docs: int, seed: int = 42,
                  validate: bool = True, row_group_docs: int = 2000) -> None:
    """Write documents.parquet + expected.parquet under out_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    gen = CorpusGenerator(seed=seed)
    doc_ids, spans_col, exp_col = [], [], []
    for doc_id, corrupted, expected in gen.gen_corpus(n_docs, validate):
        doc_ids.append(doc_id)
        spans_col.append(corrupted)
        exp_col.append(expected)

    os.makedirs(out_dir, exist_ok=True)
    in_span = pa.struct([("kind", pa.string()), ("text", pa.string()),
                         ("media_ref", pa.string()), ("offset", pa.int32())])
    out_span = pa.struct([("kind", pa.string()), ("text", pa.string()),
                          ("media_ref", pa.string()), ("order", pa.int32())])
    docs = pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": pa.array(spans_col, pa.list_(in_span))})
    exp = pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                    "spans": pa.array(exp_col, pa.list_(out_span))})
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=row_group_docs)
    pq.write_table(exp, os.path.join(out_dir, "expected.parquet"),
                   row_group_size=row_group_docs)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-docs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-validate", action="store_true")
    args = ap.parse_args()
    write_parquet(args.out_dir, args.n_docs, args.seed,
                  validate=not args.no_validate)
    print(f"wrote {args.n_docs} docs to {args.out_dir}")
