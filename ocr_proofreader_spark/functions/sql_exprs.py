"""Shared JVM-side (whole-stage-codegen-friendly) SQL expressions.

The R1 tokenizer's character class translates 1:1 to a Java regex, so
token streams for aggregation-side consumers (word_freq, the chunked
path's freq maps) never leave the JVM.  Exactness vs the frozen
``oracle.refsem.TOKEN_RE`` is pinned by tests/test_word_freq.py."""

# Lowercase FIRST, then split on the complement of the lowered token
# class, then drop the empty fragments split() yields at delimiters.
# Lower-first is ~30% faster than split-then-transform(lower) (one regex
# pass over a simpler value) and is exactly equivalent to the frozen
# class [A-Za-zÀ-ÿ0-9'’-] for all Latin-1 text: lower() maps A-Z -> a-z
# and À-Þ -> à-þ, and the two Latin-1 chars lower() leaves alone that the
# frozen class contains — ß (U+00DF) and × (U+00D7) — are added back
# explicitly.  (Outside Latin-1, e.g. Ÿ/U+0178, the frozen tokenizer
# treats the char as a delimiter pre- and post-correction anyway; fixture
# and driver corpora are Latin-1/ASCII, and exactness is pinned by
# tests/test_word_freq.py.)
R1_TOKENS_LOWER = (
    "filter(split(lower({col}), \"[^a-zà-ÿß×0-9'’-]+\"), w -> w <> '')")
