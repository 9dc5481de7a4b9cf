"""Shared JVM-side (whole-stage-codegen-friendly) SQL expressions.

The R1 tokenizer's character class translates 1:1 to a Java regex, so
token streams for aggregation-side consumers (word_freq, the chunked
path's freq maps) never leave the JVM.  Exactness vs the frozen
``oracle.refsem.TOKEN_RE`` is pinned by tests/test_word_freq.py."""

# split on the complement of the frozen token class (SURVEY.md 2.3 R1),
# lowercase, drop the empty fragments split() yields at delimiters
R1_TOKENS_LOWER = (
    "filter(transform(split({col}, \"[^A-Za-zÀ-ÿ0-9'’-]+\"),"
    " w -> lower(w)), w -> w <> '')")
