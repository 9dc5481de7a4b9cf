"""Main-content extraction for markup documents (north_rule: "HTML
boilerplate strip, ... DOM heuristics").

The classic line-wise TEXT-DENSITY heuristic (Arc90/boilerpipe family):
a line belongs to the main content iff its tag-stripped text is long
enough AND dominates the raw line (density >= 1/2) — navigation chrome,
link bars, ads and footers are short and tag-heavy, so they fall out
without any DOM parse.  The whole operator is JVM-side array
higher-order functions over ``split(html, '\\n')`` — per-row, ORDER
PRESERVING and shuffle-free, so it scales as a pure map stage — and
every step is SQL-expressible, so the DuckDB twin recomputes the full
synthesize -> strip -> extract pipeline bit-for-bit.

``synth_html`` wraps a plain-text corpus in deterministic boilerplate
(nav / ad / footer chrome) so extraction is testable without external
data: on long docs the extractor must recover the original text exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the tag-strip pattern '<[^>]*>' parses identically under Java regex
# and RE2, but the replace semantics differ: Spark's regexp_replace is
# GLOBAL by default while DuckDB replaces only the first match without
# the 'g' flag — hence two spellings of the same strip
_STRIP_SPARK = "trim(regexp_replace({l}, '<[^>]*>', ''))"
_STRIP_SQL = "trim(regexp_replace({l}, '<[^>]*>', '', 'g'))"

# DOM-type blocklist: lines opening a known chrome container are never
# content, whatever their text density (a long copyright footer beats
# the density test alone)
_CHROME = "^<(nav|footer|header|script|style|aside)[ >]"

_BOILERPLATE = (
    '<html><head><title>synthetic page</title></head><body>',
    '<nav><a href="/">Home</a> | <a href="/about">About</a> | '
    '<a href="/contact">Contact</a></nav>',
    '<div class="ad">Buy now!!! Limited offer</div>',
    # ... main content goes here ...
    '<footer>(c) 2026 example corp - all rights reserved</footer>',
    '</body></html>',
)


def synth_html(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + an ``html`` column: the text wrapped in deterministic
    boilerplate chrome (pure concat — no Python)."""
    head = "\n".join(_BOILERPLATE[:3])
    tail = "\n".join(_BOILERPLATE[3:])
    # NULL text -> empty page (mirrored by coalesce in the SQL twin);
    # without this, concat would propagate NULL html on the Spark side
    # while any non-NULL-propagating twin spelling diverged
    return docs.withColumn(
        "html",
        F.concat(F.lit(head + "\n<p>"),
                 F.coalesce(F.col(text_col), F.lit("")),
                 F.lit("</p>\n" + tail)))


def extract_main_html(html_docs: DataFrame, min_text: int = 30,
                      html_col: str = "html") -> DataFrame:
    """doc_id + ``main_text``: the density-filtered, tag-stripped lines
    joined in original order."""
    # strip each line ONCE into a struct, then filter/project on it —
    # inlining the strip into the predicate would run the regex 3x/line
    s = _STRIP_SPARK.format(l="l")
    expr = (f"array_join(transform(filter("
            f"transform(split({html_col}, '\\n'), "
            f"l -> struct(l AS raw, {s} AS txt)), "
            f"p -> length(p.txt) >= {min_text} "
            f"AND length(p.txt) * 2 >= length(p.raw) "
            f"AND NOT p.raw rlike '{_CHROME}'), "
            f"p -> p.txt), '\\n')")
    return html_docs.select("doc_id", F.expr(expr).alias("main_text"))


def pdf_text_roundtrip(docs: DataFrame) -> DataFrame:
    """PDF text-layer plumbing end-to-end (north_rule: "PDF/layout
    parse"): write each doc's text into a real single-page PDF
    (functions/pdf.py) — even doc_ids get a /FlateDecode-compressed
    content stream, odd ones raw, so both parser paths run on every
    corpus — parse the PDF back, and emit the md5 of the recovered
    text.  One Arrow-batched map stage, no shuffle.  The DuckDB twin is
    just ``md5(text)`` — it never sees the PDF bytes, so a lossy
    escape/inflate/parse anywhere in the roundtrip fails the hash."""
    import hashlib
    from typing import Iterator

    import pandas as pd

    from ocr_proofreader_spark.functions.pdf import (extract_pdf_text,
                                                     synth_pdf)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            # NULL text -> NULL digest, matching the oracle's md5(NULL)
            out["pdf_text_digest"] = [
                None if t is None else
                hashlib.md5(
                    extract_pdf_text(synth_pdf(t, compress=d % 2 == 0))
                    .encode()).hexdigest()
                for d, t in zip(pdf["doc_id"], pdf["text"])]
            yield out
    return (docs.select("doc_id", "text")
            .mapInPandas(fn, "doc_id long, pdf_text_digest string"))


def extract_main_sql(min_text: int = 30) -> str:
    """DuckDB twin of synth_html + extract_main_html over ``documents``:
    same boilerplate, same density rule, digest of the extracted text."""
    head = "\n".join(_BOILERPLATE[:3]).replace("'", "''")
    tail = "\n".join(_BOILERPLATE[3:]).replace("'", "''")
    s = _STRIP_SQL.format(l="l")
    return f"""
        WITH page AS (
          SELECT doc_id,
                 '{head}' || chr(10) || '<p>' || coalesce(text, '')
                 || '</p>' || chr(10) || '{tail}' AS html
          FROM documents)
        SELECT doc_id,
               -- coalesce: array_to_string([]) is NULL in DuckDB where
               -- Spark's array_join([]) is '' — all-filtered docs must
               -- digest identically on both sides
               md5(coalesce(array_to_string(
                 [p.txt for p in
                  [struct_pack(raw := l, txt := {s})
                   for l in string_split(html, chr(10))]
                  if length(p.txt) >= {min_text}
                     and length(p.txt) * 2 >= length(p.raw)
                     and not regexp_matches(p.raw, '{_CHROME}')],
                 chr(10)), '')) AS main_digest
        FROM page"""
