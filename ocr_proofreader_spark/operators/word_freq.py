"""S10/S11: per-book word frequencies and the correction lexicon as
first-class derived datasets (BASELINE.json:6).

Pure DataFrame aggregations: Catalyst plans a partial+final hash aggregate
for the groupBy, so map-side combine keeps the shuffle small.  The R1
tokenizer is expressed with BUILT-IN split/lower/filter (its character
class translates 1:1 to a Java regex), so the whole stage stays inside
whole-stage codegen — zero Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_proofreader_spark.functions.sql_exprs import R1_TOKENS_LOWER


def word_freq(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> word_freq(doc_id, word, freq).

    Frequencies are counted over RAW (pre-correction) text span tokens,
    lowercased — the same signal the in-UDF scorer uses, so this table IS
    the engine's scoring input, materialized.

    Shape note (measured, r6): a single-generator rewrite — explode of
    ``flatten(transform(filter(spans, ...), s -> tokens(s.text)))`` —
    produces identical rows but was ~8% SLOWER at bench scale (HOF
    lambdas are interpreted per element, losing more than the skipped
    span-struct generator saves) and nested-schema pruning does not
    reach through the lambda anyway.  Keep the two codegen'd explodes."""
    spans = docs.select(
        "doc_id", F.explode("spans").alias("span"))
    return (spans
            .filter(F.col("span.kind") == "text")
            .select("doc_id",
                    F.explode(F.expr(
                        R1_TOKENS_LOWER.format(col="span.text")))
                    .alias("word"))
            .groupBy("doc_id", "word")
            .agg(F.count("*").alias("freq")))


def lexicon_table(spark: SparkSession, base: frozenset,
                  wf: DataFrame, freq_k: int = 5) -> DataFrame:
    """S11: base dictionary UNION book-frequent words -> lexicon(word, source).

    Book-frequent = alphabetic and freq >= K within some book.  `distinct`
    is a hash aggregate; the base side is parallelized from the driver (a
    few hundred KB at most)."""
    base_df = spark.createDataFrame([(w, "base") for w in sorted(base)],
                                    "word string, source string")
    frequent = (wf
                .filter((F.col("freq") >= freq_k)
                        & F.col("word").rlike(r"^[A-Za-zÀ-ÿ]+$"))
                .select("word").distinct()
                .join(base_df.select("word"), "word", "left_anti")
                .withColumn("source", F.lit("book_frequent")))
    return base_df.unionByName(frequent)
