"""S10/S11 derived datasets vs the oracle's per-book counter."""

from pyspark.sql import functions as F

from ocr_proofreader_spark.operators.word_freq import lexicon_table, word_freq
from oracle.refsem import book_word_freq


def test_word_freq_matches_oracle(spark, corpus_small):
    docs = spark.read.parquet(f"{corpus_small}/documents.parquet").limit(20)
    wf = word_freq(docs).collect()
    got = {}
    for r in wf:
        got.setdefault(r["doc_id"], {})[r["word"]] = r["freq"]

    for row in docs.collect():
        spans = [s.asDict() for s in row["spans"]]
        exp = book_word_freq(spans)
        assert got.get(row["doc_id"], {}) == dict(exp), row["doc_id"]


def test_lexicon_table(spark, corpus_small, base_lexicon):
    docs = spark.read.parquet(f"{corpus_small}/documents.parquet").limit(40)
    wf = word_freq(docs)
    lex = lexicon_table(spark, base_lexicon, wf, freq_k=5)
    rows = lex.collect()
    words = {r["word"] for r in rows}
    assert base_lexicon <= words
    # no duplicates between base and book_frequent
    assert len(rows) == len(words)
    frequent = {r["word"] for r in rows if r["source"] == "book_frequent"}
    assert frequent.isdisjoint(base_lexicon)
    # every frequent word really has freq >= 5 in some book
    if frequent:
        mx = (wf.filter(F.col("word").isin(list(frequent)))
              .groupBy("word").agg(F.max("freq").alias("m")).collect())
        assert all(r["m"] >= 5 for r in mx)
