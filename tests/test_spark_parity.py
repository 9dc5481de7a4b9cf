"""End-to-end span-sequence equality: Spark engine vs frozen oracle
(SURVEY.md test 5.2-2; BASELINE.json:15 acceptance criterion)."""

import pytest

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.lexicon import broadcast_lexicon
from ocr_proofreader_spark.operators.proofread import proofread


def _spans_tuples(rows):
    """{doc_id: [(kind,text,media_ref,order), ...]} from collected rows."""
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in rows}


@pytest.fixture(scope="module")
def proofread_result(spark, corpus_small, base_lexicon):
    docs = spark.read.parquet(f"{corpus_small}/documents.parquet")
    cfg = RunConfig(rebalance_partitions=8)
    lex_bc = broadcast_lexicon(spark, base_lexicon)
    out = proofread(spark, docs, cfg, lex_bc)
    return out.collect()


def test_span_sequence_equality(spark, corpus_small, proofread_result):
    expected = _spans_tuples(
        spark.read.parquet(f"{corpus_small}/expected.parquet").collect())
    got = _spans_tuples(proofread_result)
    assert set(got) == set(expected)
    mismatches = [d for d in expected if got[d] != expected[d]]
    if mismatches:
        d = mismatches[0]
        for a, b in zip(expected[d], got[d]):
            assert a == b, f"doc {d}: {a!r} != {b!r}"
        assert len(expected[d]) == len(got[d]), d
    assert not mismatches


def test_metrics_sane(proofread_result):
    total_corr = sum(r["corrections"] for r in proofread_result)
    total_span = sum(r["span_count"] for r in proofread_result)
    assert total_span > 0
    assert total_corr > 0  # the corpus plants correctable corruptions


def test_chunked_path_matches_fast_path(spark, corpus_small, base_lexicon):
    """Force every doc through the skew path; results must be identical
    (rule R0 page-locality guarantees chunking is exact)."""
    docs = (spark.read.parquet(f"{corpus_small}/documents.parquet")
            .limit(60))
    lex_bc = broadcast_lexicon(spark, base_lexicon)
    fast = proofread(spark, docs, RunConfig(), lex_bc)
    forced = proofread(spark, docs,
                       RunConfig(chunk_threshold_spans=0, chunk_spans=4),
                       lex_bc)
    a = _spans_tuples(fast.collect())
    b = _spans_tuples(forced.collect())
    assert a == b
