"""Structured Streaming variant: AvailableNow + foreachBatch reuses the
batch operator and produces identical spans."""

import os
import shutil

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.lexicon import broadcast_lexicon
from ocr_proofreader_spark.operators.proofread import proofread_fast
from ocr_proofreader_spark.streaming.proofread_stream import proofread_stream


def _tuples(rows):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in rows}


def test_stream_matches_batch(spark, corpus_small, base_lexicon, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    shutil.copy(os.path.join(corpus_small, "documents.parquet"),
                os.path.join(in_dir, "part-0.parquet"))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cfg = RunConfig()
    lex_bc = broadcast_lexicon(spark, base_lexicon)

    q = proofread_stream(spark, in_dir, out_dir, ckpt, cfg, lex_bc)
    q.awaitTermination(180)

    got = _tuples(spark.read.parquet(out_dir).collect())
    batch = _tuples(
        proofread_fast(spark.read.parquet(in_dir), lex_bc, cfg)
        .drop("span_count", "corrections", "flagged").collect())
    assert got == batch
    assert len(got) == 300

    # restart with same checkpoint: no new files -> no duplicate output
    q2 = proofread_stream(spark, in_dir, out_dir, ckpt, cfg, lex_bc)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == 300
