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


def test_stateful_sessionize_stream_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: state must carry open sessions
    across micro-batches — split the events by time into two files,
    force one file per trigger, and demand exact equality with the batch
    engine's closed sessions (all but each user's last)."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ocr_proofreader_spark.operators.relational import sessionize
    from ocr_proofreader_spark.streaming.stateful import sessionize_stream

    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("driver testdata missing")
    ev = spark.read.parquet(src)
    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    # time-ordered split: every user's earlier events land in file 0, so
    # sessions spanning the cut exercise the state carry
    ts_cut = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    for sub, part_df in (("b0", ev.filter(F.unix_timestamp("ts") <= ts_cut)),
                         ("b1", ev.filter(F.unix_timestamp("ts") > ts_cut))):
        d = os.path.join(in_dir, sub)
        part_df.coalesce(1).write.parquet(d)
        part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        os.rename(os.path.join(d, part),
                  os.path.join(in_dir, f"{sub}.parquet"))
        import shutil
        shutil.rmtree(d)

    got = sessionize_stream(spark, in_dir, max_files_per_trigger=1)
    g = {(r["user_id"], r["session_no"]):
         (r["n_events"], r["start_epoch"], r["end_epoch"], r["total_value"])
         for r in got.collect()}

    batch = sessionize(ev)
    w = Window.partitionBy("user_id")
    closed = (batch.withColumn("mx", F.max("session_no").over(w))
              .filter(F.col("session_no") < F.col("mx")).drop("mx"))
    b = {(r["user_id"], r["session_no"]):
         (r["n_events"], r["start_epoch"], r["end_epoch"], r["total_value"])
         for r in closed.collect()}
    assert g == b
    assert len(g) > 0
