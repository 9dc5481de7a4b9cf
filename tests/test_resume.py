"""Resumability protocol (SURVEY.md test 5.2-6): a killed run replays only
unfinished buckets and the final output is identical to an uninterrupted
run."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.lexicon import broadcast_lexicon
from ocr_proofreader_spark.operators.proofread import proofread
from ocr_proofreader_spark.operators.resume import ResumableRunner, resume_filter


def _tuples(rows):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in rows}


def test_kill_and_resume(spark, corpus_small, base_lexicon, tmp_path):
    docs = (spark.read.parquet(f"{corpus_small}/documents.parquet")
            .limit(80).cache())
    cfg = RunConfig(run_id="r1", num_buckets=6)
    lex_bc = broadcast_lexicon(spark, base_lexicon)
    out_root = str(tmp_path / "out")

    runner = ResumableRunner(spark, out_root, cfg, lex_bc)
    with pytest.raises(RuntimeError, match="injected failure"):
        runner.run(docs, fail_after=3)
    assert len(runner.done_buckets()) == 3

    finished = sorted(runner.done_buckets())
    mtimes = {b: os.path.getmtime(os.path.join(out_root, "data",
                                               f"bucket={b}"))
              for b in finished}

    # resume with a NEW run_id (fresh driver) on the same output root
    runner2 = ResumableRunner(spark, out_root,
                              RunConfig(run_id="r2", num_buckets=6), lex_bc)
    runner2.run(docs)
    assert len(runner2.done_buckets()) == 6

    # finished buckets were not rewritten
    for b, mt in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out_root, "data", f"bucket={b}")) == mt

    # output identical to an uninterrupted single-shot run
    resumed = _tuples(runner2.read_output().collect())
    single = _tuples(proofread(spark, docs, cfg, lex_bc).collect())
    assert resumed == single

    # lineage: one ok row per bucket, attempts all 1 (no partial replays)
    lineage = runner2.read_lineage().collect()
    assert len(lineage) == 6
    assert {r["partition_id"] for r in lineage} == set(range(6))
    assert all(r["status"] == "ok" for r in lineage)
    assert sum(r["doc_count"] for r in lineage) == 80
    assert sum(r["corrections"] for r in lineage) > 0


def test_resume_filter_anti_join(spark, corpus_small):
    docs = spark.read.parquet(f"{corpus_small}/documents.parquet").limit(50)
    done = spark.createDataFrame([(0,), (1,)], "partition_id int")
    kept = resume_filter(docs, done, num_buckets=4)
    from ocr_proofreader_spark.operators.resume import bucket_col
    remaining = (kept.withColumn("b", bucket_col(4))
                 .select("b").distinct().collect())
    assert {r["b"] for r in remaining} <= {2, 3}
    total = docs.count()
    dropped = (docs.withColumn("b", bucket_col(4))
               .filter(F.col("b").isin([0, 1])).count())
    assert kept.count() == total - dropped


def test_hash_version_guard(spark, base_lexicon, tmp_path):
    """An output root bucketed under a different doc_id hash must refuse
    to resume (mixing layouts silently skips/duplicates docs)."""
    from ocr_proofreader_spark.operators.resume import BUCKET_HASH_VERSION
    cfg = RunConfig(run_id="r1", num_buckets=4)
    lex_bc = broadcast_lexicon(spark, base_lexicon)
    out_root = str(tmp_path / "out")

    r1 = ResumableRunner(spark, out_root, cfg, lex_bc)
    vfile = os.path.join(r1.marker_dir, "_HASH_VERSION")
    with open(vfile) as fh:
        assert fh.read() == BUCKET_HASH_VERSION   # stamped on first init
    ResumableRunner(spark, out_root, cfg, lex_bc)  # same version: fine

    with open(vfile, "w") as fh:
        fh.write("xxhash64-v0")
    with pytest.raises(RuntimeError, match="bucketed with hash"):
        ResumableRunner(spark, out_root, cfg, lex_bc)

    # pre-stamp layout: markers exist but no version file
    os.remove(vfile)
    with open(os.path.join(r1.marker_dir, "0.done"), "w") as fh:
        fh.write("r0")
    with pytest.raises(RuntimeError, match="no _HASH_VERSION"):
        ResumableRunner(spark, out_root, cfg, lex_bc)
