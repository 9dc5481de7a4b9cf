"""EP1: the production proofreading job, run via spark-submit --py-files.

    spark-submit --master local[32] --py-files dist/engine.zip \
        ocr_proofreader_spark/jobs/proofread_job.py \
        --input <documents.parquet> --output <out_root> \
        [--resume] [--bench-json <path>]

Reads an interleaved documents table, proofreads it (fast path + skew
path), writes proofread docs + word_freq + lexicon derived tables, with
per-bucket lineage and checkpointed resume (SURVEY.md EP1)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import SparkSession

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.lexicon import broadcast_lexicon, load_base_lexicon
from ocr_proofreader_spark.operators.resume import ResumableRunner
from ocr_proofreader_spark.operators.word_freq import lexicon_table, word_freq


def build_session(app: str, master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    cores = shuffle_partitions or os.cpu_count() or 8
    return (b
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.driver.memory", "24g")
            # python-heavy scans want more, smaller input splits than the
            # 128MB default so no core idles behind a straggler file;
            # 8m ~= two scheduling waves over the bench corpus, which
            # measured ~18% faster than 16m for the Arrow/Python stage
            # (r6; 4m regressed — per-task overhead wins).  Env knob so
            # a JVM-scan-heavy deployment can restore a larger split
            # without editing code (guide sections 2.5/6.1)
            .config("spark.sql.files.maxPartitionBytes",
                    os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                                   "8m"))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # 1024 docs/batch ~= 3 MB of spans: one batch per typical
            # input split, so the Python chain sees whole-task batches
            # (guide section 4.2, keep batches big) while staying far
            # under Arrow's 2 GiB string-column cap for wide docs.
            # Measured r6: 256 -> 1024 is a small consistent win at the
            # bench corpus' ~625-doc splits (3 batch crossings -> 1)
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def main(argv: list[str] | None = None, spark=None) -> None:
    """CLI entry; pass ``spark`` to reuse an existing session (tests) —
    only a session this function created is stopped on exit."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--num-buckets", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument("--bench-json", default=None)
    ap.add_argument("--skip-derived", action="store_true",
                    help="skip word_freq/lexicon side tables (bench mode)")
    ap.add_argument("--lexicon", action="append", default=None,
                    metavar="LANG=PATH",
                    help="per-language dictionary (repeatable; include "
                         "default=PATH); docs pick theirs via the input's "
                         "lang column")
    args = ap.parse_args(argv)

    own_session = spark is None
    if own_session:
        spark = build_session("ocr-proofread", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    cfg = RunConfig(run_id=args.run_id, num_buckets=args.num_buckets,
                    rebalance_partitions=int(
                        spark.conf.get("spark.sql.shuffle.partitions")))
    if args.lexicon:
        bad = [s for s in args.lexicon if "=" not in s]
        if bad:
            ap.error(f"--lexicon expects LANG=PATH, got {bad[0]!r}")
        cfg.lexicon_paths = dict(s.split("=", 1) for s in args.lexicon)
    if cfg.lexicon_paths:
        # fail fast here, not deep in an executor's KeyError: docs whose
        # lang has no dedicated dictionary fall back to 'default'
        if "default" not in cfg.lexicon_paths:
            ap.error("--lexicon map must include a default=PATH entry")
        from ocr_proofreader_spark.lexicon import (broadcast_lexicons,
                                                   load_lexicons)
        by_lang = load_lexicons(cfg.lexicon_paths)
        base = by_lang["default"]
        lex_bc = broadcast_lexicons(spark, by_lang)
    else:
        base = load_base_lexicon(cfg.lexicon_path)
        lex_bc = broadcast_lexicon(spark, base)

    docs = spark.read.parquet(args.input)
    t0 = time.time()
    runner = ResumableRunner(spark, args.output, cfg, lex_bc)
    runner.run(docs)
    phase_b = time.time() - t0

    t1 = time.time()
    if not args.skip_derived:
        wf = word_freq(docs)
        wf.write.mode("overwrite").parquet(
            os.path.join(args.output, "word_freq"))
        lexicon_table(spark, base, spark.read.parquet(
            os.path.join(args.output, "word_freq")), cfg.freq_k) \
            .write.mode("overwrite").parquet(
            os.path.join(args.output, "lexicon"))
    phase_a = time.time() - t1

    n_docs = runner.read_output().count()
    wall = time.time() - t0
    result = {"docs": n_docs, "wall_sec": round(wall, 3),
              "proofread_sec": round(phase_b, 3),
              "derived_sec": round(phase_a, 3),
              "docs_per_sec": round(n_docs / max(phase_b, 1e-9), 2),
              "shuffle_partitions":
                  spark.conf.get("spark.sql.shuffle.partitions"),
              "nsalt": cfg.nsalt}
    print(json.dumps(result))
    if args.bench_json:
        with open(args.bench_json, "w") as fh:
            json.dump(result, fh)
    if own_session:
        spark.stop()


if __name__ == "__main__":
    main()
