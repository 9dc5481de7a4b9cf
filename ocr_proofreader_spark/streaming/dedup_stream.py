"""Streaming exact deduplication over a documents stream.

``dropDuplicates`` on the content hash emits the first arrival per hash
and suppresses every later duplicate — the standard streaming-ingest
dedup stage of a training-data pipeline.  State is one entry per unique
hash; on an unbounded stream a production deployment bounds it with
``dropDuplicatesWithinWatermark`` keyed on an ingest timestamp —
``dedup_stream_bounded`` below is that form (the driver's documents
table carries no event time, so it synthesizes a deterministic ingest
timestamp; suppression is guaranteed only for duplicates arriving
within the watermark delay, in exchange for state that expires).

WHICH doc is emitted first per hash is arrival-order-dependent, so the
deterministic (and DuckDB-checkable) projection is the distinct hash set
itself — ``dedup_stream_hashes`` in ``__spark_entry__`` — while the
suppression behavior across micro-batches and restarts is pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_proofreader_spark.streaming.stateful import (
    as_stream_dir, run_to_scratch_parquet)


def dedup_stream_hashes(spark: SparkSession, input_path: str,
                        max_files_per_trigger: int | None = None,
                        output_dir: str | None = None,
                        checkpoint_dir: str | None = None) -> DataFrame:
    """Distinct content hashes of a streamed documents table: one output
    row per unique md5(text), whichever micro-batch its first copy
    arrived in."""
    if output_dir is not None and checkpoint_dir is None:
        raise ValueError("output_dir requires checkpoint_dir (the "
                         "watermark/dedup state must persist with the "
                         "sink to survive restarts)")
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(as_stream_dir(input_path))
    deduped = (stream
               .select(F.md5(F.col("text")).alias("content_hash"))
               .dropDuplicates(["content_hash"]))
    if output_dir is not None:
        q = (deduped.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.read.parquet(output_dir)
    return run_to_scratch_parquet(deduped, spark, "dedup_stream_")


def dedup_stream_bounded(spark: SparkSession, input_path: str,
                         delay: str = "1 hour",
                         max_files_per_trigger: int | None = None
                         ) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    on the content hash, keyed on a synthesized deterministic ingest
    timestamp (the driver's documents table has no event time).

    State holds only hashes whose event time is within ``delay`` of the
    stream's max event time — entries older than the watermark are
    evicted, so state size is O(arrival rate x delay), not O(distinct
    hashes ever seen).  The contract: duplicates arriving within the
    watermark window are suppressed (exactly the unbounded operator's
    behavior there); a duplicate arriving later than ``delay`` after
    the retained copy MAY be re-emitted — the standard
    bounded-state/completeness trade every production ingest makes."""
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(as_stream_dir(input_path))
    # deterministic synthetic ingest time: seconds after an epoch base,
    # spread by doc_id so the corpus spans a multi-hour ingest window
    hashed = (stream
              .select(F.md5(F.col("text")).alias("content_hash"),
                      F.timestamp_seconds(
                          F.lit(1_700_000_000)
                          + F.col("doc_id").cast("long") % 7200)
                      .alias("ingest_ts"))
              .withWatermark("ingest_ts", delay)
              .dropDuplicatesWithinWatermark(["content_hash"]))
    return run_to_scratch_parquet(hashed.select("content_hash"), spark,
                                  "dedup_stream_wm_")
