"""Scale-adaptive input spreading (spark_optimization_guide section 2.5,
"input skew").

A parquet scan parallelizes at row-group granularity: a table that
arrives as one small file (or one giant row group) produces ONE scan
task, and every narrow operator stacked on top of it — token explodes,
per-row md5s, Arrow-batched Python passes — serializes on one core no
matter how many the session has.  ``spread_input`` hash-repartitions the
frame up to the session's default parallelism, but only when the scan is
actually narrower than that: at production scale the input has thousands
of splits, the guard is false, and no shuffle is added.  The keys are
the frame's own first column when it is a stable id (callers pass it
explicitly) so placement is deterministic under task retry (guide
section 2.5 on rand()-derived keys; SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` by ``keys`` to the session parallelism iff the
    current plan has fewer partitions than cores; no-op otherwise (and
    for streaming frames, which cannot be inspected this way)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
