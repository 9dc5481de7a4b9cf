"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with lag + cumulative sum
(operators/relational.py::sessionize); the streaming twin keeps one open
session per user in Spark state and EMITS a session the moment a later
event closes it (gap > 30 min).  Open sessions stay in state, so the
operator's output is exactly the *closed* sessions — a semantics that is
SQL-expressible over a finite input (all sessions but each user's last),
which gives this streaming operator a bit-exact DuckDB oracle.

State is keyed by user_id (the shuffle key), one row of
(session_no counter, open-session aggregates) per user — O(users), not
O(events), so a year of events over 10^9 users holds state the size of
the user table.  Within a micro-batch the fold is vectorized
(numpy boundary flags + segment reduction), not per-row Python.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_no", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_epoch", T.LongType()),
    T.StructField("end_epoch", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

# (closed-session counter, open session: start/last epoch, n, sum)
SESSION_STATE = T.StructType([
    T.StructField("sessions_closed", T.LongType()),
    T.StructField("start_epoch", T.LongType()),
    T.StructField("last_epoch", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def as_stream_dir(input_path: str) -> str:
    """The file stream source only takes directories: expose a single
    file through a scratch dir with one symlink."""
    if not os.path.isfile(input_path):
        return input_path
    d = tempfile.mkdtemp(prefix="stream_src_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    os.symlink(os.path.abspath(input_path),
               os.path.join(d, os.path.basename(input_path)))
    return d


def run_to_scratch_parquet(stream_df: DataFrame, spark: SparkSession,
                           prefix: str) -> DataFrame:
    """Drain a streaming DataFrame through Trigger.AvailableNow into a
    scratch parquet sink and return a batch DataFrame over the result.

    NOT the memory sink: each memory-sink call pins its full result in
    the driver for the session lifetime.  The scratch dir (sink +
    checkpoint) lives under driver-local tempfile.mkdtemp, which is
    only correct in local mode — on a cluster, executors must write to
    shared storage, so production callers pass their own
    output_dir/checkpoint_dir instead of this helper.  Scratch dirs are
    removed at interpreter exit (the returned DataFrame stays lazy, so
    an eager unlink would break later actions)."""
    scratch = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    out_path = os.path.join(scratch, "out-" + uuid.uuid4().hex[:8])
    q = (stream_df.writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", os.path.join(scratch, "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # schema from the streaming DataFrame: an append sink that emitted
    # zero rows has no data files, and a bare read.parquet would raise
    # UNABLE_TO_INFER_SCHEMA instead of returning an empty frame
    return spark.read.schema(stream_df.schema).parquet(out_path)


def _session_fold(gap_sec: int):
    def fold(key: Tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        # event-time order with the same tie-break as the batch engine
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        epochs = (batch["ts"].astype("int64") // 10**9).to_numpy()
        values = batch["value"].to_numpy()

        if state.exists:
            closed_no, s_start, s_last, s_n, s_tot = state.get
            segments = [[s_start, s_last, s_n, s_tot]]  # carried open sess
        else:
            closed_no, segments = 0, []

        # within-batch segments: boundary where the gap to the previous
        # batch event exceeds the session gap (vectorized)
        prev = np.concatenate(([-(1 << 62)], epochs[:-1]))
        seg_ids = np.cumsum((epochs - prev) > gap_sec)   # 1, 2, ...
        for sid in range(1, int(seg_ids[-1]) + 1):
            m = seg_ids == sid
            start, end = int(epochs[m][0]), int(epochs[m][-1])
            n, tot = int(m.sum()), float(values[m].sum())
            if segments and start - segments[-1][1] <= gap_sec:
                segments[-1][1] = end        # continues the previous one
                segments[-1][2] += n
                segments[-1][3] += tot
            else:
                segments.append([start, end, n, tot])

        out = []
        for start, end, n, tot in segments[:-1]:   # all but last = closed
            closed_no += 1
            out.append((user_id, closed_no, n, start, end, round(tot, 3)))
        s_start, s_last, s_n, s_tot = segments[-1]  # last stays open
        state.update((closed_no, s_start, s_last, s_n, s_tot))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SESSION_OUT])

    return fold


def sessionize_stream(spark: SparkSession, input_path: str,
                      gap_minutes: int = 30,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """Run the stateful sessionizer over ``input_path`` (parquet file or
    directory) with Trigger.AvailableNow and return the closed sessions.

    One stateful shuffle on user_id; results drain through a scratch
    parquet sink (run_to_scratch_parquet — the memory sink would pin
    every result in the driver for the session lifetime).  Production
    would writeStream to the lineage-tracked table with a durable
    checkpoint dir.

    Ordering caveat: within a micro-batch events are sorted by
    (ts, event_id), but the fold assumes per-user event time is
    non-decreasing ACROSS micro-batches (AvailableNow over sorted files
    satisfies this); a late event arriving after its session closed in
    an earlier batch would start a new session rather than reopen the
    old one — a watermark+event-time-ordered variant is the fix when
    the source can reorder across batches."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(as_stream_dir(input_path))
    closed = (stream
              .groupBy("user_id")
              .applyInPandasWithState(
                  _session_fold(gap_minutes * 60), SESSION_OUT,
                  SESSION_STATE, "append", GroupStateTimeout.NoTimeout))
    return run_to_scratch_parquet(closed, spark, "sessionize_stream_")
