"""S2/S15/S16: checkpointed resumability with per-partition lineage.

Unit of replay = a deterministic hash bucket of doc_id (stable across runs
and cluster sizes).  Protocol per bucket:

1. proofread the bucket's docs (full cluster parallelism inside the bucket),
2. write output to ``<out>/_tmp/<run_id>/<bucket>``,
3. atomic rename to ``<out>/data/bucket=<b>``,
4. write the marker ``<out>/_markers/<b>.done`` and append a lineage row.

A killed job leaves unfinished buckets markerless; on restart with the same
output root, only markerless buckets replay (exactly-once at bucket level —
the rules are deterministic, so a replay is byte-identical).  On Iceberg the
same protocol rides on snapshot commits instead of directory renames
(SURVEY.md section 3.3); the local-FS rename here matches the parquet
backend of catalog.py.

The anti-join form of the resume filter (SURVEY.md S2) is exposed as
``resume_filter`` for single-shot plans and the driver cross-checks."""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ocr_proofreader_spark.config import RunConfig
from ocr_proofreader_spark.operators.proofread import proofread
from ocr_proofreader_spark.schemas import LINEAGE


# Stamped into every output root so a resume NEVER mixes bucket layouts:
# docs bucketed under a different hash would be silently skipped or
# duplicated.  Bump when bucket_col's function changes.
BUCKET_HASH_VERSION = "md5-60bit-v1"


def bucket_col(num_buckets: int):
    """Deterministic doc_id -> bucket (stable across runs/parallelism).

    md5-derived (first 60 bits) rather than xxhash64 so the assignment is
    reproducible OUTSIDE Spark too — the driver's DuckDB oracle recomputes
    it bit-for-bit.  Any stable hash satisfies the resume protocol; what
    matters is that the same doc lands in the same bucket on every run
    and at every cluster size."""
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("bigint"))
    return F.pmod(h, F.lit(num_buckets)).cast("int")


def resume_filter(docs: DataFrame, done: DataFrame,
                  num_buckets: int) -> DataFrame:
    """S2: drop docs whose bucket already completed (broadcast anti-join).

    No distinct on the done side: anti-join semantics ignore duplicate
    build rows, so deduping would only add a shuffle."""
    return (docs.withColumn("_bucket", bucket_col(num_buckets))
            .join(F.broadcast(done.select(F.col("partition_id")
                                          .alias("_bucket"))),
                  "_bucket", "left_anti")
            .drop("_bucket"))


class ResumableRunner:
    def __init__(self, spark: SparkSession, out_root: str, cfg: RunConfig,
                 lex_bc):
        self.spark = spark
        self.out_root = out_root
        self.cfg = cfg
        self.lex_bc = lex_bc
        self.data_dir = os.path.join(out_root, "data")
        self.marker_dir = os.path.join(out_root, "_markers")
        self.lineage_dir = os.path.join(out_root, "lineage")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.marker_dir, exist_ok=True)
        self._check_hash_version()

    def _check_hash_version(self) -> None:
        """Refuse to resume an output root bucketed under a different
        doc_id hash — markers from the old layout would silently skip
        unprocessed docs and duplicate processed ones."""
        vfile = os.path.join(self.marker_dir, "_HASH_VERSION")
        if os.path.exists(vfile):
            with open(vfile) as fh:
                found = fh.read().strip()
            if found != BUCKET_HASH_VERSION:
                raise RuntimeError(
                    f"output root {self.out_root} was bucketed with hash "
                    f"{found!r}, engine uses {BUCKET_HASH_VERSION!r}; "
                    f"finish it with the old engine version or start a "
                    f"fresh output root")
        elif self.done_buckets():
            raise RuntimeError(
                f"output root {self.out_root} has completed buckets but "
                f"no _HASH_VERSION stamp (pre-{BUCKET_HASH_VERSION} "
                f"layout); finish it with the engine version that wrote "
                f"it or start a fresh output root")
        else:
            with open(vfile, "w") as fh:
                fh.write(BUCKET_HASH_VERSION)

    # -- bookkeeping -------------------------------------------------------

    def done_buckets(self) -> set[int]:
        return {int(f[:-5]) for f in os.listdir(self.marker_dir)
                if f.endswith(".done")}

    def _prior_attempts(self) -> dict[int, int]:
        """partition_id -> prior lineage rows, read once per run()."""
        if not os.path.isdir(self.lineage_dir):
            return {}
        rows = (self.spark.read.parquet(self.lineage_dir)
                .groupBy("partition_id").count().collect())
        return {r["partition_id"]: r["count"] for r in rows}

    def _append_lineage(self, row: dict) -> None:
        df = self.spark.createDataFrame([row], LINEAGE)
        df.coalesce(1).write.mode("append").parquet(self.lineage_dir)

    # -- the run -------------------------------------------------------------

    def run(self, docs: DataFrame, fail_after: int | None = None) -> None:
        """Process all pending buckets; ``fail_after`` injects a crash after
        N completed buckets (SURVEY.md test 5.2-6)."""
        cfg = self.cfg
        done = self.done_buckets()
        prior = self._prior_attempts()
        bucketed = docs.withColumn("_bucket", bucket_col(cfg.num_buckets))
        completed_this_run = 0
        for b in range(cfg.num_buckets):
            if b in done:
                continue
            if fail_after is not None and completed_this_run >= fail_after:
                raise RuntimeError(f"injected failure before bucket {b}")
            t0 = time.time()
            part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
            out = proofread(self.spark, part, cfg, self.lex_bc)
            obs = Observation(f"lineage-{b}")
            observed = out.observe(
                obs,
                F.count("*").alias("doc_count"),
                F.coalesce(F.sum("span_count"), F.lit(0)).alias("span_count"),
                F.coalesce(F.sum("corrections"), F.lit(0)).alias("corrections"),
                F.coalesce(F.sum("flagged"), F.lit(0)).alias("flagged"),
            ).drop("span_count", "corrections", "flagged")

            tmp = os.path.join(self.out_root, "_tmp", cfg.run_id, str(b))
            final = os.path.join(self.data_dir, f"bucket={b}")
            observed.write.mode("overwrite").parquet(tmp)
            metrics = obs.get
            if os.path.isdir(final):  # stale partial from a dead run
                import shutil
                shutil.rmtree(final)
            os.rename(tmp, final)
            self._append_lineage({
                "run_id": cfg.run_id,
                "partition_id": b,
                "doc_count": int(metrics["doc_count"]),
                "span_count": int(metrics["span_count"]),
                "corrections": int(metrics["corrections"]),
                "flagged": int(metrics["flagged"]),
                "status": "ok",
                "wall_ms": int((time.time() - t0) * 1000),
                "attempt": prior.get(b, 0) + 1,
                "finished_at": datetime.now(timezone.utc),
            })
            with open(os.path.join(self.marker_dir, f"{b}.done"), "w") as fh:
                fh.write(cfg.run_id)
            completed_this_run += 1

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    def read_lineage(self, dedupe: bool = True) -> DataFrame:
        """Lineage rows, deduped by default to the latest attempt per
        bucket: a crash in the window between the data rename and the
        ``.done`` marker write replays the bucket on restart and appends a
        second ``ok`` row, so raw reads would double-count rollups.  Pass
        ``dedupe=False`` for the full audit trail."""
        df = self.spark.read.parquet(self.lineage_dir)
        if not dedupe:
            return df
        from pyspark.sql import Window
        w = Window.partitionBy("partition_id").orderBy(
            F.desc("attempt"), F.desc("finished_at"))
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
