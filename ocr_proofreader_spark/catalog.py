"""Table catalog: Iceberg when the runtime jar is present, Parquet otherwise.

north_rule demands Iceberg tables (BASELINE.json:14); this sandbox has no
iceberg-spark-runtime jar and no network (SURVEY.md section 1.3 documents the
deviation).  Both backends expose identical read/write semantics; only the
format strings differ, so flipping ``backend='iceberg'`` on a real cluster is
a config change, not a code change."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str,
                 backend: str = "auto"):
        self.spark = spark
        self.warehouse = warehouse
        if backend == "auto":
            backend = "iceberg" if _has_iceberg(spark) else "parquet"
        self.backend = backend

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def read(self, table: str) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.read.format("iceberg").load(self._path(table))
        return self.spark.read.parquet(self._path(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if self.backend == "iceberg":
            writer.format("iceberg").save(self._path(table))
        else:
            writer.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.backend == "iceberg":
            try:
                self.read(table).schema
                return True
            except Exception:
                return False
        return os.path.isdir(self._path(table))


# formats the generic path reader/writer supports: the two columnar
# formats Spark bundles (full predicate-pushdown scans) plus the two
# text interchange formats every ingest pipeline meets
SOURCE_FORMATS = ("parquet", "orc", "json", "csv", "xml")


def write_format(df: DataFrame, path: str, fmt: str,
                 mode: str = "overwrite") -> None:
    """Write ``df`` at ``path`` in any supported source format.

    CSV is configured for lossless round-trips of free text (header
    row, RFC-4180 double-quote escaping so embedded quotes, commas and
    newlines survive); JSON is line-delimited.  Columnar formats keep
    their defaults — compression and stats come from Spark."""
    if fmt not in SOURCE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", True).option("escape", '"')
    elif fmt == "xml":
        # native XML source (built-in since Spark 4); entity escaping
        # makes free text incl. newlines/quotes lossless by default
        w = w.option("rowTag", "row")
    w.format(fmt).save(path)


def read_format(spark: SparkSession, path: str, fmt: str,
                schema=None) -> DataFrame:
    """Read a table written by :func:`write_format`.

    Text formats take an explicit ``schema`` (schema inference is a
    full extra pass AND nondeterministic on ambiguous columns — at
    100 TB always pass the schema); CSV reads multiLine so documents
    containing newlines round-trip."""
    if fmt not in SOURCE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = (r.option("header", True).option("escape", '"')
             .option("multiLine", True))
    elif fmt == "xml":
        r = r.option("rowTag", "row")
    return r.format(fmt).load(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   n_buckets: int, mode: str = "overwrite") -> None:
    """Persist a table bucketed (and sorted) by join key.

    Two tables bucketed the same way join WITHOUT a shuffle — each
    bucket pair is co-located, so at 100 TB the big fact-to-fact join
    costs zero network.  Bucketing needs the session catalog
    (saveAsTable), unlike plain path writes; on Iceberg the same effect
    comes from a bucket(...) partition transform."""
    (df.write.mode(mode)
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*bucket_cols)
     .format("parquet")
     .saveAsTable(table_name))


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
