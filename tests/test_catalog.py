"""Catalog backend: parquet in this sandbox, Iceberg when the runtime jar
exists (SURVEY.md section 1.3 documented deviation)."""

from ocr_proofreader_spark.catalog import Catalog, _has_iceberg


def test_parquet_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), backend="auto")
    assert cat.backend in ("parquet", "iceberg")
    df = spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, n int")
    cat.write(df, "t1")
    assert cat.exists("t1")
    assert not cat.exists("t2")
    got = sorted((r["doc_id"], r["n"]) for r in cat.read("t1").collect())
    assert got == [("a", 1), ("b", 2)]


def test_append_mode(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), backend="parquet")
    df = spark.createDataFrame([("a", 1)], "doc_id string, n int")
    cat.write(df, "t", mode="overwrite")
    cat.write(df, "t", mode="append")
    assert cat.read("t").count() == 2


def test_backend_detection_matches_classpath(spark):
    # this sandbox has no iceberg-spark-runtime jar (SURVEY.md 1.3)
    assert _has_iceberg(spark) in (True, False)
