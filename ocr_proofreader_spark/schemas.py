"""Fixed Spark schemas (SURVEY.md section 1.2; input shape per
BASELINE.json:15 input_hint)."""

from pyspark.sql import types as T

SPAN_IN = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("offset", T.IntegerType(), False),
])

SPAN_OUT = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("order", T.IntegerType(), False),
])

DOCUMENTS_IN = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_IN), False),
])

DOCUMENTS_OUT = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN_OUT), False),
])

# proofread output + per-doc metric columns (observed then dropped pre-write)
DOCUMENTS_OUT_METRICS = T.StructType(list(DOCUMENTS_OUT.fields) + [
    T.StructField("span_count", T.IntegerType(), False),
    T.StructField("corrections", T.IntegerType(), False),
    T.StructField("flagged", T.IntegerType(), False),
])

WORD_FREQ = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("word", T.StringType(), False),
    T.StructField("freq", T.LongType(), False),
])

LINEAGE = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("doc_count", T.LongType(), False),
    T.StructField("span_count", T.LongType(), False),
    T.StructField("corrections", T.LongType(), False),
    T.StructField("flagged", T.LongType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("attempt", T.IntegerType(), False),
    T.StructField("finished_at", T.TimestampType(), False),
])
