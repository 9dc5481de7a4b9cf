"""Semi-structured column surfaces new in Spark 4: native XML
functions (``to_xml`` / ``from_xml`` — SPARK-44265 made XML a built-in
source) and the VARIANT type (``parse_json`` / ``variant_get`` —
binary semi-structured values that keep shredded-column pushdown on
the table side).

Everything is JVM-side expression work (zero UDFs, zero shuffles
beyond the final aggregates), and every operator is twinned in DuckDB
from the RAW columns — the twin never sees XML or VARIANT, so a lossy
escape/parse anywhere in the roundtrip fails the value hash, exactly
like the PDF/HTML extraction contracts.

Scale notes: the XML/VARIANT parse work is per-row whole-stage-codegen
projection (linear, partition-local); the aggregates are partial+final
hash aggs on low-cardinality keys (event_type).  Nothing here adds a
shuffle beyond the one grouped rollup per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def docs_xml_roundtrip(docs: DataFrame) -> DataFrame:
    """documents -> XML record per doc (``to_xml``) -> parsed back
    (``from_xml``) -> md5 of the recovered text.

    Exercises XML entity escaping (&, <, >, quotes), multi-line
    element text and non-ASCII — all must survive bit-exactly, which
    the DuckDB twin checks as plain ``md5(text)`` without ever seeing
    the XML.  NULL text propagates as a NULL digest on both sides."""
    xml = F.to_xml(F.struct(F.col("doc_id"), F.col("text")),
                   {"rowTag": "doc"})
    parsed = F.from_xml(xml, "doc_id BIGINT, text STRING",
                        {"rowTag": "doc"})
    return docs.select(
        "doc_id",
        F.md5(parsed.getField("text")).alias("xml_text_digest"))


def events_xml_agg(events: DataFrame) -> DataFrame:
    """events -> one XML record per event carrying (event_type,
    value_cents, k) -> parsed back with ``from_xml`` -> grouped rollup
    over the RECOVERED fields.  Floats travel as integer cents so the
    text roundtrip is exact; ``k`` comes from the JSON props column
    first (get_json_object), making this a JSON->XML->relational
    chain.  The twin recomputes the rollup from the raw columns."""
    rec = F.struct(
        F.col("event_type"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"))
    xml = F.to_xml(rec, {"rowTag": "ev"})
    parsed = F.from_xml(
        xml, "event_type STRING, value_cents BIGINT, k BIGINT",
        {"rowTag": "ev"})
    return (events
            .select(parsed.alias("r"))
            .select("r.event_type", "r.value_cents", "r.k")
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value_cents").alias("sum_value_cents"),
                 F.sum("k").alias("sum_k")))


def events_variant_agg(events: DataFrame) -> DataFrame:
    """The VARIANT-typed twin of the JSON-path surface: ``props``
    parses to a VARIANT once (``try_parse_json`` — malformed rows
    become NULL variants, mirroring the map-surface contract), fields
    extract with ``variant_get`` path expressions, then a grouped
    rollup.  At table scale VARIANT is the storage-side answer to
    repeated get_json_object scans: one binary parse, typed shredded
    access."""
    v = F.try_parse_json("props")
    return (events
            .select("event_type",
                    F.variant_get(v, "$.k", "bigint").alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))
