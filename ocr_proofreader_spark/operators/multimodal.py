"""Multimodal column plumbing: media spans as opaque references/binary with
typed metadata, decode/feature-extract as Arrow-batched UDF stages.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind ``fake_decode=True`` (default) or a clearly
marked ``NotImplementedError`` otherwise — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested
(task brief: stub the decode, make the plumbing real)."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("page", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def media_inventory(docs_spans: DataFrame) -> DataFrame:
    """Explode media spans of the interleaved table -> one row per media
    ref with its parsed page number (pure built-ins, no Python)."""
    return (docs_spans
            .select("doc_id", F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select("doc_id",
                    F.col("s.media_ref").alias("media_ref"),
                    F.regexp_extract("s.media_ref", r"p(\d+)\.png", 1)
                    .cast("int").alias("page")))


def decode_media(media: DataFrame, feature_dim: int = 8,
                 fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract stage over media refs.

    Real deployments read the binary payload and decode; this sandbox has
    no codecs, so ``fake_decode`` derives deterministic pixel metadata and
    features from the ref's md5 — schema, batching and partitioning are
    identical to the real path."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "no image codec in this environment; supply a real "
                    "decoder via mapInPandas against the binary column")
            rows = []
            for doc_id, ref, page in zip(pdf["doc_id"], pdf["media_ref"],
                                         pdf["page"]):
                h = hashlib.md5(ref.encode()).digest()
                width = 600 + h[0] % 200
                height = 800 + h[1] % 200
                feats = (np.frombuffer(h[:feature_dim], dtype=np.uint8)
                         .astype(np.float32) / 255.0)
                rows.append((doc_id, ref, page, width, height,
                             feats.tolist()))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_ref", "page", "width", "height",
                "features"])
    return media.mapInPandas(fn, MEDIA_META)
