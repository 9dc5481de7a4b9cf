"""Multimodal plumbing: schemas, batch shapes, 1->N expansion, and
determinism of the stubbed decode/resize/frame-sample stages (task
brief: the codecs are stubbed, the Spark-side plumbing is real)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF),
                                reason="driver testdata missing")


@pytest.fixture(scope="module")
def media(spark):
    from ocr_proofreader_spark.operators.multimodal import media_inventory
    from ocr_proofreader_spark.sources.interleaved import interleaved_from_flat
    flat = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    return media_inventory(interleaved_from_flat(flat))


def test_decode_schema_and_determinism(spark, media):
    from ocr_proofreader_spark.operators.multimodal import decode_media
    out = decode_media(media)
    rows = out.collect()
    assert len(rows) == media.count()          # decode is 1:1
    r = rows[0]
    assert 600 <= r["width"] < 800 and 800 <= r["height"] < 1000
    assert len(r["features"]) == 8
    again = {x["media_ref"]: tuple(x["features"])
             for x in decode_media(media.repartition(5)).collect()}
    assert all(again[x["media_ref"]] == tuple(x["features"]) for x in rows)


def test_decode_real_path_is_marked(spark, media):
    from py4j.protocol import Py4JJavaError

    from ocr_proofreader_spark.operators.multimodal import decode_media
    with pytest.raises(Exception) as e:
        decode_media(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, Py4JJavaError)


def test_resize_geometry(spark, media):
    from pyspark.sql import functions as F

    from ocr_proofreader_spark.operators.multimodal import (decode_media,
                                                            resize_media)
    out = resize_media(decode_media(media), max_side=512)
    bad = out.filter(
        (F.greatest("out_width", "out_height") != 512)
        | (F.col("out_width") <= 0) | (F.col("out_height") <= 0)).count()
    assert bad == 0
    # aspect ratio preserved within 1px rounding
    r = out.first()
    assert abs(r["out_width"] / r["out_height"]
               - r["width"] / r["height"]) < 0.01
    # resize stays shuffle-free on top of decode
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_frames_expansion(spark, media):
    from ocr_proofreader_spark.operators.multimodal import sample_frames
    n_media = media.count()
    out = sample_frames(media, n_frames=4)
    rows = out.collect()
    assert len(rows) == 4 * n_media            # exact 1->N expansion
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, frames in by_ref.items():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == [0, 1, 2, 3]
        ts = [f["t_offset_sec"] for f in sorted(frames,
                                                key=lambda f: f["frame_idx"])]
        assert ts == sorted(ts) and ts[0] == 0.0
        assert all(len(f["frame_features"]) == 8 for f in frames)
