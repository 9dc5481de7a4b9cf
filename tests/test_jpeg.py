"""Baseline JPEG codec (functions/jpeg.py): solid-color exactness (the
property the synthetic driver corpus relies on), quant-1 near-lossless
round-trips, mode coverage (gray / 4:4:4 / 4:2:0), determinism, and
poison-payload classification."""

import numpy as np
import pytest

from ocr_proofreader_spark.functions.codecs import CodecError, sniff_and_decode
from ocr_proofreader_spark.functions.jpeg import decode_jpeg, encode_jpeg


def test_solid_color_roundtrip_is_bit_exact():
    """All-ones quant tables leave a solid block's DC coefficient
    exactly representable, so solid images survive bit-exactly in
    every mode — what lets the JPEG leg join media_decode_real without
    touching the DuckDB twin."""
    for g in (0, 7, 61, 128, 200, 255):
        gray = np.full((13, 21, 1), g, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(gray)) == g).all()
        rgb = np.full((9, 10, 3), g, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(rgb)) == g).all()
        sub = np.full((17, 19, 3), g, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(sub, subsampling="420")) == g).all()


def test_quant1_roundtrip_near_lossless():
    """With quantization 1 the only loss is DCT coefficient rounding:
    max per-pixel error stays within a couple of levels on arbitrary
    content (and the decoded shape/channels are preserved)."""
    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, size=(24, 31, 1), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(gray))
    assert out.shape == (24, 31, 1)
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4
    # 4:2:0 with constant chroma (gray content in RGB): luma-only error
    grad = np.tile(np.arange(0, 256, 8, dtype=np.uint8), (32, 1))
    px = np.stack([grad, grad, grad], axis=2)
    out = decode_jpeg(encode_jpeg(px, subsampling="420"))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 4


def test_decode_is_deterministic():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(19, 23, 3), dtype=np.uint8)
    data = encode_jpeg(px)
    a = decode_jpeg(data)
    b = decode_jpeg(data)
    assert (a == b).all()
    assert data == encode_jpeg(px)           # encoder deterministic too


def test_sniff_dispatches_jpeg():
    px = np.full((10, 12, 1), 77, dtype=np.uint8)
    out = sniff_and_decode(encode_jpeg(px))
    assert out.shape == (10, 12, 1) and (out == 77).all()


def test_poison_payloads_classified():
    """Every malformed input raises CodecError (classified; the decode
    stage's per-row isolation depends on it), never IndexError/etc."""
    px = np.full((8, 8, 1), 50, dtype=np.uint8)
    good = encode_jpeg(px)
    with pytest.raises(CodecError):
        decode_jpeg(b"\xff\xd9" + good[2:])            # no SOI
    with pytest.raises(CodecError):
        decode_jpeg(good[:20])                         # truncated segment
    with pytest.raises(CodecError):
        decode_jpeg(good[:-30])                        # truncated scan
    # progressive (SOF2) is out of scope and must say so
    prog = bytearray(good)
    sof_at = bytes(prog).find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(CodecError, match="unsupported JPEG mode"):
        decode_jpeg(bytes(prog))
    # 12-bit precision rejected, classified
    bad_prec = bytearray(good)
    bad_prec[sof_at + 4] = 12
    with pytest.raises(CodecError, match="precision"):
        decode_jpeg(bytes(bad_prec))


def test_odd_dimensions_and_block_multiples():
    """Edge-replication padding must not leak into the visible area:
    dims not multiples of 8 (and of 16 for 4:2:0) crop correctly."""
    rng = np.random.RandomState(3)
    for shape in ((8, 8), (7, 5), (9, 17), (16, 16), (23, 23)):
        px = rng.randint(0, 256, size=(*shape, 1), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert out.shape == (*shape, 1)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
    px = rng.randint(0, 256, size=(15, 13, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, subsampling="420"))
    assert out.shape == (15, 13, 3)


def test_restart_intervals_roundtrip():
    """DRI/RSTn: the decoder's restart resync (byte-align, marker
    sequence check, DC predictor reset) round-trips at several
    intervals in gray and subsampled color modes."""
    rng = np.random.RandomState(1)
    for ri in (1, 2, 3, 5):
        px = rng.randint(0, 256, size=(33, 41, 1), dtype=np.uint8)
        data = encode_jpeg(px, restart_interval=ri)
        assert b"\xff\xdd" in data                 # DRI present
        out = decode_jpeg(data)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
        px3 = rng.randint(0, 256, size=(20, 24, 3), dtype=np.uint8)
        out3 = decode_jpeg(encode_jpeg(px3, subsampling="420",
                                       restart_interval=ri))
        assert out3.shape == (20, 24, 3)
    # out-of-sequence restart marker is a classified error
    data = bytearray(encode_jpeg(
        np.full((24, 8, 1), 9, dtype=np.uint8), restart_interval=1))
    at = bytes(data).find(b"\xff\xd0")
    assert at > 0
    data[at + 1] = 0xD5                            # wrong RSTn
    with pytest.raises(CodecError):
        decode_jpeg(bytes(data))
