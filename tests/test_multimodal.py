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


def _ppm(w, h, rows):
    """Binary P6 bytes: rows = list of h lists of w (r,g,b) tuples."""
    body = bytes(c for row in rows for px in row for c in px)
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + body


def _bmp24(w, h, rows):
    """24-bit bottom-up BI_RGB BMP bytes; rows top-down RGB tuples."""
    import struct
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in reversed(rows):                 # bottom-up storage
        line = bytes(c for (r, g, b) in row for c in (b, g, r))  # BGR
        raster += line + b"\x00" * (stride - len(line))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0,
                       14 + 40)
    return head + info + raster


def test_codecs_pure_python():
    import numpy as np
    from ocr_proofreader_spark.functions.codecs import (CodecError,
                                                        band_features,
                                                        decode_bmp,
                                                        decode_pnm,
                                                        sniff_and_decode)
    rows = [[(255, 255, 255)] * 3, [(0, 0, 0)] * 3]     # white over black
    px = decode_pnm(_ppm(3, 2, rows))
    assert px.shape == (2, 3, 3)
    assert px[0].min() == 255 and px[1].max() == 0
    bx = decode_bmp(_bmp24(3, 2, rows))
    assert (bx == px).all()                              # same image
    feats = band_features(px, dim=8)
    assert feats.tolist() == [1.0] * 4 + [0.0] * 4
    # PGM (single channel) and magic dispatch
    gray = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    gx = sniff_and_decode(gray)
    assert gx.shape == (2, 2, 1) and gx[1, 1, 0] == 40
    with pytest.raises(CodecError):
        sniff_and_decode(b"GIF89a....")
    with pytest.raises(CodecError):
        decode_pnm(_ppm(3, 2, rows)[:-5])                # truncated raster


def test_codecs_roundtrip_property():
    """Any pixel grid survives PPM and BMP encode->decode bit-exactly
    (hypothesis-generated dims and content)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_proofreader_spark.functions.codecs import decode_bmp, decode_pnm

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 9),
           seed=st.integers(0, 2**31 - 1))
    def check(w, h, seed):
        px = (np.random.RandomState(seed)
              .randint(0, 256, size=(h, w, 3), dtype=np.uint8))
        rows = [[tuple(int(c) for c in px[y, x]) for x in range(w)]
                for y in range(h)]
        assert (decode_pnm(_ppm(w, h, rows)) == px).all()
        assert (decode_bmp(_bmp24(w, h, rows)) == px).all()

    check()


def test_png_roundtrip_all_filters():
    """Every PNG scanline filter (None/Sub/Up/Average/Paeth) and every
    supported channel count (gray, gray+alpha, RGB, RGBA) round-trips
    bit-exactly through the stdlib-zlib codec."""
    import numpy as np

    from ocr_proofreader_spark.functions.codecs import (decode_png,
                                                        encode_png,
                                                        sniff_and_decode)
    rng = np.random.RandomState(42)
    for channels in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(7, 5, channels), dtype=np.uint8)
        for filt in range(5):
            data = encode_png(px, filter_type=filt)
            assert (decode_png(data) == px).all(), (channels, filt)
    # magic dispatch reaches the PNG leg
    px = rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert (sniff_and_decode(encode_png(px, 4)) == px).all()


def test_png_roundtrip_property():
    """Hypothesis sweep: any dims/content/filter round-trip bit-exactly
    (the Sub cumulative-sum and the sequential Average/Paeth unfilters
    must agree with the encoder's forward filters everywhere)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_proofreader_spark.functions.codecs import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 9), h=st.integers(1, 9),
           c=st.sampled_from([1, 3, 4]), filt=st.integers(0, 4),
           seed=st.integers(0, 2**31 - 1))
    def check(w, h, c, filt, seed):
        px = (np.random.RandomState(seed)
              .randint(0, 256, size=(h, w, c), dtype=np.uint8))
        assert (decode_png(encode_png(px, filt)) == px).all()

    check()


def test_png_poison_payloads():
    """Corrupt PNGs raise CodecError (never a stage-killing exception):
    bad magic, truncated chunk, flipped CRC, garbled IDAT, interlaced."""
    import numpy as np
    import pytest

    from ocr_proofreader_spark.functions.codecs import (CodecError,
                                                        decode_png,
                                                        encode_png)
    px = np.full((4, 3, 3), 7, dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(CodecError):
        decode_png(b"\x89PNX" + good[4:])          # bad magic
    with pytest.raises(CodecError):
        decode_png(good[:-20])                     # truncated
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF                            # IEND CRC flip
    with pytest.raises(CodecError):
        decode_png(bytes(corrupt))
    # interlace flag set (and IHDR CRC recomputed to isolate the check)
    import struct
    import zlib
    ihdr = bytearray(good[16:29])
    ihdr[12] = 1
    patched = (good[:8] + struct.pack(">I", 13) + b"IHDR" + bytes(ihdr)
               + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr))
                             & 0xFFFFFFFF) + good[33:])
    with pytest.raises(CodecError, match="interlaced"):
        decode_png(patched)


def test_synth_payload_mixes_codec_legs(spark, media):
    """The synthetic payload generator must exercise all THREE codec
    legs (md5 byte 3 mod 3: PNG / PPM / baseline JPEG), and the real
    decode stage produces identical (dims, features) regardless of
    encoding."""
    from ocr_proofreader_spark.operators.multimodal import (
        decode_media_bytes, synth_payload)
    withp = synth_payload(media)
    rows = withp.collect()
    magics = {bytes(r["payload"][:2]) for r in rows}
    assert {b"\x89P", b"P6", b"\xff\xd8"} <= magics   # all legs present
    decoded = decode_media_bytes(withp).collect()
    assert all(r["error"] is None for r in decoded)
    import hashlib
    for r in decoded:
        h = hashlib.md5(r["media_ref"].encode()).digest()
        assert r["width"] == 60 + h[0] % 20
        assert r["height"] == 80 + h[1] % 20
        assert all(abs(f - h[2] / 255.0) < 1e-6 for f in r["features"])


def test_decode_media_bytes_real_path(spark):
    """The REAL decode stage: payload bytes in -> dims + band features
    out, corrupt payloads isolated to error rows (a poison blob must
    not kill the stage)."""
    from ocr_proofreader_spark.operators.multimodal import decode_media_bytes
    rows = [[(255, 255, 255)] * 3, [(0, 0, 0)] * 3]
    data = [
        ("d1", "scan/d1/p0.ppm", 0, bytearray(_ppm(3, 2, rows))),
        ("d1", "scan/d1/p1.bmp", 1, bytearray(_bmp24(3, 2, rows))),
        ("d2", "scan/d2/p0.bin", 0, bytearray(b"not an image")),
        ("d2", "scan/d2/p1.png", 1, None),
        # right magic, garbled header: must isolate to an error row,
        # not kill the stage (raised ValueError pre-fix)
        ("d2", "scan/d2/p2.ppm", 2, bytearray(b"P6\nab cd 255\nxxxxxx")),
    ]
    media = spark.createDataFrame(
        data, "doc_id string, media_ref string, page int, payload binary")
    out = {r["media_ref"]: r
           for r in decode_media_bytes(media.repartition(3)).collect()}
    ok = [out["scan/d1/p0.ppm"], out["scan/d1/p1.bmp"]]
    assert all(r["width"] == 3 and r["height"] == 2 and r["error"] is None
               for r in ok)
    assert all(r["features"] == [1.0] * 4 + [0.0] * 4 for r in ok)
    bad = [out["scan/d2/p0.bin"], out["scan/d2/p1.png"],
           out["scan/d2/p2.ppm"]]
    assert all(r["width"] is None and r["error"] for r in bad)
    with pytest.raises(Exception):
        decode_media_bytes(media, on_error="fail").collect()


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
    # resize stays shuffle-free on top of decode: the only exchange
    # allowed is the r6 input-spread repartition under the derivation
    # (sources/interleaved.py), never one introduced by resize itself
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("REPARTITION_BY_NUM" in ln for ln in exchanges), plan


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


def test_wav_codec_roundtrip_and_poison():
    """RIFF/PCM parse: 8/16-bit mono/stereo round-trips within
    quantization, constant signals are exact, and corrupt payloads
    raise CodecError."""
    import numpy as np
    import pytest

    from ocr_proofreader_spark.functions.audio import (audio_band_features,
                                                       decode_wav,
                                                       encode_wav)
    from ocr_proofreader_spark.functions.codecs import CodecError
    rng = np.random.RandomState(0)
    for bits, ch in ((8, 1), (8, 2), (16, 1), (16, 2)):
        s = rng.uniform(-0.9, 0.9, size=(500, ch))
        rate, out = decode_wav(encode_wav(s, rate=16000, bits=bits))
        assert rate == 16000 and out.shape == (500, ch)
        tol = 1 / 128 if bits == 8 else 1 / 32768
        assert np.abs(out - s).max() <= tol
    # constant amplitude survives exactly (dyadic) and features equal it
    amp = (200 - 128) / 128.0
    rate, out = decode_wav(encode_wav(np.full((4096, 1), amp)))
    assert (out == amp).all()
    feats = audio_band_features(out)
    assert (feats == np.float32(amp)).all()
    # poison
    good = encode_wav(np.zeros((100, 1)))
    with pytest.raises(CodecError):
        decode_wav(b"RIFX" + good[4:])               # bad magic
    with pytest.raises(CodecError):
        decode_wav(good[:40])                        # truncated data
    nonpcm = bytearray(good)
    nonpcm[20] = 3                                   # IEEE float code
    with pytest.raises(CodecError, match="PCM"):
        decode_wav(bytes(nonpcm))


def test_decode_audio_bytes_stage(spark, media):
    """The audio decode stage: synth WAV payloads in, md5-derived
    metadata out, poison rows isolated."""
    import hashlib

    from ocr_proofreader_spark.operators.multimodal import (
        decode_audio_bytes, synth_audio_payload)
    withp = synth_audio_payload(media)
    out = decode_audio_bytes(withp).collect()
    assert out and all(r["error"] is None for r in out)
    for r in out:
        h = hashlib.md5(r["media_ref"].encode()).digest()
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == 4000 + h[1] * 16
        assert r["duration_ms"] == 1000 * r["n_samples"] // 8000
        amp = (h[2] - 128) / 128.0
        assert all(abs(f - amp) < 1e-7 for f in r["features"])
    # a poison payload must isolate, not kill the stage
    bad = spark.createDataFrame(
        [("d", "x.wav", 0, bytearray(b"not audio"))],
        "doc_id string, media_ref string, page int, payload binary")
    rows = decode_audio_bytes(bad).collect()
    assert rows[0]["error"] and rows[0]["sample_rate"] is None


def test_avi_mjpeg_codec_and_poison():
    """MJPEG-AVI: container round-trip, lazy frame sampling (only the
    sampled frames decode), and poison classification."""
    import numpy as np
    import pytest

    from ocr_proofreader_spark.functions.codecs import CodecError
    from ocr_proofreader_spark.functions.video import (decode_avi_mjpeg,
                                                       encode_avi_mjpeg,
                                                       sample_frame_pixels)
    frames = [np.full((16, 12, 1), 10 * i, dtype=np.uint8)
              for i in range(8)]
    data = encode_avi_mjpeg(frames, usec_per_frame=40000)
    usec, raw = decode_avi_mjpeg(data)
    assert usec == 40000 and len(raw) == 8
    samp = sample_frame_pixels(data, 4)
    assert [s[0] for s in samp] == [0, 2, 4, 6]       # even spacing
    assert [s[1] for s in samp] == [0, 80, 160, 240]  # 25 fps ms offsets
    for idx, _t, px in samp:
        assert (px == 10 * idx).all()                 # solid = exact
    with pytest.raises(CodecError):
        decode_avi_mjpeg(b"RIFF\x10\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(CodecError):
        decode_avi_mjpeg(data[:60])                    # truncated
    # movi list present but no header
    with pytest.raises(CodecError):
        decode_avi_mjpeg(b"RIFF\x0c\x00\x00\x00AVI LIST\x04\x00\x00\x00movi")


def test_sample_frames_real_stage(spark, media):
    """The real video sampling stage: AVI payloads in, md5-derived
    frame rows out (1->N expansion), poison rows isolated."""
    import hashlib

    from ocr_proofreader_spark.operators.multimodal import (
        sample_frames_real, synth_video_payload)
    withp = synth_video_payload(media)
    out = sample_frames_real(withp).collect()
    assert out and all(r["error"] is None for r in out)
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rows in by_ref.items():
        h = hashlib.md5(ref.encode()).digest()
        total = 6 + h[4] % 6
        assert len(rows) == 4                       # 1->4 expansion
        for r in sorted(rows, key=lambda x: x["frame_idx"]):
            assert r["width"] == 12 and r["height"] == 16
            assert r["t_offset_ms"] == r["frame_idx"] * 40
            v = (h[2] + 17 * r["frame_idx"]) % 256
            assert all(abs(f - v / 255.0) < 1e-6 for f in r["features"])
        assert {r["frame_idx"] for r in rows} == {
            i * total // 4 for i in range(4)}
    bad = spark.createDataFrame(
        [("d", "x.avi", 0, bytearray(b"junk"))],
        "doc_id string, media_ref string, page int, payload binary")
    rows = sample_frames_real(bad).collect()
    assert len(rows) == 1 and rows[0]["error"]


def test_gif_codec_roundtrip_and_poison():
    """GIF with REAL LZW both ways: gray and palettized-RGB round-trips
    are bit-exact (lossless format), dictionary growth / width
    escalation / 4096 reset all exercised, corrupt payloads classified."""
    import numpy as np
    import pytest

    from ocr_proofreader_spark.functions.codecs import (CodecError,
                                                        sniff_and_decode)
    from ocr_proofreader_spark.functions.gif import decode_gif, encode_gif
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(40, 50, 1), dtype=np.uint8)
    out = decode_gif(encode_gif(px))
    assert out.shape == (40, 50, 3)
    assert (out == px).all()                       # gray palette r=g=b
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   dtype=np.uint8)
    rgb = pal[rng.randint(0, 4, size=(30, 30))]
    assert (decode_gif(encode_gif(rgb)) == rgb).all()
    # long repetitive run crosses the 4096-entry dictionary reset
    rep = np.tile(np.arange(16, dtype=np.uint8), 4000).reshape(250, 256, 1)
    assert (decode_gif(encode_gif(rep))[:, :, 0] == rep[:, :, 0]).all()
    # magic dispatch
    solid = np.full((7, 9, 1), 42, dtype=np.uint8)
    assert (sniff_and_decode(encode_gif(solid)) == 42).all()
    # poison: bad magic / truncated stream / >256 colors / interlace bit
    good = encode_gif(solid)
    with pytest.raises(CodecError):
        decode_gif(b"GIF88a" + good[6:])
    with pytest.raises(CodecError):
        decode_gif(good[:len(good) // 2])
    grad = np.arange(300, dtype=np.int32) % 257
    many = np.stack([grad % 256, grad // 2 % 256, grad // 3 % 256],
                    axis=1).astype(np.uint8).reshape(10, 30, 3)
    # craft an interlaced flag on a valid file; the image descriptor
    # sits at a FIXED offset (6 header + 7 LSD + 768 GCT) — searching
    # for 0x2C would hit palette entry 44
    bad = bytearray(good)
    desc = 6 + 7 + 768
    assert bad[desc] == 0x2C
    bad[desc + 9] |= 0x40
    with pytest.raises(CodecError, match="interlaced"):
        decode_gif(bytes(bad))


def test_poison_isolation_advice_cases(spark):
    """Round-4 advisor escapes: (a) a WAV declaring sample_rate=0 parses
    but must classify as a per-row codec error, not a stage-killing
    ZeroDivisionError; (b) a JPEG segment whose declared length passes
    the ln-2 check but underfeeds struct.unpack (SOF0 with ln=5) must
    isolate via the widened catch tuple."""
    import struct

    import numpy as np
    import pytest

    from ocr_proofreader_spark.functions.audio import decode_wav, encode_wav
    from ocr_proofreader_spark.functions.codecs import CodecError
    from ocr_proofreader_spark.operators.multimodal import (
        decode_audio_bytes, decode_media_bytes)

    # (a) rate=0 WAV: patch the fmt chunk's sample-rate field in place
    good = bytearray(encode_wav(np.zeros((100, 1))))
    struct.pack_into("<I", good, 24, 0)          # fmt sample_rate := 0
    with pytest.raises(CodecError, match="rate"):
        decode_wav(bytes(good))
    bad_wav = spark.createDataFrame(
        [("d", "z.wav", 0, bytes(good))],
        "doc_id string, media_ref string, page int, payload binary")
    rows = decode_audio_bytes(bad_wav).collect()
    assert rows[0]["error"] and rows[0]["sample_rate"] is None

    # (b) truncated-SOF0 JPEG: SOI + SOF0 declaring ln=5 (passes ln>=2,
    # struct.unpack('>HH', seg[1:5]) then sees only 2 bytes)
    evil = b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 5) + b"\x08\x00"
    bad_img = spark.createDataFrame(
        [("d", "z.jpg", 0, evil)],
        "doc_id string, media_ref string, page int, payload binary")
    rows = decode_media_bytes(bad_img).collect()
    assert rows[0]["error"] is not None and rows[0]["width"] is None


def test_simhash_near_dup_band_overflow(spark):
    """bits=16 / max_hamming=3 used to produce a 5th band shifted past
    the fingerprint (constant 0 -> one bucket holding every doc).  The
    banding must stay within the fingerprint, keep >= max_hamming+1
    bands (pigeonhole losslessness), and agree with the quadratic
    exact join."""
    import pytest

    from ocr_proofreader_spark.operators import training_ops as ops
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}{'x' if (i + j) % 7 == 0 else ''}"
                      for j in range(12)))
         for i in range(30)], "doc_id long, text string")
    got = {(r["d1"], r["d2"], r["hamming"])
           for r in ops.simhash_near_dup(docs, bits=16,
                                         max_hamming=3).collect()}
    # quadratic oracle on the same fingerprints
    from pyspark.sql import functions as F
    sh = ops.simhash_wide(docs, 16)
    a = sh.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"))
    exact = {(r["d1"], r["d2"], r["hamming"]) for r in
             (a.crossJoin(b).filter(F.col("d1") < F.col("d2"))
              .select("d1", "d2",
                      F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
                      .cast("long").alias("hamming"))
              .filter(F.col("hamming") <= 3)).collect()}
    assert got == exact
    # unsupportable combos must refuse rather than silently go O(n^2)
    with pytest.raises(ValueError):
        ops.simhash_near_dup(docs, bits=4, max_hamming=4)
