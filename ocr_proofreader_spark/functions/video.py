"""Pure-Python MJPEG-in-AVI video codec (stdlib struct + the baseline
JPEG codec in functions/jpeg.py).

Completes the REAL multimodal decode surface (task brief: image/audio/
video): with images (PNM/BMP/PNG/JPEG) and audio (WAV PCM) already
real, Motion-JPEG inside a RIFF/AVI container makes the VIDEO
frame-sampling stage real too — every frame is a baseline JPEG this
repo can already decode, and AVI is a chunk-walk like WAV.

Scope: 'RIFF AVI ' container, `avih` main header (frame period +
count), one video stream of '00dc'/'00db' frame chunks inside the
`movi` LIST; the optional idx1 index is ignored (frames are read in
stream order).  Anything else — other codecs, missing headers,
truncated chunks — raises classified :class:`CodecError` so the
decode stage's per-row poison isolation applies.
"""

from __future__ import annotations

import struct

import numpy as np

from ocr_proofreader_spark.functions.codecs import CodecError
from ocr_proofreader_spark.functions.jpeg import decode_jpeg, encode_jpeg


def encode_avi_mjpeg(frames: list[np.ndarray],
                     usec_per_frame: int = 40000) -> bytes:
    """Encode uint8 frames (each (h, w, 1|3)) as a minimal MJPEG AVI.
    All frames must share dimensions.  ``usec_per_frame`` 40000 =
    25 fps."""
    if not frames:
        raise CodecError("no frames to encode")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise CodecError("frames differ in dimensions")
    payloads = [encode_jpeg(f) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (cid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HHI", 0, 0, 0)
            + struct.pack("<IIIIIIII", 1, 1_000_000 // usec_per_frame
                          if usec_per_frame else 25,
                          0, len(frames), 0, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body_at = pos + 8
        if body_at + ln > len(data):
            raise CodecError(f"truncated AVI chunk {cid!r}")
        yield cid, body_at, ln
        pos = body_at + ln + (ln & 1)


def decode_avi_mjpeg(data: bytes) -> tuple[int, list[bytes]]:
    """Parse an MJPEG AVI -> (usec_per_frame, list of per-frame JPEG
    payloads).  Frames decode lazily via :func:`decode_jpeg` so a
    sampler can decode only the frames it needs."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise CodecError("not a RIFF/AVI payload")
    usec = None
    frames: list[bytes] = []
    for cid, at, ln in _walk_chunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        kind = data[at:at + 4]
        if kind == b"hdrl":
            for c2, a2, l2 in _walk_chunks(data, at + 4, at + ln):
                if c2 == b"avih":
                    if l2 < 4:
                        raise CodecError("truncated avih header")
                    usec = struct.unpack("<I", data[a2:a2 + 4])[0]
        elif kind == b"movi":
            for c2, a2, l2 in _walk_chunks(data, at + 4, at + ln):
                if c2 in (b"00dc", b"00db"):
                    frames.append(data[a2:a2 + l2])
    if usec is None:
        raise CodecError("missing avih header")
    if not frames:
        raise CodecError("no video frames in movi list")
    return usec, frames


def sample_frame_pixels(data: bytes, n_frames: int
                        ) -> list[tuple[int, int, np.ndarray]]:
    """Evenly sample ``n_frames`` frames -> [(frame_idx, t_offset_ms,
    pixels)].  Only the sampled frames are JPEG-decoded."""
    usec, frames = decode_avi_mjpeg(data)
    total = len(frames)
    take = min(n_frames, total)
    idxs = [i * total // take for i in range(take)]
    return [(i, i * usec // 1000, decode_jpeg(frames[i])) for i in idxs]
