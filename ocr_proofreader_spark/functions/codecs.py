"""Pure-Python image codecs for the multimodal decode stage.

The container has no image libraries, but two classic formats are
header-parseable with nothing beyond the stdlib + numpy:

* **PPM/PGM (P6/P5 binary)** — the netpbm formats every scanner
  toolchain can emit;
* **BMP (24-bit uncompressed BI_RGB)** — the simplest Windows bitmap.

That is enough to make the decode stage REAL end-to-end: payload bytes
in, pixel dimensions + features out, with the deterministic md5 fake
(`decode_media(fake_decode=True)`) kept only for refs that carry no
payload.  A production deployment swaps :func:`sniff_and_decode` for a
full decoder (Pillow/ffmpeg) without touching the Spark plumbing — the
UDF signature, schema and batch shape are identical.
"""

from __future__ import annotations

import numpy as np


class CodecError(ValueError):
    """Unparseable or unsupported image payload."""


def _pnm_tokens(data: bytes, n: int, start: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens after ``start``,
    skipping ``#`` comments; returns (tokens, offset past last token's
    trailing whitespace byte) per the netpbm spec (single whitespace
    char separates the header from raster data)."""
    toks: list[bytes] = []
    i = start
    while len(toks) < n:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if i < len(data) and data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise CodecError("truncated PNM header")
        toks.append(data[i:j])
        i = j
    return toks, i + 1  # consume exactly ONE whitespace after the last token


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) -> uint8 array (h, w, channels)."""
    if data[:2] not in (b"P5", b"P6"):
        raise CodecError("not a binary PGM/PPM payload")
    channels = 3 if data[:2] == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(data, 3, 2)
    try:
        width, height, mx = int(w), int(h), int(maxval)
    except ValueError:
        raise CodecError(
            f"non-numeric PNM header tokens {w!r} {h!r} {maxval!r}")
    if width <= 0 or height <= 0:
        raise CodecError(f"bad PNM dimensions {width}x{height}")
    if mx != 255:
        raise CodecError(f"only maxval=255 supported, got {mx}")
    need = width * height * channels
    raster = data[off:off + need]
    if len(raster) < need:
        raise CodecError("truncated PNM raster")
    return (np.frombuffer(raster, dtype=np.uint8)
            .reshape(height, width, channels))


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode 24-bit uncompressed (BI_RGB) BMP -> uint8 array (h, w, 3)
    in RGB order, top-down."""
    if data[:2] != b"BM" or len(data) < 54:
        raise CodecError("not a BMP payload")
    pix_off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise CodecError(f"unsupported BMP header size {hdr_size}")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise CodecError(f"only 24-bit BI_RGB supported "
                         f"(bpp={bpp}, compression={compression})")
    if width <= 0 or height == 0:
        raise CodecError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3          # rows padded to 4 bytes
    need = stride * height
    raster = data[pix_off:pix_off + need]
    if len(raster) < need:
        raise CodecError("truncated BMP raster")
    rows = (np.frombuffer(raster, dtype=np.uint8)
            .reshape(height, stride)[:, :width * 3]
            .reshape(height, width, 3))
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()         # BGR -> RGB


def sniff_and_decode(data: bytes) -> np.ndarray:
    """Magic-byte dispatch -> uint8 pixel array (h, w, channels)."""
    if not data:
        raise CodecError("empty payload")
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise CodecError(f"unknown image magic {data[:2]!r}")


def band_features(pixels: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic feature vector: mean grayscale of ``dim`` horizontal
    bands, scaled to [0, 1] float32 — the same shape/dtype the fake
    decoder emits, so downstream schemas are identical.  float64
    accumulation, then one narrowing round (matches the fake path's
    double-then-float discipline)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h = gray.shape[0]
    edges = np.linspace(0, h, dim + 1).astype(int)
    feats = np.array([gray[edges[i]:max(edges[i + 1], edges[i] + 1)].mean()
                      for i in range(dim)], dtype=np.float64)
    return (feats / 255.0).astype(np.float32)
