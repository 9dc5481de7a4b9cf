"""Pure-Python GIF codec (stdlib + numpy): real LZW both directions.

Rounds out the image formats a web corpus actually contains (JPEG,
PNG, GIF make up essentially all of it): GIF87a/89a container, global
and local color tables, full variable-width LZW decompression with
dictionary rebuilding (9->12 bits, clear/end codes, LSB-first bit
packing, 255-byte sub-blocks), first frame of animated files,
extension blocks skipped.  Interlaced images raise classified
:class:`CodecError` (like progressive JPEG — out of scope, never
stage-killing).

The encoder performs REAL LZW compression (dictionary growth, width
escalation, reset at 4096) so round-trip tests exercise the decoder's
dictionary handling; GIF is lossless, so all round-trips are
bit-exact — including the solid-gray synthetic corpus payloads, which
keeps the DuckDB twin format-blind when GIF joins the
``synth_payload`` rotation.
"""

from __future__ import annotations

import struct

import numpy as np

from ocr_proofreader_spark.functions.codecs import CodecError


class _LsbBitWriter:
    """LSB-first bit packer (GIF's bit order — opposite of JPEG's)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    w = _LsbBitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    w.write(clear, width)
    cur = b""
    for px in indices.tolist():
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([px])
    if cur:
        w.write(table[cur], width)
    w.write(end, width)
    return w.flush()


def _lzw_decompress(data: bytes, min_code_size: int,
                    n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise CodecError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise CodecError("bad first GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]          # the KwKwK special case
            table.append(entry)
        else:
            raise CodecError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise CodecError("GIF pixel data short of image size")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 1|3) as a single-frame GIF89a.  Color
    images must use at most 256 distinct colors (GIF is palettized —
    that IS the format); gray input maps onto the identity gray
    palette."""
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3):
        raise CodecError(f"unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[:2]
    if pixels.shape[2] == 1:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        indices = pixels[:, :, 0].reshape(-1)
    else:
        flat = pixels.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise CodecError(f"{len(colors)} colors exceed GIF's 256")
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[:len(colors)] = colors
        indices = inverse.astype(np.uint8)
    min_code_size = 8
    lzw = _lzw_compress(indices, min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])               # GCT present, 256 entries
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"                       # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF -> uint8 RGB (h, w, 3)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF payload")
    if len(data) < 13:
        raise CodecError("truncated GIF header")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = data[pos:pos + 3 * n]
        if len(raw) < 3 * n:
            raise CodecError("truncated global color table")
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                        # trailer
            break
        if b == 0x21:                        # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise CodecError(f"unexpected GIF block 0x{b:02X}")
        if pos + 10 > len(data):
            raise CodecError("truncated image descriptor")
        _x, _y, w, h = struct.unpack("<HHHH", data[pos + 1:pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise CodecError("interlaced GIF unsupported")
        ct = gct
        if ipacked & 0x80:                   # local color table
            n = 2 << (ipacked & 0x07)
            raw = data[pos:pos + 3 * n]
            if len(raw) < 3 * n:
                raise CodecError("truncated local color table")
            ct = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise CodecError("GIF image with no color table")
        if pos >= len(data):
            raise CodecError("truncated GIF image data")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise CodecError(f"bad GIF LZW code size {min_code_size}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            block = data[pos + 1:pos + 1 + ln]
            if len(block) < ln:
                raise CodecError("truncated GIF data sub-block")
            lzw += block
            pos += 1 + ln
        if w == 0 or h == 0:
            raise CodecError(f"bad GIF dimensions {w}x{h}")
        idx = _lzw_decompress(bytes(lzw), min_code_size, w * h)
        if idx.max(initial=0) >= len(ct):
            raise CodecError("GIF pixel index outside color table")
        return ct[idx].reshape(h, w, 3)
    raise CodecError("GIF contains no image frame")
