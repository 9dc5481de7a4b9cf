"""Pure-Python WAV/PCM audio codec (stdlib struct + numpy).

Extends the REAL multimodal decode surface past images (task brief:
image/audio/video as opaque binary + typed metadata): RIFF/WAVE
container parsing, PCM 8-bit unsigned / 16-bit signed little-endian,
mono or stereo, chunk-walking tolerant of extra chunks (LIST, fact...).
Compressed codecs (MP3/AAC/etc.) have no pure-Python decoder here and
raise classified :class:`CodecError` so the decode stage's per-row
poison isolation applies.

Everything is integer parsing plus fixed-order float64 band means, so
decoding is bit-deterministic — and for CONSTANT signals the band
features are exactly representable (dyadic amplitude, exact integer
sum, one exact division), which is what lets the synthetic driver
corpus route an audio leg through a bit-exact DuckDB twin the same way
the solid-color image legs do.
"""

from __future__ import annotations

import struct

import numpy as np

from ocr_proofreader_spark.functions.codecs import CodecError


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE payload -> (sample_rate, samples) where
    ``samples`` is float64 (n, channels) normalized to [-1, 1)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise CodecError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < ln:
                raise CodecError("truncated data chunk")
            raw = body
            break                                # fmt must precede data
        pos += 8 + ln + (ln & 1)                 # chunks are word-aligned
    if fmt is None or raw is None:
        raise CodecError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1:
        raise CodecError(f"unsupported WAV format code {audio_format} "
                         f"(PCM only)")
    if channels not in (1, 2):
        raise CodecError(f"unsupported channel count {channels}")
    if rate == 0:
        # downstream duration math divides by rate; a parseable header
        # declaring 0 Hz must be a classified per-row codec error, not
        # a ZeroDivisionError escaping the stage's poison isolation
        raise CodecError("invalid WAV sample rate 0")
    if bits == 8:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif bits == 16:
        n = len(raw) // 2
        s = (np.frombuffer(raw, dtype="<i2", count=n).astype(np.float64)
             / 32768.0)
    else:
        raise CodecError(f"unsupported bit depth {bits}")
    if channels == 2:
        s = s[:(len(s) // 2) * 2].reshape(-1, 2)
    else:
        s = s.reshape(-1, 1)
    if len(s) == 0:
        raise CodecError("empty WAV data chunk")
    return rate, s


def encode_wav(samples: np.ndarray, rate: int = 8000,
               bits: int = 8) -> bytes:
    """Encode (n, channels) float64 samples in [-1, 1) as PCM WAV."""
    if samples.ndim != 2 or samples.shape[1] not in (1, 2):
        raise CodecError(f"unsupported sample shape {samples.shape}")
    ch = samples.shape[1]
    flat = samples.reshape(-1)
    if bits == 8:
        raw = np.clip(np.round(flat * 128.0 + 128.0), 0,
                      255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.clip(np.round(flat * 32768.0), -32768,
                      32767).astype("<i2").tobytes()
    else:
        raise CodecError(f"unsupported bit depth {bits}")
    align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * align, align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(raw)) + raw
              + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_band_features(samples: np.ndarray, dim: int = 8) -> np.ndarray:
    """Mean amplitude of ``dim`` temporal bands (channel-averaged),
    float32 — the audio twin of codecs.band_features.  For a constant
    signal every band mean equals the (dyadic) amplitude exactly:
    integer-count sums of one dyadic value divide back out exactly in
    float64, so the float32 narrowing is the only rounding step —
    matching the SQL oracle's CAST(x AS FLOAT)."""
    mono = samples.mean(axis=1)
    n = len(mono)
    edges = np.linspace(0, n, dim + 1).astype(int)
    feats = np.array(
        [mono[edges[i]:max(edges[i + 1], edges[i] + 1)].mean()
         for i in range(dim)], dtype=np.float64)
    return feats.astype(np.float32)
