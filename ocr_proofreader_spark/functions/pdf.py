"""Minimal pure-Python PDF text layer (north_rule: "PDF/layout parse").

No PDF library exists in this container, but the format's text layer is
parseable with the stdlib for the class of documents a layout pipeline
meets in practice: content streams with ``Tj`` text-show operators,
stored raw or ``/FlateDecode``-compressed (zlib is stdlib; Flate covers
nearly all real-world PDFs).  ``synth_pdf`` writes a real single-page
PDF (header, objects, xref, trailer — openable by any viewer) with one
``Td``/``Tj`` pair per text line, optionally Flate-compressed;
``extract_pdf_text`` inflates Flate streams and parses the text
operators back to lines.  Together they make the Spark-side PDF
plumbing (payload -> parse -> text) verifiable end-to-end: the
roundtrip must be lossless, which the DuckDB twin checks as md5(text)
without ever seeing the PDF bytes.

Image XObjects are first-class too (the reference's core domain is
scanned books, where the page IS an image): ``/DCTDecode`` routes to
the repo's own baseline-JPEG decoder (functions/jpeg.py),
``/LZWDecode`` to the PDF-flavor LZW codec below (MSB-first bit order
with EarlyChange — the OPPOSITE bit order of the GIF LZW in
functions/gif.py, hence a separate implementation), and
``/FlateDecode`` to stdlib zlib.  ``synth_pdf`` can embed a real
image XObject behind any of the three filters; ``extract_pdf_images``
parses them back to pixel arrays.  Genuinely unsupported filters
(CCITTFax, JBIG2, ...) still raise :class:`PdfError` — a production
build swaps in a full parser behind the same function signature.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np


class PdfError(ValueError):
    """Unparseable or unsupported PDF payload."""


# ---------------------------------------------------------------------------
# PDF/TIFF-flavor LZW (ISO 32000-1 section 7.4.4): 8-bit symbols,
# clear=256 / EOD=257, code widths 9->12 MSB-first, and EarlyChange
# (default 1) bumping the width ONE CODE EARLY.  GIF's LZW
# (functions/gif.py) is LSB-first without EarlyChange — sharing code
# would tangle two incompatible bit orders, so this is a sibling, not
# a reuse; the spec's worked example is pinned as a test vector.

_LZW_CLEAR, _LZW_EOD = 256, 257


def lzw_decode_pdf(data: bytes, early_change: int = 1) -> bytes:
    """Decompress a PDF ``/LZWDecode`` stream."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    bitbuf = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                if prev is None and nbits == 0:
                    return bytes(out)
                raise PdfError("truncated LZW stream (no EOD)")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_CLEAR:
            table = table[:258]
            width, prev = 9, None
            continue
        if code == _LZW_EOD:
            return bytes(out)
        if code < len(table) and code not in (_LZW_CLEAR, _LZW_EOD):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK corner
        else:
            raise PdfError(f"bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # EarlyChange=1: the width grows when the NEXT entry to be
        # added would be 2^width - 1, one code before it must
        if len(table) >= (1 << width) - early_change and width < 12:
            width += 1


def lzw_encode_pdf(data: bytes, early_change: int = 1) -> bytes:
    """Compress bytes as a PDF ``/LZWDecode`` stream (MSB-first)."""
    chunks: list[int] = []      # (code, width) pairs packed below
    widths: list[int] = []

    def emit(code: int, width: int) -> None:
        chunks.append(code)
        widths.append(width)

    width = 9
    emit(_LZW_CLEAR, width)
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # alignment: after the k-th data code the decoder's table holds
        # 257 + k entries (its first code appends nothing) and bumps
        # when that reaches 2^w - EC; the encoder's next_code is then
        # 258 + k — one ahead — so it bumps at 2^w - EC + 1, keeping
        # every emitted code at the decoder's read width
        if next_code >= (1 << width) - early_change + 1:
            if width < 12:
                width += 1
            else:
                emit(_LZW_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(_LZW_EOD, width)
    bitbuf = nbits = 0
    out = bytearray()
    for code, w in zip(chunks, widths):
        bitbuf = (bitbuf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


_ESC = {0x5C: b"\\\\", 0x28: b"\\(", 0x29: b"\\)",
        0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t"}
_UNESC = {"\\": "\\", "(": "(", ")": ")", "n": "\n", "r": "\r",
          "t": "\t", "b": "\b", "f": "\f"}


def _escape(s: str) -> bytes:
    # PDF literal strings are BYTE strings: UTF-8 encode first so any
    # Unicode text round-trips losslessly (extraction decodes UTF-8)
    return b"".join(_ESC.get(b, bytes([b])) for b in s.encode("utf-8"))


def synth_pdf(text: str, compress: bool = False) -> bytes:
    """A complete single-page PDF whose text layer holds ``text``, one
    Td/Tj pair per line; ``compress=True`` Flate-compresses the content
    stream (the layout of virtually every real-world PDF)."""
    lines = text.split("\n")
    ops = [b"BT", b"/F1 12 Tf", b"72 760 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _escape(line) + b") Tj")
    ops.append(b"ET")
    stream = b"\n".join(ops)
    filt = b""
    if compress:
        stream = zlib.compress(stream, 6)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + filt
        + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs)+1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


_STREAM_START_RE = re.compile(rb"stream(\r\n|\n)")
# possessive \d++ so the lookahead cannot be defeated by backtracking:
# with greedy \d+, an indirect '/Length 123 0 R' would match '12' (the
# engine gives back digits until the lookahead passes) and mis-frame
# the stream body
_LENGTH_RE = re.compile(rb"/Length\s+(\d++)(?!\s+\d+\s+R)")
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _stream_objects(data: bytes):
    """Yield ``(dict_bytes, body_bytes)`` per stream object.  The
    governing dictionary sits between the preceding ``obj`` keyword and
    the ``stream`` keyword; the body honors a direct ``/Length`` when
    the dictionary carries one (compressed bytes may contain
    ``endstream`` by chance), else falls back to the
    ``endstream``-delimited slice with one trailing EOL stripped."""
    pos = 0
    while True:
        m = _STREAM_START_RE.search(data, pos)
        if not m:
            return
        obj_at = data.rfind(b"obj", 0, m.start())
        d = data[max(obj_at, 0):m.start()]
        body_at = m.end()
        lm = _LENGTH_RE.search(d)
        # an inaccurate direct /Length (real-world PDFs have them) must
        # not silently mis-frame the body: honor it only when the slice
        # it frames is actually followed by 'endstream' (after at most
        # one EOL); otherwise fall through to the delimiter scan
        if lm:
            end = body_at + int(lm.group(1))
            tail = data[end:end + 11]
            ok = (tail.startswith(b"endstream")
                  or tail.startswith(b"\nendstream")
                  or tail.startswith(b"\r\nendstream")
                  or tail.startswith(b"\rendstream"))
            if not ok:
                lm = None
        if lm:
            body = data[body_at:end]
            nxt = data.find(b"endstream", end)
            pos = nxt + 9 if nxt >= 0 else end
        else:
            em = data.find(b"endstream", body_at)
            if em < 0:
                raise PdfError("unterminated stream")
            body = data[body_at:em]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
            pos = em + 9
        yield d, body


_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")


def _apply_byte_filter(name: bytes, d: bytes, body: bytes) -> bytes:
    """One byte-stream filter step, shared by the text and image
    extractors (a single home so /EarlyChange parsing and error
    classification cannot drift between the two paths).  Raises
    KeyError for filters that are not byte-to-byte (DCTDecode) so
    callers dispatch those themselves."""
    if name == b"FlateDecode":
        try:
            return zlib.decompress(body)
        except zlib.error as e:
            raise PdfError(f"bad FlateDecode stream: {e}")
    if name == b"LZWDecode":
        em = _EARLY_RE.search(d)
        return lzw_decode_pdf(body, int(em.group(1)) if em else 1)
    raise KeyError(name)


def _decode_stream(d: bytes, body: bytes) -> bytes:
    """Apply the stream dictionary's filter chain.  Raw, /FlateDecode
    (stdlib zlib) and /LZWDecode (the PDF-flavor codec above, honoring
    /EarlyChange) are supported; image-terminal filters (/DCTDecode)
    belong to :func:`extract_pdf_images` and anything else raises."""
    fm = _FILTER_RE.search(d)
    if not fm:
        return body
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    for name in names:
        try:
            body = _apply_byte_filter(name, d, body)
        except KeyError:
            raise PdfError(f"unsupported stream filter "
                           f"/{name.decode('latin-1')}; plug a full PDF "
                           f"library into the same extract signature")
    return body


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """PDF literal string starting at the '(' at ``i`` -> (raw bytes,
    end offset).  Bytes, not text: string content is decoded (UTF-8)
    only after unescaping."""
    assert data[i:i + 1] == b"("
    depth, out, i = 1, bytearray(), i + 1
    while i < len(data) and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2].decode("latin-1")
            if not nxt:       # backslash is the final byte: truncated
                raise PdfError("unterminated PDF string")
            if nxt in "01234567":                   # octal escape
                j = i + 1
                while j < i + 4 and data[j:j + 1] in b"01234567":
                    j += 1
                # PDF spec: high-order overflow of a 3-digit octal
                # (e.g. \777) is ignored — mask, don't raise
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in "\n\r":
                # spec: backslash-EOL is a line continuation — both the
                # backslash and the EOL (incl. \r\n) emit nothing
                i += 2
                if nxt == "\r" and data[i:i + 1] == b"\n":
                    i += 1
                continue
            # spec: backslash before a non-escape char (incl. \8, \9)
            # is dropped, the char kept
            out += _UNESC.get(nxt, nxt).encode("latin-1")
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                return bytes(out), i + 1
        out += c
        i += 1
    raise PdfError("unterminated PDF string")


def extract_pdf_text(data: bytes) -> str:
    """Text lines of every content stream (raw or Flate-compressed), in
    layout order (one output line per Td/Tj pair)."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF payload")
    lines: list[str] = []
    for d, body in _stream_objects(data):
        if _IMAGE_RE.search(d):      # image XObjects have no text layer
            continue
        body = _decode_stream(d, body)
        i = 0
        while True:
            p = body.find(b"(", i)
            if p < 0:
                break
            raw, end = _parse_string(body, p)
            rest = body[end:end + 8].lstrip()
            if rest.startswith(b"Tj"):
                try:
                    lines.append(raw.decode("utf-8"))
                except UnicodeDecodeError as e:
                    raise PdfError(f"non-UTF-8 text string: {e}")
            i = end
    if not lines:
        raise PdfError("no text operators found")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# image XObjects (north_rule: scanned-book pages ARE images; a PDF
# parser that only reads the text layer misses the reference's core
# input class)

_IMAGE_RE = re.compile(rb"/Subtype\s*/Image")
_NUM_KEY = {b"Width": re.compile(rb"/Width\s+(\d+)"),
            b"Height": re.compile(rb"/Height\s+(\d+)"),
            b"Bits": re.compile(rb"/BitsPerComponent\s+(\d+)")}
_CS_RE = re.compile(rb"/ColorSpace\s*/(Device(?:Gray|RGB))")


def _int_key(d: bytes, key: bytes) -> int:
    m = _NUM_KEY[key].search(d)
    if not m:
        raise PdfError(f"image XObject missing /{key.decode()}")
    return int(m.group(1))


def extract_pdf_images(data: bytes) -> list[np.ndarray]:
    """Pixel arrays (h, w, 1|3 uint8) of every image XObject, in
    document order.  ``/DCTDecode`` streams route to the repo's own
    baseline-JPEG decoder; ``/FlateDecode`` / ``/LZWDecode`` streams
    decompress to raw 8-bit DeviceGray/DeviceRGB samples shaped by the
    XObject's /Width /Height /ColorSpace."""
    from ocr_proofreader_spark.functions.codecs import CodecError
    from ocr_proofreader_spark.functions.jpeg import decode_jpeg
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF payload")
    out: list[np.ndarray] = []
    for d, body in _stream_objects(data):
        if not _IMAGE_RE.search(d):
            continue
        fm = _FILTER_RE.search(d)
        names = (re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
                 if fm else [])
        px = None
        for i, name in enumerate(names):
            if name == b"DCTDecode":
                if i != len(names) - 1:
                    raise PdfError("/DCTDecode must be the final filter")
                try:
                    px = decode_jpeg(body)
                # struct/Index/ZeroDivision too: malformed segments can
                # slip past the codec's length guards (a SOF0 declaring
                # ln=5 underfeeds struct.unpack) — every corrupt-stream
                # failure must classify as PdfError so row-isolation
                # wrappers upstream see one exception family
                except (CodecError, ValueError, struct.error,
                        IndexError, ZeroDivisionError) as e:
                    raise PdfError(f"bad DCTDecode stream: {e}")
            else:
                try:
                    body = _apply_byte_filter(name, d, body)
                except KeyError:
                    raise PdfError(f"unsupported image filter "
                                   f"/{name.decode('latin-1')}")
        if px is None:                       # raw samples after filters
            w, h = _int_key(d, b"Width"), _int_key(d, b"Height")
            bits = _int_key(d, b"Bits")
            if bits != 8:
                raise PdfError(f"unsupported /BitsPerComponent {bits}")
            cm = _CS_RE.search(d)
            if not cm:
                raise PdfError("unsupported or missing /ColorSpace")
            nc = 1 if cm.group(1) == b"DeviceGray" else 3
            if len(body) < h * w * nc:
                raise PdfError("image stream shorter than "
                               "Width*Height*components")
            px = (np.frombuffer(body[:h * w * nc], dtype=np.uint8)
                  .reshape(h, w, nc))
        out.append(px)
    return out


def synth_pdf_with_image(text: str, pixels: np.ndarray,
                         image_filter: str = "DCTDecode",
                         compress_text: bool = False) -> bytes:
    """A complete single-page PDF carrying BOTH a text layer (same
    Td/Tj layout as :func:`synth_pdf`) and one image XObject drawn via
    a ``cm``/``Do`` pair — the shape of a scanned-book page with an
    OCR text layer.  ``image_filter``: DCTDecode (repo JPEG encoder —
    pass solid-color pixels for exact roundtrips), FlateDecode or
    LZWDecode (both lossless raw-sample streams)."""
    from ocr_proofreader_spark.functions.jpeg import encode_jpeg
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3):
        raise PdfError(f"unsupported pixel shape {pixels.shape}")
    h, w, nc = pixels.shape
    cs = b"/DeviceGray" if nc == 1 else b"/DeviceRGB"
    raw = pixels.astype(np.uint8).tobytes()
    if image_filter == "DCTDecode":
        img = encode_jpeg(pixels.astype(np.uint8))
    elif image_filter == "FlateDecode":
        img = zlib.compress(raw, 6)
    elif image_filter == "LZWDecode":
        img = lzw_encode_pdf(raw)
    else:
        raise PdfError(f"unsupported image_filter {image_filter}")

    lines = text.split("\n")
    ops = [b"q", f"{w * 4} 0 0 {h * 4} 72 {760 - h * 4 - 20} cm"
           .encode(), b"/Im1 Do", b"Q",
           b"BT", b"/F1 12 Tf", b"72 760 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _escape(line) + b") Tj")
    ops.append(b"ET")
    stream = b"\n".join(ops)
    filt = b""
    if compress_text:
        stream = zlib.compress(stream, 6)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> "
        b"/XObject << /Im1 6 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + filt
        + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /XObject /Subtype /Image /Width "
        + str(w).encode() + b" /Height " + str(h).encode()
        + b" /ColorSpace " + cs + b" /BitsPerComponent 8 /Filter /"
        + image_filter.encode() + b" /Length " + str(len(img)).encode()
        + b" >>\nstream\n" + img + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs)+1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
