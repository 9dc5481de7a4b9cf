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
without ever seeing the PDF bytes.  Genuinely unsupported filters
(DCTDecode, LZW, ...) still raise :class:`PdfError` — a production
build swaps in a full parser behind the same function signature.
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    """Unparseable or unsupported PDF payload."""


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


def _decode_stream(d: bytes, body: bytes) -> bytes:
    """Apply the stream dictionary's filter chain.  Raw and
    /FlateDecode (stdlib zlib) are supported; anything else raises."""
    fm = _FILTER_RE.search(d)
    if not fm:
        return body
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
    for name in names:
        if name == b"FlateDecode":
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise PdfError(f"bad FlateDecode stream: {e}")
        else:
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
