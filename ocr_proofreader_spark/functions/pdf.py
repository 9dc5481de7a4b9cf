"""Minimal pure-Python PDF text layer (north_rule: "PDF/layout parse").

No PDF library exists in this container, but the format's text layer is
parseable with the stdlib for the class of documents a layout pipeline
actually controls: uncompressed content streams with ``Tj`` text-show
operators.  ``synth_pdf`` writes a real single-page PDF (header, objects,
xref, trailer — openable by any viewer) with one ``Td``/``Tj`` pair per
text line; ``extract_pdf_text`` parses any PDF's uncompressed streams
back to lines.  Together they make the Spark-side PDF plumbing
(payload -> parse -> text) verifiable end-to-end: the roundtrip must be
lossless, which the DuckDB twin checks as md5(text) without ever seeing
the PDF bytes.  Compressed (FlateDecode) streams are out of scope here
and raise :class:`PdfError` — a production build swaps in a full parser
behind the same function signature.
"""

from __future__ import annotations

import re


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


def synth_pdf(text: str) -> bytes:
    """A complete single-page PDF whose text layer holds ``text``, one
    Td/Tj pair per line, uncompressed."""
    lines = text.split("\n")
    ops = [b"BT", b"/F1 12 Tf", b"72 760 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _escape(line) + b") Tj")
    ops.append(b"ET")
    stream = b"\n".join(ops)

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
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


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)


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
            if nxt in "01234567":                   # octal escape
                j = i + 1
                while j < i + 4 and data[j:j + 1] in b"01234567":
                    j += 1
                # PDF spec: high-order overflow of a 3-digit octal
                # (e.g. \777) is ignored — mask, don't raise
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
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
    """Text lines of every uncompressed content stream, in layout order
    (one output line per Td/Tj pair)."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF payload")
    # compression is declared in object DICTIONARIES (outside stream
    # bodies) — scan only there, or document TEXT merely mentioning
    # FlateDecode would be misclassified as compressed
    if b"FlateDecode" in _STREAM_RE.sub(b"", data):
        raise PdfError("compressed streams unsupported by the built-in "
                       "parser; plug a full PDF library into the same "
                       "extract signature")
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        body = m.group(1)
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
        raise PdfError("no uncompressed text operators found")
    return "\n".join(lines)
