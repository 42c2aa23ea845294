"""Minimal deterministic PDF text extractor (pure Python, stdlib only).

Closes reference S1/P1 (``App.tsx:46-54``: pdf.js ``getTextContent`` per
page, items joined with ``' '``, pages accumulated with a trailing
``'\\n'``) without any third-party PDF library — the container has no
pypdf, and a user ingesting an actual PDF must not hit a stub.

Scope (deliberately small, spelled out so failures are explicit):

- classic cross-reference PDFs (object streams / compressed xref are NOT
  parsed — this walks ``N G obj … endobj`` spans directly, so linearized
  and incrementally-updated files still work as long as page/content
  objects are plain objects);
- content streams stored raw or FlateDecode-compressed (zlib);
- text from ``Tj`` / ``TJ`` / ``'`` / ``"`` show operators, literal
  ``(…)`` strings (escapes, octal, nesting) and hex ``<…>`` strings,
  decoded as PDFDocEncoding≈latin-1 — no CMap/ToUnicode handling, so
  embedded-subset fonts with nonstandard encodings come out garbled (the
  same class of file pdf.js needs font programs for).

Anything outside that scope raises ``ValueError`` with the reason rather
than silently returning wrong text.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

# Literal-string escape table (PDF 32000-1 §7.3.4.2).
_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Map object number → raw object body (between ``obj`` and ``endobj``).

    Bodies with streams are cut at the stream's true end (``/Length``
    when it is a direct integer, else the next ``endstream``) so binary
    stream bytes containing ``endobj`` can't truncate the object.
    """
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        start = m.end()
        sm = re.compile(rb"\bstream\r?\n").search(data, start)
        eo = data.find(b"endobj", start)
        if sm is not None and (eo == -1 or sm.start() < eo):
            head = data[start : sm.start()]
            lm = re.search(rb"/Length\s+(\d+)(?![\s]*0\s+R)", head)
            if lm is not None:
                send = sm.end() + int(lm.group(1))
                send = data.find(b"endstream", send)
            else:
                send = data.find(b"endstream", sm.end())
            if send == -1:
                raise ValueError("PDF stream without endstream")
            eo = data.find(b"endobj", send)
        if eo == -1:
            raise ValueError("PDF object without endobj")
        # Latest definition wins: incremental updates append re-definitions.
        objects[int(m.group(1))] = data[start:eo]
        pos = eo + 6
    if not objects:
        raise ValueError("no PDF objects found (not a classic-xref PDF?)")
    return objects


def _dict_of(body: bytes) -> bytes:
    """The top-level ``<< … >>`` span of an object body (or b'')."""
    i = body.find(b"<<")
    if i == -1:
        return b""
    depth, j = 0, i
    while j < len(body) - 1:
        if body[j : j + 2] == b"<<":
            depth, j = depth + 1, j + 2
        elif body[j : j + 2] == b">>":
            depth, j = depth - 1, j + 2
            if depth == 0:
                return body[i:j]
        else:
            j += 1
    return body[i:]


def _name_value(d: bytes, key: bytes) -> bytes | None:
    m = re.search(rb"/" + key + rb"\s*/(\w+)", d)
    return m.group(1) if m else None


def _ref_value(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R\b", d)
    return int(m.group(1)) if m else None


def _stream_data(body: bytes) -> bytes:
    sm = re.compile(rb"\bstream\r?\n").search(body)
    if sm is None:
        raise ValueError("content object has no stream")
    raw = body[sm.end() :]
    end = raw.rfind(b"endstream")
    if end != -1:
        raw = raw[:end]
    raw = raw.rstrip(b"\r\n")
    d = _dict_of(body)
    fm = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", d)
    if fm is None:
        return raw
    filters = re.findall(rb"/(\w+)", fm.group(1))
    for f in filters:
        if f == b"FlateDecode":
            raw = zlib.decompress(raw)
        else:
            raise ValueError(f"unsupported PDF stream filter /{f.decode()}")
    return raw


def _page_objects(objects: dict[int, bytes]) -> list[bytes]:
    """Page object bodies in document page order (catalog → pages walk,
    falling back to ``/Type /Page`` in object-number order)."""
    root = None
    for body in objects.values():
        d = _dict_of(body)
        if _name_value(d, b"Type") == b"Catalog":
            root = _ref_value(d, b"Pages")
    pages: list[bytes] = []
    if root is not None and root in objects:
        def walk(num: int, seen: frozenset[int]) -> None:
            if num in seen or num not in objects:
                return
            d = _dict_of(objects[num])
            typ = _name_value(d, b"Type")
            if typ == b"Page":
                pages.append(objects[num])
                return
            km = re.search(rb"/Kids\s*\[([^\]]*)\]", d)
            if km is not None:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), seen | {num})
        walk(root, frozenset())
    if not pages:
        for num in sorted(objects):
            if _name_value(_dict_of(objects[num]), b"Type") == b"Page":
                pages.append(objects[num])
    if not pages:
        raise ValueError("PDF has no /Type /Page objects")
    return pages


def _content_streams(page: bytes, objects: dict[int, bytes]) -> bytes:
    """A page's content streams, concatenated with a newline (the spec
    treats multiple /Contents streams as one stream with whitespace)."""
    d = _dict_of(page)
    cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", d)
    if cm is None:
        return b""
    refs = [int(m.group(1)) for m in _REF_RE.finditer(cm.group(1))]
    return b"\n".join(_stream_data(objects[r]) for r in refs if r in objects)


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Decode ``(…)`` starting at ``data[i] == '('``; returns (bytes, next)."""
    out, depth, i = bytearray(), 1, i + 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0D, 0x0A):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # stray backslash: drop it, keep the char
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end == -1:
        end = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


def _text_items(content: bytes) -> list[str]:
    """Strings shown by Tj/TJ/'/\" in content-stream order — the pdf.js
    ``textContent.items`` analog the reference joins with spaces."""
    items: list[str] = []
    operands: list[bytes] = []  # string operands since the last operator
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment → end of line
            j = content.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == 0x28:  # (
            s, i = _literal_string(content, i)
            operands.append(s)
        elif c == 0x3C:  # < or <<
            if content[i : i + 2] == b"<<":
                i += 2
            else:
                s, i = _hex_string(content, i)
                operands.append(s)
        elif c == 0x2F:  # /Name
            i += 1
            while i < n and content[i] not in _WS and content[i] not in _DELIM:
                i += 1
        elif c in b"[]{}>":
            i += 1  # array/dict structure — strings inside stay collected
        elif c == 0x27 or c == 0x22:  # ' and " show operators
            if operands:
                items.append(operands[-1].decode("latin-1"))
            operands = []
            i += 1
        elif 0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A:
            j = i
            while j < n and (0x41 <= content[j] <= 0x5A or 0x61 <= content[j] <= 0x7A or content[j] == 0x2A):
                j += 1
            op = content[i:j]
            if op in (b"Tj", b"TJ"):
                items.extend(s.decode("latin-1") for s in operands)
            operands = []
            i = j
        else:  # numbers, signs, anything else
            i += 1
    return items


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → text with the reference's concatenation semantics
    (``App.tsx:49-54``): per page, show-operator strings joined with
    ``' '``; each page appended with a trailing ``'\\n'``."""
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    objects = _parse_objects(data)
    full = ""
    for page in _page_objects(objects):
        items = _text_items(_content_streams(page, objects))
        full += " ".join(items) + "\n"
    return full
