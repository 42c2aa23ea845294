"""Tiny classic-xref PDF writer for tests.

Generates real, spec-conforming PDF bytes (header, page tree, content
streams with Tj/TJ operators, xref table, trailer) so the default
``pdf_text_parser`` is exercised on genuine PDF structure — no injected
parser, no third-party library on either side.
"""

from __future__ import annotations

import zlib


def _esc(s: str) -> bytes:
    return s.encode("latin-1").replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(pages: list[list[str]], compress: bool = False, hex_strings: bool = False) -> bytes:
    """Build a PDF: one content stream per page; each inner list is the
    page's text items (one ``Tj``/``TJ`` show op per item)."""
    objs: list[bytes] = []  # bodies, object number = index + 1
    n_pages = len(pages)
    page_nums = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [ " + kids + b" ] /Count %d >>" % n_pages)
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, items in enumerate(pages):
        content = b"BT /F1 12 Tf 72 720 Td\n"
        for j, item in enumerate(items):
            if hex_strings:
                content += b"<" + item.encode("latin-1").hex().encode() + b"> Tj\n"
            elif j % 2:  # alternate Tj and TJ with kerning numbers
                content += b"[ (" + _esc(item) + b") -250 ] TJ\n"
            else:
                content += b"(" + _esc(item) + b") Tj\n"
        content += b"ET"
        body = zlib.compress(content) if compress else content
        filt = b" /Filter /FlateDecode" if compress else b""
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 3 0 R >> >> "
            b"/MediaBox [0 0 612 792] /Contents %d 0 R >>" % (page_nums[i] + 1)
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n" % (len(body), filt) + body + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
