"""Synthesized binary-format fixtures: minimal valid PDF and XLSX
builders (stdlib only) for the parser golden tests — the reference
consumes these formats via pdftotext/openpyxl (pages.py:376-417,
475-486); our parsers must extract the same content."""

from __future__ import annotations

import io
import zipfile
import zlib


def make_pdf(content_stream: bytes, compress: bool = True) -> bytes:
    """One-page PDF wrapping ``content_stream`` (text operators)."""
    data = zlib.compress(content_stream) if compress else content_stream
    filt = b"/Filter /FlateDecode " if compress else b""
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + obj + b"\nendobj\n")
    xref = out.tell()
    out.write(f"xref\n0 {len(objects) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode()
        + b"\n%%EOF\n"
    )
    return out.getvalue()


def make_xlsx(rows: list[list]) -> bytes:
    """Minimal xlsx: one worksheet + shared strings. Cell types:
    str -> shared string, bool -> b, int/float -> n, None -> omitted."""
    shared: list[str] = []

    def cell(r: int, c: int, v) -> str:
        ref = f"{chr(65 + c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v not in shared:
            shared.append(str(v))
        return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'

    body = "".join(
        f'<row r="{r + 1}">'
        + "".join(cell(r, c, v) for c, v in enumerate(vals))
        + "</row>"
        for r, vals in enumerate(rows)
    )
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", sst)
    return buf.getvalue()
