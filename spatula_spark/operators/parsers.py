"""Per-format payload parsers (reference: ``postprocess_response``).

The reference parses responses eagerly per page object:
HTML via lxml + link absolutization (``pages.py:327-344``), XML
(``pages.py:347-359``), JSON (``pages.py:362-373``), CSV DictReader
(``pages.py:462-469``), Excel (``pages.py:475-486``), PDF
(``pages.py:376-417``).

Here parsing happens *inside the Arrow batch* of the page-transform
UDF — one Python call per batch, not per row-with-Spark-overhead. This
container has no lxml, so the HTML/XML element tree is stdlib
(``html.parser`` / ``xml.etree``): a tolerant HTML parser building an
ElementTree that our Selector operators query. JSON payloads on the
*structured* path avoid Python entirely via ``F.from_json`` (see
engine docs). Excel/PDF are gated behind import-try (libs absent) and
raise ``NotImplementedError`` with the Spark-side plumbing in place.
"""

from __future__ import annotations

import csv
import io
import json
import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from typing import Any
from urllib.parse import urljoin

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _TreeBuilder(HTMLParser):
    """Tolerant HTML -> ElementTree builder (stdlib-only lxml stand-in)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = ET.Element("document")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        el = ET.SubElement(self.stack[-1], tag, {k: v or "" for k, v in attrs})
        if tag not in _VOID_TAGS:
            self.stack.append(el)

    def handle_endtag(self, tag: str) -> None:
        # tolerant close: pop to the nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        el = self.stack[-1]
        if len(el):
            last = el[-1]
            last.tail = (last.tail or "") + data
        else:
            el.text = (el.text or "") + data


def parse_html(content: bytes | str, base_url: str | None = None) -> ET.Element:
    """Parse HTML; absolutize href/src like the reference's
    ``HtmlPage.postprocess_response`` (``pages.py:341-344``)."""
    text = content.decode("utf-8", "replace") if isinstance(content, bytes) else content
    builder = _TreeBuilder()
    builder.feed(text)
    root = builder.root
    if base_url:
        for el in root.iter():
            for attr in ("href", "src"):
                v = el.get(attr)
                if v is not None:
                    el.set(attr, urljoin(base_url, v))
    # unwrap the synthetic document node when there is one real root
    children = list(root)
    if len(children) == 1 and root.text in (None, "", "\n"):
        return children[0]
    return root


def parse_xml(content: bytes | str) -> ET.Element:
    """XML parse (reference ``XmlPage.postprocess_response`` pages.py:358-359)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    return ET.fromstring(content)


def parse_json(content: bytes | str) -> Any:
    """JSON parse (reference ``JsonPage`` pages.py:372-373). For fixed
    schemas prefer native ``F.from_json`` — this path is for dynamic
    payloads inside a batch UDF."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    return json.loads(content)


def parse_csv(content: bytes | str) -> list[dict[str, str]]:
    """CSV -> all-string dicts, header row as keys — exact semantics of
    ``csv.DictReader`` in the reference (pages.py:468-469; golden
    ``tests/test_pages.py:68-74`` expects ``{'a': '1', ...}``)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    return list(csv.DictReader(io.StringIO(content)))


def parse_excel(content: bytes):  # pragma: no cover - lib absent
    """Reference ``ExcelListPage`` (pages.py:475-486). openpyxl is not in
    this container; plumbing kept, decode stubbed."""
    try:
        from openpyxl import load_workbook
    except ImportError as e:
        raise NotImplementedError("openpyxl unavailable in this environment") from e
    wb = load_workbook(io.BytesIO(content))
    ws = wb.active
    return [list(r) for r in ws.values]


def parse_pdf(content: bytes):  # pragma: no cover - lib absent
    """Reference ``PdfPage`` shells out to pdftotext (pages.py:393-417);
    neither pdftotext nor pypdf exists here — stubbed."""
    raise NotImplementedError("pdftotext/pypdf unavailable in this environment")


def element_text(el: ET.Element) -> str:
    """Concatenated text content (lxml ``text_content()`` equivalent)."""
    return "".join(el.itertext())
