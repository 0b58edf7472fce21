"""Reference page-class vocabulary as PageSpec factories.

The reference's public API is a class per (format x shape):
``Page / HtmlPage / XmlPage / JsonPage / PdfPage / ListPage /
HtmlListPage / XmlListPage / JsonListPage / CsvListPage /
ExcelListPage`` (``/root/reference/src/spatula/__init__.py:1-19``,
classes in ``pages.py:327-486``). Here a "class" is a PageSpec
configuration; these factories give a user of the reference the same
vocabulary one-for-one:

    reg.register(html_page("EmployeeDetail", process_page=...))
    reg.register(html_list_page("EmployeeList", selector=CSS("li.emp"),
                                process_item=...))

Format classes force the parse kind like the reference does (an
HtmlPage parses HTML regardless of content type, pages.py:327-344).
"""

from __future__ import annotations

from typing import Any

from .plans.pagespec import PageSpec


def page(name: str, **kw: Any) -> PageSpec:
    """Base ``Page`` (pages.py:78-258): bring-your-own process_page."""
    return PageSpec(name=name, **kw)


def html_page(name: str, **kw: Any) -> PageSpec:
    """``HtmlPage``: ctx.root is the parsed tree with absolutized
    links (pages.py:327-344)."""
    return PageSpec(name=name, page_kind="html", **kw)


def xml_page(name: str, **kw: Any) -> PageSpec:
    """``XmlPage`` (pages.py:347-359)."""
    return PageSpec(name=name, page_kind="xml", **kw)


def json_page(name: str, **kw: Any) -> PageSpec:
    """``JsonPage``: ctx.json is the decoded payload (pages.py:362-373)."""
    return PageSpec(name=name, page_kind="json", **kw)


def pdf_page(name: str, *, preserve_layout: bool = False, **kw: Any) -> PageSpec:
    """``PdfPage`` (pages.py:376-417): ``ctx.text`` is the extracted
    text (pure-Python pdftotext stand-in, parsers.parse_pdf);
    ``preserve_layout`` mirrors the ``-layout`` flag."""
    return PageSpec(
        name=name, page_kind="pdf", preserve_layout=preserve_layout, **kw
    )


def list_page(name: str, **kw: Any) -> PageSpec:
    """``ListPage`` (pages.py:420-459): items_fn/selector +
    process_item, SkipItem drops an item and continues."""
    return PageSpec(name=name, **kw)


def html_list_page(name: str, *, selector, process_item=None, **kw) -> PageSpec:
    """``HtmlListPage`` (pages.py:472): selector over ctx.root."""
    return PageSpec(
        name=name, page_kind="html", selector=selector,
        process_item=process_item, **kw,
    )


def xml_list_page(name: str, *, selector, process_item=None, **kw) -> PageSpec:
    """``XmlListPage`` (pages.py:489)."""
    return PageSpec(
        name=name, page_kind="xml", selector=selector,
        process_item=process_item, **kw,
    )


def json_list_page(name: str, *, process_item=None, **kw) -> PageSpec:
    """``JsonListPage`` (pages.py:492-...): items = the JSON list."""
    return PageSpec(
        name=name, page_kind="json", process_item=process_item or (
            lambda item, ctx: item
        ), **kw,
    )


def csv_list_page(name: str, *, process_item=None, **kw) -> PageSpec:
    """``CsvListPage`` (pages.py:462-469): items = DictReader rows
    (all-string dicts)."""
    return PageSpec(
        name=name, page_kind="csv", process_item=process_item or (
            lambda item, ctx: item
        ), **kw,
    )


def excel_list_page(name: str, *, process_item=None, **kw) -> PageSpec:
    """``ExcelListPage`` (pages.py:475-486): items = active-sheet rows
    as value lists (stdlib xlsx reader, parsers.parse_excel)."""
    return PageSpec(
        name=name, page_kind="excel", process_item=process_item or (
            lambda item, ctx: item
        ), **kw,
    )
