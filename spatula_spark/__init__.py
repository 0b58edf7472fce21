"""spatula_spark — a from-scratch PySpark-native crawl/analytics engine.

Reimplements the query & data-processing capabilities of the reference
``jamesturk/spatula`` (a single-threaded page-object scraping engine,
``/root/reference/src/spatula/``) as an iterative DataFrame *frontier*
loop: seeds -> [wave: politeness-limit -> fetch-join -> parse/extract
(Arrow UDF or native exprs) -> route emissions -> seen-set dedup ->
checkpoint] -> results table.

Nothing here is a port: the reference keeps its frontier on the Python
call stack (``pages.py:206-244`` recursive ``_to_items``); we make it an
explicit DataFrame processed in BFS waves, with a lineage *path key*
that reconstructs the reference's depth-first emission order on demand.

Public API (mirrors the reference's ``__init__.py:1-19`` surface):
"""

from .plans.pagespec import (
    PageSpec,
    PageRegistry,
    URL,
    NullSource,
    SkipItem,
    HandledError,
    MissingSourceError,
    RejectedResponse,
)
from .plans.engine import CrawlEngine, CrawlConfig
from .operators.selectors import (
    Selector,
    SelectorError,
    CSS,
    XPath,
    SimilarLink,
)
from .pages import (
    page,
    html_page,
    xml_page,
    json_page,
    pdf_page,
    list_page,
    html_list_page,
    xml_list_page,
    json_list_page,
    csv_list_page,
    excel_list_page,
)
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "PageSpec",
    "PageRegistry",
    "URL",
    "NullSource",
    "SkipItem",
    "HandledError",
    "MissingSourceError",
    "RejectedResponse",
    "CrawlEngine",
    "CrawlConfig",
    "Selector",
    "SelectorError",
    "CSS",
    "XPath",
    "SimilarLink",
    "page",
    "html_page",
    "xml_page",
    "json_page",
    "pdf_page",
    "list_page",
    "html_list_page",
    "xml_list_page",
    "json_list_page",
    "csv_list_page",
    "excel_list_page",
    "get_spark",
]
