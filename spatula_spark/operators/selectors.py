"""Extraction selectors with cardinality constraints.

Reimplements the reference's Selector family
(``/root/reference/src/spatula/selectors.py``):

* ``Selector.match`` — run the query, enforce ``min_items`` /
  ``max_items`` / ``num_items`` else ``SelectorError``
  (``selectors.py:32-73``)
* ``Selector.match_one`` — exactly-one scalar (``selectors.py:75-81``)
* ``XPath`` (``selectors.py:88-112``), ``CSS``
  (``selectors.py:151-175``), ``SimilarLink`` — regex over ``<a href>``
  with first-occurrence-wins dedup (``selectors.py:115-148``).

Differences by design, not omission:

* These run **inside Arrow batch UDFs** over payload columns — the
  engine never calls a selector per Spark row. For structured payloads
  the engine prefers native Catalyst exprs (``get_json_object``,
  ``from_json``, ``filter(links, x -> x rlike pat)``,
  order-preserving ``array_distinct``) over any of this; this module
  is the HTML/XML escape hatch.
* The element tree is stdlib ``xml.etree`` (no lxml in container), so
  ``XPath`` supports ElementTree's path subset and ``CSS`` a practical
  selector subset (tag, ``.class``, ``#id``, ``[attr]``, descendant
  combinators) — sufficient for the reference's test grammar.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from abc import ABC, abstractmethod
from collections.abc import Iterator


class SelectorError(ValueError):
    """Raised when a cardinality constraint is not met
    (reference ``selectors.py:8-13``)."""


class Selector(ABC):
    def __init__(
        self,
        *,
        min_items: int | None = 1,
        max_items: int | None = None,
        num_items: int | None = None,
    ):
        self.min_items = min_items
        self.max_items = max_items
        self.num_items = num_items

    def match(
        self,
        element: ET.Element,
        *,
        min_items: int | None = None,
        max_items: int | None = None,
        num_items: int | None = None,
    ) -> list[ET.Element]:
        items = list(self.get_items(element))
        num_items = self.num_items if num_items is None else num_items
        max_items = self.max_items if max_items is None else max_items
        min_items = self.min_items if min_items is None else min_items

        if num_items is not None and len(items) != num_items:
            raise SelectorError(
                f"{self} got {len(items)} results, expected {num_items}"
            )
        if min_items is not None and len(items) < min_items:
            raise SelectorError(
                f"{self} got {len(items)} results, expected at least {min_items}"
            )
        if max_items is not None and len(items) > max_items:
            raise SelectorError(
                f"{self} got {len(items)} results, expected at most {max_items}"
            )
        return items

    def match_one(self, element: ET.Element) -> ET.Element:
        return self.match(element, num_items=1)[0]

    @abstractmethod
    def get_items(self, element: ET.Element) -> Iterator[ET.Element]: ...


class XPath(Selector):
    """ElementTree-path selector (reference ``selectors.py:88-112``).

    Accepts ElementTree's XPath subset (``.//li``, ``tag[@attr]``...).
    Leading ``//`` is normalized to ``.//`` for lxml-style inputs.
    """

    def __init__(self, xpath: str, **kw):
        super().__init__(**kw)
        self.xpath = xpath

    def get_items(self, element: ET.Element) -> Iterator[ET.Element]:
        path = self.xpath
        if path.startswith("//"):
            path = "." + path
        yield from element.iterfind(path)

    def __str__(self) -> str:
        return f"XPath({self.xpath})"


_CSS_PART = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)+)?"
    r"(?P<attr>\[[\w-]+(?:=[^\]]+)?\])?"
)


class CSS(Selector):
    """CSS selector subset (reference ``selectors.py:151-175`` uses
    cssselect; unavailable here). Supports compound simple selectors
    joined by descendant combinators: ``ul li.cls``, ``#id``, ``a[href]``.
    """

    def __init__(self, css_selector: str, **kw):
        super().__init__(**kw)
        self.css_selector = css_selector
        self._steps = [self._compile(p) for p in css_selector.split()]

    @staticmethod
    def _compile(part: str):
        m = _CSS_PART.fullmatch(part)
        if not m or not any(m.groups()):
            raise ValueError(f"unsupported CSS selector part: {part!r}")
        tag = m.group("tag")
        want_id = m.group("id")[1:] if m.group("id") else None
        classes = (
            set(m.group("classes")[1:].split(".")) if m.group("classes") else set()
        )
        attr_name = attr_val = None
        if m.group("attr"):
            body = m.group("attr")[1:-1]
            if "=" in body:
                attr_name, attr_val = body.split("=", 1)
                attr_val = attr_val.strip("'\"")
            else:
                attr_name = body

        def pred(el: ET.Element) -> bool:
            if tag and tag != "*" and el.tag != tag:
                return False
            if want_id and el.get("id") != want_id:
                return False
            if classes and not classes <= set((el.get("class") or "").split()):
                return False
            if attr_name is not None:
                v = el.get(attr_name)
                if v is None or (attr_val is not None and v != attr_val):
                    return False
            return True

        return pred

    def get_items(self, element: ET.Element) -> Iterator[ET.Element]:
        frontier = [element]
        for step in self._steps:
            nxt: list[ET.Element] = []
            seen_ids: set[int] = set()
            for scope in frontier:
                for el in scope.iter():
                    if el is scope:
                        continue
                    if step(el) and id(el) not in seen_ids:
                        seen_ids.add(id(el))
                        nxt.append(el)
            frontier = nxt
        yield from frontier

    def __str__(self) -> str:
        return f"CSS({self.css_selector})"


class SimilarLink(Selector):
    """All ``<a>`` elements whose href matches a regex, deduped on first
    occurrence with document order preserved — exact semantics of the
    reference (``selectors.py:136-144``; golden
    ``tests/test_selectors.py:99-101``).

    Engine fast path: when links are already a native ``array<string>``
    column the same semantics are ``array_distinct(filter(links,
    x -> x rlike pattern))`` — both order-preserving/first-wins — with
    no Python at all.
    """

    def __init__(self, pattern: str, **kw):
        super().__init__(**kw)
        self.pattern = re.compile(pattern)

    def get_items(self, element: ET.Element) -> Iterator[ET.Element]:
        seen: set[str] = set()
        for el in element.iter("a"):
            href = el.get("href")
            if href and href not in seen and self.pattern.match(href):
                seen.add(href)
                yield el

    def __str__(self) -> str:
        return f"SimilarLink({self.pattern.pattern})"
