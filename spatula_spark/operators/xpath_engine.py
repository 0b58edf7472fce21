"""A from-scratch XPath 1.0 subset engine over ElementTree nodes.

The reference hands selectors to lxml's full XPath
(``/root/reference/src/spatula/selectors.py:88-112``); this container
has no lxml, and round 2's ElementTree-path passthrough only allowed
function predicates on the FINAL location step. This module closes the
gap with a real tokenizer -> recursive-descent parser -> evaluator:

* predicates on ANY location step, several per step, applied
  left-to-right with XPath position semantics (positions are counted
  within each context node's candidate list, so ``ul/li[1]`` is the
  first ``li`` of EVERY ``ul``);
* positional predicates: ``[3]``, ``[last()]``, ``[last()-1]``,
  ``[position() >= 2]``;
* ``//`` (descendant-or-self) at arbitrary depth mid-path;
* named axes: ``child`` (default), ``descendant``,
  ``descendant-or-self``, ``self``, ``parent`` (``..``), ``ancestor``,
  ``attribute`` (``@``), ``following-sibling``, ``preceding-sibling``;
* boolean predicate algebra: ``and`` / ``or`` / ``not()``,
  comparisons ``= != < <= > >=`` with XPath nodeset-vs-value
  existential semantics, relative-path operands (``[a/b='v']``,
  existence tests ``[child[@x]]``), ``contains`` / ``starts-with`` /
  ``ends-with`` / ``normalize-space`` / ``string-length`` /
  ``count`` / ``text()``;
* union paths (``a | b``) and trailing ``/text()`` / ``/@attr`` steps
  that yield STRINGS exactly as lxml does.

Results are in document order, deduplicated, like lxml. ElementTree
elements carry no parent pointers, so each evaluation builds a
parent map + document-order index in one O(n) pass over the context
root — the same order of work lxml spends building its tree.
"""

from __future__ import annotations

import re
from typing import Any
from xml.etree import ElementTree as ET

__all__ = ["XPathError", "xpath_compile", "xpath_eval"]


class XPathError(ValueError):
    pass


# --------------------------------------------------------------- tokenizer
_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<lit>'[^']*'|\"[^\"]*\")"
    r"|(?P<dslash>//)"
    r"|(?P<ddot>\.\.)"
    r"|(?P<axis>[a-zA-Z][\w-]*::)"
    r"|(?P<name>[a-zA-Z_][\w.-]*(?::[a-zA-Z_][\w.-]*)?)"
    r"|(?P<op><=|>=|!=|[=<>/\[\]()@,|.*+-])"
    r")"
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m or m.end() == m.start():
            if s[i:].strip():
                raise XPathError(f"bad token at {s[i:]!r} in {s!r}")
            break
        i = m.end()
        for kind in ("num", "lit", "dslash", "ddot", "axis", "name", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


# ------------------------------------------------------------------ parser
#
# AST (plain tuples):
#   ("union", [path, ...])
#   ("path", root, [step, ...])      root: "" rel | "/" | "//"
#   step = (axis, test, [pred-expr, ...])
#     test: ("name", n) | ("any",) | ("text",) | ("node",)
#   exprs: ("or"|"and", a, b), ("cmp", op, a, b), ("add", op, a, b),
#          ("num", v), ("lit", s), ("fn", name, [args]), path

_AXES = {
    "child", "descendant", "descendant-or-self", "self", "parent",
    "ancestor", "attribute", "following-sibling", "preceding-sibling",
}
_FNS = {
    "last": 0, "position": 0, "not": 1, "count": 1, "contains": 2,
    "starts-with": 2, "ends-with": 2, "normalize-space": (0, 1),
    "string-length": (0, 1), "string": (0, 1), "text": 0, "name": 0,
}


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val: str):
        kind, v = self.next()
        if v != val:
            raise XPathError(f"expected {val!r}, got {v!r} in {self.s!r}")

    # union := path ('|' path)*
    def parse(self):
        paths = [self.path()]
        while self.peek() == ("op", "|"):
            self.next()
            paths.append(self.path())
        if self.i != len(self.toks):
            raise XPathError(
                f"trailing tokens {self.toks[self.i:]} in {self.s!r}"
            )
        return ("union", paths)

    def path(self):
        kind, v = self.peek()
        root = ""
        if (kind, v) == ("op", "("):
            # parenthesized path: (//p)[2] selects the 2nd node of the
            # WHOLE result set (vs //p[2] = 2nd p per parent) — the
            # "paren" pseudo-step applies positions over one group;
            # trailing steps may follow: (//div)[2]/p
            self.next()
            inner = [self.path()]
            while self.peek() == ("op", "|"):
                self.next()
                inner.append(self.path())
            self.expect(")")
            steps = [("paren", ("union", inner), self.preds())]
        else:
            if (kind, v) == ("dslash", "//"):
                self.next()
                root = "//"
            elif (kind, v) == ("op", "/"):
                self.next()
                root = "/"
            steps = [self.step()]
        while True:
            kind, v = self.peek()
            if (kind, v) == ("op", "/"):
                self.next()
                steps.append(self.step())
            elif (kind, v) == ("dslash", "//"):
                self.next()
                steps.append(("descendant-or-self", ("node",), []))
                steps.append(self.step())
            else:
                break
        return ("path", root, steps)

    def step(self):
        kind, v = self.peek()
        axis = "child"
        if kind == "axis":
            axis = v[:-2]
            if axis not in _AXES:
                raise XPathError(f"unsupported axis {axis!r} in {self.s!r}")
            self.next()
            kind, v = self.peek()
        elif (kind, v) == ("op", "@"):
            self.next()
            axis = "attribute"
            kind, v = self.peek()

        if (kind, v) == ("ddot", ".."):
            self.next()
            return ("parent", ("node",), self.preds())
        if (kind, v) == ("op", "."):
            self.next()
            return ("self", ("node",), self.preds())
        if (kind, v) == ("op", "*"):
            self.next()
            return (axis, ("any",), self.preds())
        if kind == "name":
            if self.peek(1) == ("op", "(") and v in ("text", "node"):
                self.next(); self.expect("("); self.expect(")")
                return (axis, (v,), self.preds())
            self.next()
            return (axis, ("name", v), self.preds())
        raise XPathError(f"expected a node test, got {v!r} in {self.s!r}")

    def preds(self):
        out = []
        while self.peek() == ("op", "["):
            self.next()
            out.append(self.expr())
            self.expect("]")
        return out

    # expr := and_expr ('or' and_expr)*
    def expr(self):
        e = self.and_expr()
        while self.peek() == ("name", "or"):
            self.next()
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.cmp_expr()
        while self.peek() == ("name", "and"):
            self.next()
            e = ("and", e, self.cmp_expr())
        return e

    def cmp_expr(self):
        e = self.add_expr()
        kind, v = self.peek()
        if kind == "op" and v in ("=", "!=", "<", "<=", ">", ">="):
            self.next()
            e = ("cmp", v, e, self.add_expr())
        return e

    def add_expr(self):
        e = self.operand()
        while True:
            kind, v = self.peek()
            if kind == "op" and v in ("+", "-"):
                self.next()
                e = ("add", v, e, self.operand())
            else:
                break
        return e

    def operand(self):
        kind, v = self.peek()
        if kind == "num":
            self.next()
            return ("num", float(v))
        if kind == "lit":
            self.next()
            return ("lit", v[1:-1])
        if kind == "name" and self.peek(1) == ("op", "(") and v in _FNS:
            self.next(); self.expect("(")
            args = []
            if self.peek() != ("op", ")"):
                args.append(self.expr())
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.expr())
            self.expect(")")
            want = _FNS[v]
            ok = len(args) in want if isinstance(want, tuple) \
                else len(args) == want
            if not ok:
                raise XPathError(f"{v}() wrong arg count in {self.s!r}")
            if v == "text":  # text() as an operand = relative text step
                return ("path", "", [("child", ("text",), [])])
            return ("fn", v, args)
        # a relative (or absolute) location path used as an operand
        return self.path()


# --------------------------------------------------------------- evaluator
class _Doc:
    """Per-evaluation context: parent pointers + document order for the
    subtree rooted at the element handed to the selector."""

    __slots__ = ("root", "parent", "order")

    def __init__(self, root: ET.Element):
        self.root = root
        self.parent: dict[int, ET.Element | None] = {id(root): None}
        self.order: dict[int, int] = {}
        for i, el in enumerate(root.iter()):
            self.order[id(el)] = i
            for c in el:
                self.parent[id(c)] = el

    def children(self, node) -> list:
        return [self.root] if node is _DOCNODE else list(node)

    def descendants(self, node, include_self: bool) -> list:
        if node is _DOCNODE:
            return list(self.root.iter())
        out = list(node.iter())
        return out if include_self else out[1:]


_DOCNODE = object()  # virtual document node above the context root


def _string_value(node) -> str:
    if isinstance(node, str):
        return node
    return "".join(node.itertext())


def _text_nodes(el) -> list[str]:
    """An element's direct text children: own .text + each child's
    .tail, in document order (exactly lxml's child::text())."""
    out = []
    if el.text:
        out.append(el.text)
    for c in el:
        if c.tail:
            out.append(c.tail)
    return out


def _name_matches(el, test) -> bool:
    if not isinstance(el, ET.Element) and el is not _DOCNODE:
        return False
    if test[0] == "any":
        return True
    if test[0] == "name":
        return el.tag == test[1]
    return True  # node()


def _axis_candidates(doc: _Doc, node, axis: str, test) -> list:
    """Nodes reached from ``node`` along ``axis`` passing the node
    test, in axis order (document order for forward axes, reverse for
    parent/ancestor/preceding-sibling — XPath proximity order)."""
    if axis == "attribute":
        if node is _DOCNODE or not isinstance(node, ET.Element):
            return []
        if test[0] == "name":
            v = node.get(test[1])
            return [v] if v is not None else []
        if test[0] in ("any", "node"):
            return [node.attrib[k] for k in node.attrib]
        return []

    if test[0] == "text":
        if axis == "child":
            return _text_nodes(node) if isinstance(node, ET.Element) else []
        if axis in ("descendant", "descendant-or-self"):
            out = []
            for el in doc.descendants(node, include_self=True):
                out.extend(_text_nodes(el))
            return out
        if axis == "self":
            return [node] if isinstance(node, str) else []
        return []

    if axis == "child":
        cands = doc.children(node) if node is _DOCNODE else (
            list(node) if isinstance(node, ET.Element) else [])
    elif axis == "descendant":
        cands = doc.descendants(node, include_self=False) \
            if node is not _DOCNODE else doc.descendants(node, True)
    elif axis == "descendant-or-self":
        cands = [node] if isinstance(node, str) else \
            doc.descendants(node, include_self=node is not _DOCNODE)
        if node is _DOCNODE:
            cands = [node, *cands]
    elif axis == "self":
        cands = [node]
    elif axis == "parent":
        p = doc.parent.get(id(node)) if isinstance(node, ET.Element) else None
        cands = [p] if p is not None else (
            [_DOCNODE] if node is doc.root else [])
    elif axis == "ancestor":
        cands = []
        cur = node
        while isinstance(cur, ET.Element):
            cur = doc.parent.get(id(cur))
            if cur is None:
                break
            cands.append(cur)
    elif axis in ("following-sibling", "preceding-sibling"):
        p = doc.parent.get(id(node)) if isinstance(node, ET.Element) else None
        if p is None:
            return []
        sibs = list(p)
        idx = next(i for i, s in enumerate(sibs) if s is node)
        cands = sibs[idx + 1:] if axis == "following-sibling" \
            else sibs[:idx][::-1]
    else:  # pragma: no cover
        raise XPathError(f"axis {axis!r} not implemented")
    if test[0] == "node":
        return [c for c in cands if c is _DOCNODE
                or isinstance(c, (ET.Element, str))]
    return [c for c in cands if _name_matches(c, test)]


def _to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return float("nan")
    if isinstance(v, list):
        return _to_number(_string_value(v[0])) if v else float("nan")
    return float("nan")


def _to_string(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else str(v)
    if isinstance(v, list):
        return _string_value(v[0]) if v else ""
    return v


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v == v and v != 0.0
    if isinstance(v, list):
        return bool(v)
    return bool(v)


def _compare(op: str, a, b) -> bool:
    """XPath 1.0 comparison incl. existential nodeset semantics."""
    if isinstance(a, list) or isinstance(b, list):
        avs = [_string_value(n) for n in a] if isinstance(a, list) else [a]
        bvs = [_string_value(n) for n in b] if isinstance(b, list) else [b]
        return any(_compare(op, x, y) for x in avs for y in bvs)
    if op in ("=", "!="):
        if isinstance(a, bool) or isinstance(b, bool):
            eq = _to_bool(a) == _to_bool(b)
        elif isinstance(a, float) or isinstance(b, float):
            eq = _to_number(a) == _to_number(b)
        else:
            eq = _to_string(a) == _to_string(b)
        return eq if op == "=" else not eq
    x, y = _to_number(a), _to_number(b)
    return {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y}[op]


class _Evaluator:
    def __init__(self, doc: _Doc):
        self.doc = doc

    def eval_union(self, ast, ctx) -> list:
        _, paths = ast
        seen: set[int] = set()
        out = []
        for p in paths:
            for n in self.eval_path(p, ctx):
                key = id(n) if not isinstance(n, str) else None
                if key is not None:
                    if key in seen:
                        continue
                    seen.add(key)
                out.append(n)
        if len(paths) > 1:
            order = self.doc.order
            out.sort(key=lambda n: order.get(id(n), 1 << 60)
                     if not isinstance(n, str) else 1 << 60)
        return out

    def eval_path(self, ast, ctx) -> list:
        _, root, steps = ast
        if root == "/":
            nodes: list = [_DOCNODE]
        elif root == "//":
            nodes = [_DOCNODE]
            steps = [("descendant-or-self", ("node",), []), *steps]
        else:
            nodes = list(ctx)
        for step in steps:
            nodes = self._apply_step(step, nodes)
        return nodes

    def _apply_step(self, step, nodes) -> list:
        axis, test, preds = step
        if axis == "paren":
            # (path)[k]: predicates apply over the WHOLE deduped result
            # set as ONE group — position = global document order, not
            # per-parent (the lxml (//p)[1] form)
            cands = self.eval_union(test, nodes)
            for pred in preds:
                cands = self._filter_pred(pred, cands)
            return cands
        out = []
        seen: set[int] = set()
        for node in nodes:
            cands = _axis_candidates(self.doc, node, axis, test)
            for pred in preds:
                cands = self._filter_pred(pred, cands)
            for c in cands:
                if isinstance(c, str):
                    out.append(c)
                elif id(c) not in seen:
                    seen.add(id(c))
                    out.append(c)
        return out

    def _filter_pred(self, pred, cands) -> list:
        n = len(cands)
        kept = []
        for pos, c in enumerate(cands, start=1):
            v = self.eval_expr(pred, c, pos, n)
            ok = (pos == v) if isinstance(v, float) else _to_bool(v)
            if ok:
                kept.append(c)
        return kept

    def eval_expr(self, e, ctx_node, pos: int, size: int):
        kind = e[0]
        if kind == "num":
            return e[1]
        if kind == "lit":
            return e[1]
        if kind == "or":
            return (_to_bool(self.eval_expr(e[1], ctx_node, pos, size))
                    or _to_bool(self.eval_expr(e[2], ctx_node, pos, size)))
        if kind == "and":
            return (_to_bool(self.eval_expr(e[1], ctx_node, pos, size))
                    and _to_bool(self.eval_expr(e[2], ctx_node, pos, size)))
        if kind == "cmp":
            return _compare(
                e[1],
                self.eval_expr(e[2], ctx_node, pos, size),
                self.eval_expr(e[3], ctx_node, pos, size),
            )
        if kind == "add":
            x = _to_number(self.eval_expr(e[2], ctx_node, pos, size))
            y = _to_number(self.eval_expr(e[3], ctx_node, pos, size))
            return x + y if e[1] == "+" else x - y
        if kind == "path":
            return self.eval_path(e, [ctx_node])
        if kind == "union":
            return self.eval_union(e, [ctx_node])
        if kind == "fn":
            return self._call(e[1], e[2], ctx_node, pos, size)
        raise XPathError(f"unknown expr {e!r}")  # pragma: no cover

    def _call(self, name, args, ctx_node, pos, size):
        ev = lambda a: self.eval_expr(a, ctx_node, pos, size)  # noqa: E731
        if name == "last":
            return float(size)
        if name == "position":
            return float(pos)
        if name == "not":
            return not _to_bool(ev(args[0]))
        if name == "count":
            v = ev(args[0])
            if not isinstance(v, list):
                raise XPathError("count() needs a node-set")
            return float(len(v))
        if name in ("contains", "starts-with", "ends-with"):
            a, b = _to_string(ev(args[0])), _to_string(ev(args[1]))
            return {
                "contains": a.__contains__,
                "starts-with": a.startswith,
                "ends-with": a.endswith,
            }[name](b)
        if name == "normalize-space":
            s = _to_string(ev(args[0])) if args \
                else _string_value(ctx_node)
            return " ".join(s.split())
        if name == "string":
            return _to_string(ev(args[0])) if args \
                else _string_value(ctx_node)
        if name == "string-length":
            s = _to_string(ev(args[0])) if args \
                else _string_value(ctx_node)
            return float(len(s))
        if name == "name":
            return ctx_node.tag if isinstance(ctx_node, ET.Element) else ""
        raise XPathError(f"function {name}() not supported")


_COMPILED: dict[str, tuple] = {}


def xpath_compile(expr: str) -> tuple:
    """Parse ``expr`` to an AST (cached — selectors are reused across
    millions of rows, tokenizing once per executor is free)."""
    ast = _COMPILED.get(expr)
    if ast is None:
        ast = _Parser(expr).parse()
        _COMPILED[expr] = ast
    return ast


def xpath_eval(expr: str, element: ET.Element) -> list[Any]:
    """Evaluate ``expr`` with ``element`` as the context node (and its
    subtree as the document, lxml-fragment style). Returns elements
    and/or strings in document order, deduplicated."""
    ast = xpath_compile(expr)
    doc = _Doc(element)
    return _Evaluator(doc).eval_union(ast, [element])
