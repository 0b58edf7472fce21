"""Sitemap ingestion — frontier seeding from /sitemap.xml.

The reference discovers URLs only through page-object links
(`/root/reference/src/spatula/pages.py` get_source / process_page);
a web-scale crawler also seeds its frontier from the sitemaps.org
protocol (https://www.sitemaps.org/protocol.html): ``<urlset>`` leaf
documents listing ``<url><loc/><lastmod/><changefreq/><priority/>``
entries, ``<sitemapindex>`` documents pointing at child sitemaps, and
either form optionally gzip-compressed (``sitemap.xml.gz``).

Two execution paths, picked by document shape:

* :func:`parse_sitemap` / :func:`sitemap_entries` — the REAL parser:
  gzip sniffing + namespace-agnostic ElementTree, wrapped as an
  Arrow-batched pandas UDF (never per-row Python at the plan level).
  Handles sitemapindex fan-out and malformed documents (a bad doc
  yields zero entries, never a crashed batch — crawled inputs are
  dirty by default).
* :func:`sitemap_locs_native` — ``regexp_extract_all`` over
  well-formed uncompressed XML: stays inside whole-stage codegen, the
  hot path when a 10^10-URL frontier is being re-seeded and the
  sitemaps are known-clean (e.g. re-parsing our own page store).

Scale shape: one sitemap document is one row (sitemaps cap at 50k
URLs / 50 MB by spec), so the explode fans out ≤50k entries per row
with no shuffle; downstream canonicalize → seen anti-join → per-host
ranking reuse the frontier operators (urls.py, operators/seen.py).
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ENTRY_FIELDS = ("loc", "lastmod", "changefreq", "priority")

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("changefreq", T.StringType()),
        T.StructField("priority", T.DoubleType()),
    ]
)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def parse_sitemap(content: bytes | str) -> list[dict]:
    """Parse one sitemap document into entry dicts.

    Accepts str or bytes; gzip-compressed bytes are sniffed by magic
    (``1f 8b``) and decompressed. Namespace-agnostic (matches on XML
    local names, so the sitemaps.org default namespace, prefixed
    namespaces, and namespace-less test documents all parse the same).
    ``kind`` is ``"url"`` for ``<urlset>`` leaves and ``"sitemap"``
    for ``<sitemapindex>`` children (the caller fetches those and
    recurses — one extra frontier wave, same machinery). Malformed
    XML or a missing <loc> yields zero entries for that document.
    """
    if isinstance(content, bytes):
        if content[:2] == b"\x1f\x8b":
            try:
                content = gzip.decompress(content)
            except OSError:
                return []
    try:
        # bytes go to ET directly so a non-UTF-8 encoding declaration
        # (latin-1 sitemaps exist) is honored rather than mangled
        root = ET.fromstring(content)
    except (ET.ParseError, ValueError):
        if not isinstance(content, bytes):
            return []
        try:
            # mis-declared / undeclared non-UTF-8 bytes: salvage what
            # decodes rather than crash the Arrow batch
            root = ET.fromstring(content.decode("utf-8", errors="replace"))
        except (ET.ParseError, ValueError):
            return []
    kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(
        _localname(root.tag)
    )
    if kind is None:
        return []
    out: list[dict] = []
    for child in root:
        if _localname(child.tag) not in ("url", "sitemap"):
            continue
        entry: dict = {"kind": kind}
        for f in child:
            name = _localname(f.tag)
            if name in _ENTRY_FIELDS:
                entry[name] = (f.text or "").strip() or None
        if entry.get("loc") is None:
            continue
        p = entry.get("priority")
        if p is not None:
            try:
                entry["priority"] = float(p)
            except ValueError:
                entry["priority"] = None
        out.append(entry)
    return out


def sitemap_entries_udf():
    """Arrow-batched pandas UDF: sitemap document (str or gzip/plain
    bytes) -> array<struct> of entries. Built lazily so importing the
    module never needs an active SparkContext."""

    @F.pandas_udf(T.ArrayType(ENTRY_SCHEMA))
    def _entries(docs: pd.Series) -> pd.Series:
        return docs.map(
            lambda d: [] if d is None else [
                (
                    e["kind"],
                    e.get("loc"),
                    e.get("lastmod"),
                    e.get("changefreq"),
                    e.get("priority"),
                )
                for e in parse_sitemap(d)
            ]
        )

    return _entries


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Explode sitemap documents into one row per entry.

    Output columns: ``keep`` passthroughs + (kind, loc, lastmod,
    changefreq, priority). One Arrow batch pass + an explode — no
    shuffle; feed the result straight into canonicalize → seen
    anti-join (the ``sitemap_frontier`` battery query is the composed
    form)."""
    exploded = df.select(
        *keep, F.explode(sitemap_entries_udf()(F.col(xml_col))).alias("_e")
    )
    return exploded.select(*keep, "_e.*")


def sitemap_locs_native(xml: Column) -> Column:
    """Codegen path: array of <loc> values from well-formed
    uncompressed sitemap XML (regexp, no Python), unescaping the five
    XML entities a conforming sitemap may carry in a URL. Use when
    provenance guarantees shape; the pandas-UDF path is the tolerant
    default."""
    locs = F.regexp_extract_all(xml, F.lit("<loc>([^<]*)</loc>"), F.lit(1))

    def unescape(s: Column) -> Column:
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&apos;", "'"), ("&amp;", "&"),  # &amp; last: "&amp;lt;" is "&lt;"
        ):
            s = F.replace(s, F.lit(ent), F.lit(ch))
        return s

    return F.transform(locs, lambda s: unescape(F.trim(s)))
