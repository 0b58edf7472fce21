"""Sitemap ingestion, spider-trap detection, feature-hash embedding.

Reference parity note: the reference has no sitemap/trap machinery
(its crawler is page-object-driven, one site at a time); these are
the frontier-seeding and abuse-control operators a 10^10-URL crawl
needs. Cross-engine value checks live in the oracle battery
(`sitemap_frontier`, `crawl_trap_hosts`, `caption_image_alignment`);
this file pins the Python/plan-level semantics.
"""

import gzip

import pytest
from pyspark.sql import functions as F

from spatula_spark.functions.text import feature_hash_embedding
from spatula_spark.operators.politeness import trap_hosts
from spatula_spark.operators.sitemaps import (
    parse_sitemap,
    sitemap_entries,
    sitemap_locs_native,
)

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://ex.com/a</loc><lastmod>2026-01-02</lastmod>"
    "<changefreq>daily</changefreq><priority>0.8</priority></url>"
    "<url><loc> https://ex.com/b </loc></url>"
    "<url><loc>https://ex.com/c?x=1&amp;y=2</loc></url>"
    "<url><lastmod>2026-01-03</lastmod></url>"  # no <loc>: dropped
    "</urlset>"
)

INDEX = (
    '<?xml version="1.0"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://ex.com/sitemap1.xml.gz</loc>"
    "<lastmod>2026-02-01</lastmod></sitemap>"
    "</sitemapindex>"
)


def test_parse_urlset_fields_and_whitespace():
    es = parse_sitemap(URLSET)
    assert [e["loc"] for e in es] == [
        "https://ex.com/a", "https://ex.com/b", "https://ex.com/c?x=1&y=2",
    ]
    assert es[0] == {
        "kind": "url",
        "loc": "https://ex.com/a",
        "lastmod": "2026-01-02",
        "changefreq": "daily",
        "priority": 0.8,
    }
    assert "lastmod" not in es[1]


def test_parse_sitemapindex_kind():
    es = parse_sitemap(INDEX)
    assert es == [
        {
            "kind": "sitemap",
            "loc": "https://ex.com/sitemap1.xml.gz",
            "lastmod": "2026-02-01",
        }
    ]


def test_parse_gzip_bytes_and_plain_bytes():
    assert parse_sitemap(gzip.compress(URLSET.encode()))[0]["loc"] == (
        "https://ex.com/a"
    )
    assert parse_sitemap(URLSET.encode())[1]["loc"] == "https://ex.com/b"


@pytest.mark.parametrize(
    "bad",
    [
        "<urlset><url><loc>x</loc>",  # truncated XML
        "<rss><item/></rss>",  # wrong root
        b"\x1f\x8b\x00garbage",  # gzip magic, corrupt stream
        "",
    ],
)
def test_parse_malformed_yields_no_entries(bad):
    assert parse_sitemap(bad) == []


def test_parse_bad_priority_is_null():
    xml = (
        "<urlset><url><loc>https://ex.com/c</loc>"
        "<priority>soon</priority></url></urlset>"
    )
    assert parse_sitemap(xml)[0]["priority"] is None


def test_sitemap_entries_dataframe_and_gzip_column(spark):
    df = spark.createDataFrame(
        [("s1", URLSET.encode()), ("s2", gzip.compress(INDEX.encode())),
         ("s3", b"not xml")],
        "sid string, xml binary",
    )
    rows = sitemap_entries(df, "xml", keep=("sid",)).collect()
    got = sorted((r["sid"], r["kind"], r["loc"]) for r in rows)
    assert got == [
        ("s1", "url", "https://ex.com/a"),
        ("s1", "url", "https://ex.com/b"),
        ("s1", "url", "https://ex.com/c?x=1&y=2"),
        ("s2", "sitemap", "https://ex.com/sitemap1.xml.gz"),
    ]


def test_sitemap_locs_native_matches_parser(spark):
    df = spark.createDataFrame([(URLSET,)], "xml string")
    [row] = df.select(sitemap_locs_native(F.col("xml")).alias("locs")).collect()
    assert row["locs"] == [e["loc"] for e in parse_sitemap(URLSET)]


def test_trap_hosts_flags_growth_and_sameness_only_together(spark):
    # host 0: geometric URL growth + constant content -> trap
    # host 1: same growth but fully distinct content -> big honest site
    # host 2: constant content but bounded growth -> mirror, not a trap
    rows = []
    for depth, n in [(1, 5), (2, 25), (3, 125)]:
        rows += [(0, depth, f"u0/{depth}/{i}", "same") for i in range(n)]
        rows += [(1, depth, f"u1/{depth}/{i}", f"c{depth}/{i}")
                 for i in range(n)]
    rows += [(2, d, f"u2/{d}/{i}", "same") for d in (1, 2, 3)
             for i in range(4)]
    crawl = spark.createDataFrame(
        rows, "host long, depth int, url string, content_fp string"
    )
    got = trap_hosts(crawl, growth_threshold=4.0, diversity_max=0.25)
    flagged = sorted((r["host"], r["depth"]) for r in got.collect())
    assert flagged == [(0, 2), (0, 3)]
    metrics = {
        (r["host"], r["depth"]): (r["growth"], r["diversity"])
        for r in got.collect()
    }
    assert metrics[(0, 2)] == (5.0, 0.04)


def test_feature_hash_embedding_exact_and_stateless(spark):
    df = spark.createDataFrame(
        [(["amber", "basalt", "amber"],), ([],)],
        "words array<string>",
    )
    a, b = df.select(
        feature_hash_embedding(F.col("words"), 8).alias("v")
    ).collect()
    assert len(a["v"]) == 8 and len(b["v"]) == 8
    # empty doc -> exact zero vector (no NaN/null leakage)
    assert b["v"] == [0.0] * 8
    # each token contributes exactly one ±1; repeated token doubles it
    assert sum(abs(x) for x in a["v"]) in (1.0, 3.0)
    # stateless: same input, same projection on a fresh plan
    [(a2,)] = spark.createDataFrame(
        [(["amber", "basalt", "amber"],)], "words array<string>"
    ).select(feature_hash_embedding(F.col("words"), 8)).collect()
    assert a2 == a["v"]


def test_recrawl_priority_ranks_changing_urls_first(spark):
    from datetime import datetime

    from spatula_spark.operators.recrawl import recrawl_priority

    def t(h):
        return datetime(2026, 1, 1, h)

    rows = []
    # churn: fingerprint changes on every fetch
    rows += [("u/churn", 0, t(h), f"v{h}") for h in range(0, 10)]
    # static: fetched just as often, never changes
    rows += [("u/static", 0, t(h), "same") for h in range(0, 10)]
    # fresh: single fetch at the very end (zero age -> zero score)
    rows += [("u/fresh", 0, t(10), "x")]
    hist = spark.createDataFrame(
        rows, "url string, host long, fetch_ts timestamp, content_fp string"
    )
    got = {r["url"]: r for r in recrawl_priority(hist, k=3).collect()}
    assert got["u/churn"]["n_changes"] == 9
    assert got["u/static"]["n_changes"] == 0
    assert got["u/churn"]["rn"] == 1  # stalest: high rate x same age
    assert got["u/fresh"]["score"] == 0.0  # age 0 -> nothing to refresh
    assert 0.0 < got["u/static"]["score"] < got["u/churn"]["score"]


# ---------------------------------------------------------------------------
# property: serialize -> parse round trip over adversarial URL content
# ---------------------------------------------------------------------------
from xml.sax.saxutils import escape as _xml_escape  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_URL_CHARS = st.text(
    alphabet=st.sampled_from(
        list("abcz09-._~:/?#[]@!$&'()*+,;=%<>\" \t") + ["é", "中"]
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_URL_CHARS, min_size=1, max_size=8), st.booleans())
def test_sitemap_serialize_parse_roundtrip(suffixes, gz):
    """Any loc content a generator can mint (entities, quotes, unicode,
    whitespace-free core) survives escape -> serialize -> (gzip) ->
    parse exactly — the property behind the sitemap_frontier oracle's
    lossless-round-trip claim."""
    locs = ["https://ex.com/" + s.strip() for s in suffixes]
    body = "".join(
        f"<url><loc>{_xml_escape(loc)}</loc></url>" for loc in locs
    )
    doc: bytes | str = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + body + "</urlset>"
    )
    if gz:
        doc = gzip.compress(doc.encode())
    got = [e["loc"] for e in parse_sitemap(doc)]
    # the parser strips surrounding whitespace (spec: loc is a URL) and
    # drops entries whose loc collapses to empty
    want = [u.strip() for u in locs if u.strip()]
    assert got == want


def test_parse_latin1_declared_bytes():
    doc = (
        '<?xml version="1.0" encoding="latin-1"?>'
        "<urlset><url><loc>http://ex.com/café</loc></url></urlset>"
    )
    assert parse_sitemap(doc.encode("latin-1")) == [
        {"kind": "url", "loc": "http://ex.com/café"}
    ]
