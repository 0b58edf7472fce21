"""Spark-free unit tests: images, filters, parsers, selectors.

Golden values mirror the reference suite
(/root/reference/tests/test_selectors.py, tests/test_pages.py,
tests/test_utils.py).
"""

import numpy as np
import pytest

from spatula_spark.functions.images import (
    average_phash,
    lossy_encode,
    png_decode,
    png_encode,
    psnr,
    synth_pixels,
)
from spatula_spark.operators.parsers import (
    element_text,
    parse_csv,
    parse_html,
    parse_json,
    parse_xml,
)
from spatula_spark.operators.seen import BloomFilter, CuckooFilter
from spatula_spark.operators.selectors import (
    CSS,
    SelectorError,
    SimilarLink,
    XPath,
)
from spatula_spark.plans.pagespec import obj_to_dict


# ------------------------------------------------------------------ images
def test_png_roundtrip_exact():
    px = synth_pixels(3, 40, 25)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_lossy_psnr_above_gate():
    px = synth_pixels(11, 32, 32)
    dec = png_decode(lossy_encode(px))
    assert not np.array_equal(dec, px)  # genuinely lossy
    assert psnr(dec, px) >= 40.0  # BASELINE.json input_hint invariant


def test_phash_stability_and_sensitivity():
    px = synth_pixels(5, 48, 48)
    assert average_phash(px) == average_phash(px.copy())
    other = synth_pixels(6, 48, 48)
    assert average_phash(px) != average_phash(other)


def test_synth_pixels_deterministic():
    assert np.array_equal(synth_pixels(9, 20, 20), synth_pixels(9, 20, 20))


# ----------------------------------------------------------------- filters
def test_bloom_no_false_negatives_low_fpr():
    keys = np.arange(1, 20001, dtype=np.int64) * 982451653
    bf = BloomFilter(40000, 1e-3)
    bf.add(keys)
    assert bf.contains(keys).all()
    probes = np.arange(10**6, 10**6 + 20000, dtype=np.int64) * 31
    assert bf.contains(probes).mean() < 5e-3


def test_bloom_union_associative():
    a, b = BloomFilter(1000, 1e-3), BloomFilter(1000, 1e-3)
    k1 = np.arange(100, dtype=np.int64)
    k2 = np.arange(100, 200, dtype=np.int64)
    a.add(k1)
    b.add(k2)
    u = a.union(b)
    assert u.contains(k1).all() and u.contains(k2).all()


def test_bloom_serialization_roundtrip():
    bf = BloomFilter(1000, 1e-3)
    bf.add(np.arange(500, dtype=np.int64))
    bf2 = BloomFilter(1000, 1e-3, bits=bf.to_bytes())
    assert bf2.contains(np.arange(500, dtype=np.int64)).all()


def test_cuckoo_insert_lookup_delete():
    keys = np.arange(1, 5001, dtype=np.int64) * 7919
    cf = CuckooFilter(10000)
    cf.add(keys)
    assert cf.contains(keys).all()
    deleted = cf.delete(keys[:500])
    assert deleted.all()
    # deletion is real (modulo fingerprint collisions)
    assert cf.contains(keys[:500]).mean() < 0.05
    assert cf.contains(keys[500:]).all()
    rt = CuckooFilter.from_bytes(cf.to_bytes())
    assert rt.contains(keys[500:]).all()


# ----------------------------------------------------------------- parsers
HTML = (
    b'<html><body><a href="/one">1</a>'
    b'<a href="https://example.com/two">2</a>'
    b'<a href="/one">dup</a></body></html>'
)


def test_html_links_absolutized():
    # reference HtmlPage.postprocess_response golden
    # (tests/test_pages.py:30-41)
    root = parse_html(HTML, base_url="https://example.com/base/")
    hrefs = [a.get("href") for a in root.iter("a")]
    assert hrefs == [
        "https://example.com/one",
        "https://example.com/two",
        "https://example.com/one",
    ]


def test_xml_parse():
    root = parse_xml(b"<r><x>1</x><x>2</x></r>")
    assert [e.text for e in root.iter("x")] == ["1", "2"]


def test_json_parse():
    assert parse_json(b'{"a": 1}') == {"a": 1}


def test_csv_all_string_dicts():
    # reference CsvListPage golden (tests/test_pages.py:68-74)
    rows = parse_csv("a,b,c\n1,2,3\n4,5,6\n")
    assert rows == [
        {"a": "1", "b": "2", "c": "3"},
        {"a": "4", "b": "5", "c": "6"},
    ]


# --------------------------------------------------------------- selectors
LIST_HTML = (
    "<html><body><ul>"
    '<li class="x">one</li><li class="x">two</li><li>three</li>'
    '</ul><a href="https://a/1">a</a><a href="http://b/2">b</a>'
    '<a href="https://a/1">dup</a></body></html>'
)


def _root():
    return parse_html(LIST_HTML)


def test_selector_cardinality_errors():
    # reference tests/test_selectors.py:25-77
    with pytest.raises(SelectorError):
        CSS("li").match(_root(), num_items=2)
    with pytest.raises(SelectorError):
        CSS("li").match(_root(), min_items=4)
    with pytest.raises(SelectorError):
        CSS("li").match(_root(), max_items=2)
    assert len(CSS("li").match(_root(), num_items=3)) == 3


def test_match_one():
    with pytest.raises(SelectorError):
        CSS("li").match_one(_root())
    el = CSS("li.x").match(_root(), min_items=1, max_items=2)[0]
    assert element_text(el) == "one"


def test_css_class_filter():
    assert [element_text(e) for e in CSS("li.x").match(_root())] == [
        "one", "two",
    ]


def test_xpath():
    assert [element_text(e) for e in XPath("//li").match(_root())] == [
        "one", "two", "three",
    ]


def test_xpath_text_and_attr_values():
    # lxml value forms: //b/text() -> strings; //a/@href -> attr values
    g = _g()
    assert XPath("//b/text()").match(g) == ["one", "two"]
    assert XPath("//a/@href").match(g) == [
        "https://x.test/page", "http://y.test/other.pdf",
    ]
    assert XPath("//li[@lang='en-US']/@data-k").match(g) == ["v-w"]
    # text() includes child tails (lxml direct-text-node semantics)
    frag = parse_html("<div><p>pre <b>mid</b> post</p></div>")
    assert XPath("//p/text()").match(frag) == ["pre ", " post"]


def test_xpath_function_predicates():
    """lxml-style function predicates on the final step: contains /
    starts-with / ends-with over @attr, text(), or . — plus not(@a) —
    composable and usable under /@attr and /text() value forms."""
    g = _g()
    assert XPath("//a[contains(@href, '.pdf')]/@href").match(g) == [
        "http://y.test/other.pdf",
    ]
    assert XPath("//a[starts-with(@href, 'https')]/@href").match(g) == [
        "https://x.test/page",
    ]
    assert XPath("//a[ends-with(@href, '.pdf')]/@href").match(g) == [
        "http://y.test/other.pdf",
    ]
    assert [element_text(e) for e in
            XPath("//li[not(@class)][not(@lang)]").match(g)] == ["3", "5"]
    assert [element_text(e)
            for e in XPath("//li[contains(text(), '4')]").match(g)] == ["4"]
    frag = parse_html("<div><p>pre <b>mid</b> post</p></div>")
    assert [element_text(e)
            for e in XPath("//p[contains(., 'mid')]").match(frag)] == [
        "pre mid post",
    ]


@pytest.mark.parametrize("xp,expected", [
    # positional predicates — [k] counts within EACH context (ul/li[1]
    # = first li of every ul), last()/position() arithmetic
    ("//li[1]", ["1"]),
    ("//li[last()]", ["5"]),
    ("//li[last()-1]", ["4"]),
    ("//li[position()>=4]", ["4", "5"]),
    ("//ul/li[2]", ["2"]),
    # predicates on a NON-final step (the round-2 gap)
    ("//div[@id='main']/ul/li[@class]", ["1", "2"]),
    ("//div[contains(@class,'wrap')][2]/p", ["tail two"]),
    ("//div[1]//b", ["one"]),
    # mid-path // and absolute paths from the fragment root
    ("//div[@id='main']//b", ["one"]),
    ("/html//span", ["s"]),
    # boolean algebra across several predicates
    ("//li[@data-k and @lang]", ["4"]),
    ("//li[@class or @lang]", ["1", "2", "4"]),
    ("//li[not(@class) and not(@lang)]", ["3", "5"]),
    # value comparisons (string-value and attributes)
    ("//li[.='3']", ["3"]),
    ("//a[@href='https://x.test/page']", ["A"]),
    # relative-path predicates: existence, nested value, count()
    ("//div[p][span]", ["tail twos"]),
    ("//div[p/b='two']/span", ["s"]),
    ("//ul[count(li)=5]/li[1]", ["1"]),
    # axes
    ("//b/parent::p", ["intro one", "tail two"]),
    ("//b/..", ["intro one", "tail two"]),
    ("//span/preceding-sibling::p", ["tail two"]),
    ("//p/following-sibling::span", ["s"]),
    ("//li[@lang]/ancestor::div", ["intro one12345AB"]),
    ("//li[3]/following-sibling::li", ["4", "5"]),
    ("//li[3]/preceding-sibling::li[1]", ["2"]),  # proximity order
    # union: document order, deduplicated
    ("//p | //span", ["intro one", "tail two", "s"]),
    ("//li[1] | //li[@class] | //li[last()]", ["1", "2", "5"]),
    # string functions on any step
    ("//li[starts-with(@data-k, 'v')]", ["4"]),
    ("//p[normalize-space()='tail two']", ["tail two"]),
    ("//li[string-length(.)=1][2]", ["2"]),
    # text() as a location step mid-expression
    ("//p/text()", ["intro ", "tail "]),
    # //p[1] = first p of EACH parent (true XPath, both divs match)
    ("//p[1]/b/text()", ["one", "two"]),
    # (path)[k] = global position over the whole result set
    ("(//p)[1]", ["intro one"]),
    ("(//p)[last()]", ["tail two"]),
    ("(//li)[3]", ["3"]),
    ("(//div)[2]/p", ["tail two"]),
    ("(//p | //span)[2]", ["tail two"]),
])
def test_xpath_grammar(xp, expected):
    """The expanded-grammar table the round-2 verdict asked for —
    per-step predicates, positions, axes, unions, mid-path // —
    mirroring lxml XPath behavior (reference selectors.py:88-112)."""
    got = [
        r if isinstance(r, str) else element_text(r)
        for r in XPath(xp).match(_g(), min_items=0)
    ]
    assert got == expected, (xp, got)


def test_xpath_syntax_error_fails_fast():
    with pytest.raises(ValueError):
        XPath("//li[@class=]")
    with pytest.raises(ValueError):
        XPath("//li[foo(@a)]")


GRAMMAR_HTML = (
    "<html><body>"
    '<div id="main" class="wrap outer">'
    '<p class="first">intro <b>one</b></p>'
    "<ul>"
    '<li class="x a">1</li><li class="x">2</li><li>3</li>'
    '<li data-k="v-w" lang="en-US">4</li><li>5</li>'
    "</ul>"
    '<a href="https://x.test/page">A</a>'
    '<a href="http://y.test/other.pdf">B</a>'
    "</div>"
    '<div class="wrap"><p>tail <b>two</b></p><span>s</span></div>'
    "</body></html>"
)


def _g():
    return parse_html(GRAMMAR_HTML)


@pytest.mark.parametrize("sel,expected", [
    # reference tests/test_selectors.py:89-92 shape: ".first b"
    (".first b", ["one"]),
    ("div > p", ["intro one", "tail two"]),          # child combinator
    ("ul > li.x", ["1", "2"]),
    ("li.x + li", ["2", "3"]),                       # adjacent sibling
    ("li.x ~ li", ["2", "3", "4", "5"]),             # general sibling
    ("p + ul > li:first-child", ["1"]),
    ("li:first-child", ["1"]),
    ("li:last-child", ["5"]),
    ("li:nth-child(2)", ["2"]),
    ("li:nth-child(odd)", ["1", "3", "5"]),
    ("li:nth-child(even)", ["2", "4"]),
    ("li:nth-child(2n+1)", ["1", "3", "5"]),
    ("li:nth-child(n+4)", ["4", "5"]),
    ("a[href^='https']", ["A"]),                     # attr operators
    ("a[href$='.pdf']", ["B"]),
    ("a[href*='y.test']", ["B"]),
    ("div[class~='outer'] p", ["intro one"]),
    ("li[lang|='en']", ["4"]),
    ("li[data-k=v-w]", ["4"]),
    ("p, span", ["intro one", "tail two", "s"]),     # list, doc order
    ("li.a, li:last-child, li.a", ["1", "5"]),       # dedup
    ("#main .first", ["intro one"]),
    ("*[id]", ["intro one12345AB"]),                 # div#main subtree text
    ("div.wrap.outer > ul li", ["1", "2", "3", "4", "5"]),
    ("li:not(.x)", ["3", "4", "5"]),                 # negation
    ("li:not([lang])", ["1", "2", "3", "5"]),
    ("ul > li:only-child", []),
    ("li:nth-of-type(2)", ["2"]),
    ("a:first-of-type", ["A"]),
    ("a:last-of-type", ["B"]),
    ("li:nth-last-child(1)", ["5"]),                 # counted from end
    ("li:nth-last-child(2)", ["4"]),
    ("li:nth-last-child(odd)", ["1", "3", "5"]),
    ("a:nth-last-of-type(2)", ["A"]),
    ("li:not(:nth-last-child(1))", ["1", "2", "3", "4"]),
    (":root", ["intro one12345ABtail twos"]),        # the scope element
    (":root > body > div > span", ["s"]),
    ("a[href^='HTTPS' i]", ["A"]),                   # CSS4 ci flag
    ("li[lang='EN-us' i]", ["4"]),
    ("a[href^='HTTPS' s]", []),                      # explicit sensitive
    ("li[lang*='n-U' s]", ["4"]),
])
def test_css_grammar(sel, expected):
    got = [element_text(e) for e in CSS(sel).match(_g(), min_items=0)]
    assert got == expected, (sel, got)


def test_css_unsupported_raises():
    with pytest.raises(ValueError):
        CSS("li::before")
    with pytest.raises(ValueError):
        CSS("li:hover")


def test_selector_error_mentions_element():
    # reference parity: error text carries the element (selectors.py:57-71)
    with pytest.raises(SelectorError, match="on <ul"):
        CSS("li").match_one(_g().find(".//ul"))


def test_similar_link_first_wins_dedup():
    # reference selectors.py:136-144 + tests/test_selectors.py:99-101:
    # 2 of 3 https-ish links, first occurrence wins, order kept
    links = [
        e.get("href")
        for e in SimilarLink(r"https://").match(_root(), min_items=1)
    ]
    assert links == ["https://a/1"]
    links = [
        e.get("href") for e in SimilarLink(r"https?://").match(_root())
    ]
    assert links == ["https://a/1", "http://b/2"]


def test_dct_phash_properties():
    """DCT pHash: identical images hash equal; a lossy re-encode stays
    within a small hamming distance; a different image is far."""
    from spatula_spark.functions.images import dct_phash, lossy_encode, png_decode

    px = synth_pixels(7, 80, 60)
    h1 = dct_phash(px)
    assert dct_phash(px.copy()) == h1
    lossy = png_decode(lossy_encode(px))
    d_lossy = bin((h1 ^ dct_phash(lossy)) & (2**64 - 1)).count("1")
    assert d_lossy <= 10, d_lossy
    other = synth_pixels(1234, 80, 60)
    d_other = bin((h1 ^ dct_phash(other)) & (2**64 - 1)).count("1")
    assert d_other > 10, d_other


def test_jpeg_roundtrip_and_structure():
    """Real baseline JFIF codec: spec-structured stream (marker walk),
    roundtrip above the 40 dB invariant on the adversarial sawtooth
    images, deterministic decode, and graceful rejection of
    progressive/garbage streams."""
    from spatula_spark.functions.jpeg import jpeg_decode, jpeg_encode
    from spatula_spark.functions.images import psnr

    for idx, (w, h) in [(7, (80, 60)), (12, (33, 17)), (3, (8, 8))]:
        px = synth_pixels(idx, w, h)
        data = jpeg_encode(px, quality=98)
        # marker structure: SOI, JFIF APP0, 2x DQT, SOF0, 4x DHT, SOS, EOI
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
        assert data.count(b"\xff\xdb") >= 2
        assert b"\xff\xc0" in data and b"\xff\xda" in data
        assert data.count(b"\xff\xc4") >= 4
        out = jpeg_decode(data)
        assert out.shape == px.shape
        assert psnr(out, px) >= 40.0
        assert (jpeg_decode(data) == out).all()  # deterministic

    import pytest as _pytest

    with _pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")


def test_decode_image_magic_dispatch():
    """decode_image picks the codec from the payload magic, so 'jpeg'
    rows decode whether they carry real JFIF or the fast stand-in."""
    from spatula_spark.functions.images import (
        decode_image, lossy_encode, psnr,
    )

    px = synth_pixels(5, 40, 24)
    real = decode_image(lossy_encode(px, "jpeg"), "jpeg")
    fast = decode_image(lossy_encode(px, "fast"), "jpeg")
    assert psnr(real, px) >= 40.0
    assert psnr(fast, px) >= 40.0


def test_sharded_bloom_broadcast_bounded(spark):
    """Broadcast lifecycle (r1 verdict): one live broadcast, reused
    while the filter is unchanged, replaced (old unpersisted) only on
    change — a long crawl must not accrete stale blobs."""
    from spatula_spark.operators.seen import ShardedBloom

    sb = ShardedBloom(4, 1 << 12, 1e-3)
    df = spark.range(1000).selectExpr("xxhash64(id) AS url_hash")
    sb.add_hashes_df(df)
    sb.membership_udf(spark)
    sb.membership_udf(spark)  # unchanged -> reuse
    assert sb.broadcasts_created == 1
    first_bc = sb._bc
    sb.add_hashes_df(
        spark.range(1000, 1200).selectExpr("xxhash64(id) AS k"), key_col="k"
    )
    sb.membership_udf(spark)
    assert sb.broadcasts_created == 2
    assert sb._bc is not first_bc


def test_sharded_bloom_regrow_restores_fpr(spark):
    """Overfill degrades FPR geometrically; regrow (4x shards, rebuilt
    from the exact seen table) must restore it — long crawls cannot be
    allowed to silently degrade until 'maybe seen' filters nothing."""
    from pyspark.sql import functions as F

    from spatula_spark.operators.seen import ShardedBloom

    sb = ShardedBloom(2, 1 << 10, 1e-3)  # designed for 2,048 keys
    seen = spark.range(8192).select(F.xxhash64("id").alias("url_hash"))
    seen = seen.persist()
    sb.add_hashes_df(seen)  # 4x overfilled
    assert sb.fill_ratio() == pytest.approx(4.0)
    assert sb.estimated_fpr() > 0.05
    assert sb.needs_regrow()

    def measured_fpr():
        udf = sb.membership_udf(spark)
        probe = spark.range(10_000_000, 10_040_000).select(
            F.xxhash64("id").alias("url_hash")
        )
        hits = probe.select(udf("url_hash").alias("m")).filter("m").count()
        return hits / 40_000

    assert measured_fpr() > 0.05  # degraded for real, not just in theory
    sb.regrow(seen, key_col="url_hash")
    assert sb.regrows == 1
    assert sb.n_shards == 8
    assert sb.count == 8192  # nothing lost in the rebuild
    assert sb.fill_ratio() == pytest.approx(1.0)
    assert not sb.needs_regrow()
    # all original keys still maybe-seen (no false negatives ever)
    udf = sb.membership_udf(spark)
    n_true = seen.select(udf("url_hash").alias("m")).filter("m").count()
    assert n_true == 8192
    # FPR back near the design point (1e-3 target; allow sampling noise
    # and the fill=1.0 operating point)
    assert measured_fpr() < 0.01
    seen.unpersist()


# -------------------------------------------------------------- record norm
def test_obj_to_dict():
    # reference tests/test_utils.py:46-80
    from dataclasses import dataclass

    @dataclass
    class D:
        a: int
        b: str

    assert obj_to_dict({"x": 1}) == {"x": 1}
    assert obj_to_dict(D(1, "z")) == {"a": 1, "b": "z"}
    assert obj_to_dict(None) is None
    with pytest.raises(TypeError):
        obj_to_dict(object())


def test_display_reference_parity():
    """Reference tests/test_utils.py table: pformat for dict-able,
    str for scalars, '<tag id> @ line N' for parsed elements."""
    import pprint
    from dataclasses import dataclass

    from spatula_spark.operators.parsers import parse_html
    from spatula_spark.utils import display

    for data in ({}, {"a": 1, "b": ["x", "y", "z"]}):
        assert display(data) == pprint.pformat(data)
    for item, out in [
        ("some str", "some str"),
        (True, "True"),
        (None, "None"),
        (1234, "1234"),
    ]:
        assert display(item) == out

    @dataclass
    class Obj:
        a: int
        b: str

    assert display(Obj(1, "two")) == pprint.pformat({"a": 1, "b": "two"})

    cases = [
        ("<b>test</b>", "b", "<b> @ line 1"),
        ("<p id='p1'>test</p>", "p", "<p id='p1'> @ line 1"),
        ("<p class='styled'>test</p>", "p", "<p class='styled'> @ line 1"),
        ("<p id='p2' class='styled'>t</p>", "p", "<p id='p2'> @ line 1"),
        (
            "<p class='styled' data-elem='ignored'>t</p>",
            "p",
            "<p class='styled'> @ line 1",
        ),
    ]
    for html, tag, want in cases:
        root = parse_html(html)  # single-element docs unwrap to the element
        el = root if root.tag == tag else root.find(f".//{tag}")
        assert display(el) == want

    # multi-line documents report the start-tag's line
    el = parse_html("<div>\n<span>x</span>\n<p id='late'>y</p></div>").find(
        ".//p"
    )
    assert display(el) == "<p id='late'> @ line 3"


def test_unsupported_documents_raise_typed_errors():
    """Dead-letter contract (VERDICT r3): unsupported document shapes
    raise UnsupportedDocumentError with a reason instead of returning
    silent empty parses; genuinely-empty shapes still parse to empty."""
    from spatula_spark.operators.parsers import (
        UnsupportedDocumentError,
        parse_excel,
        parse_html,
        parse_pdf,
    )

    # PDF: text hidden behind an unsupported filter -> typed error
    lzw_pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /LZWDecode /Length 8 >>\n"
        b"stream\n\x80\x0b\x60P\x22\x0c\x0c\x85\nendstream\nendobj\n"
    )
    with pytest.raises(UnsupportedDocumentError, match="LZWDecode"):
        parse_pdf(lzw_pdf)

    # PDF: encrypted -> typed error
    from fixtures_binary import make_pdf

    good = make_pdf(b"BT (hi) Tj ET")
    with pytest.raises(UnsupportedDocumentError, match="encrypted"):
        parse_pdf(good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"))

    # PDF: image-only streams are NOT an error (pdftotext yields '')
    img_pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Filter /DCTDecode "
        b"/Length 4 >>\nstream\n\xff\xd8\xff\xd9\nendstream\nendobj\n"
    )
    assert parse_pdf(img_pdf) == ""

    # xlsx: not a zip -> typed error
    with pytest.raises(UnsupportedDocumentError, match="not a zip"):
        parse_excel(b"this is not an xlsx file")

    # HTML: declared charset honored; unknown charset -> typed error
    root = parse_html(
        "<html><head><meta charset=iso-8859-1></head>"
        "<body><p>caf\xe9</p></body></html>".encode("latin-1")
    )
    assert "café" in "".join(root.itertext())
    with pytest.raises(UnsupportedDocumentError, match="no-such-enc"):
        parse_html(b'<meta charset="no-such-enc"><p>x</p>')


def test_pagectx_xml_json_parse_errors_are_typed():
    """The PageCtx lazy-parse properties re-raise stdlib parse failures
    as UnsupportedDocumentError so the engine dead-letters them."""
    from spatula_spark.operators.parsers import UnsupportedDocumentError
    from spatula_spark.plans.pagespec import PageCtx

    def ctx(kind, payload):
        return PageCtx(
            input=None, url="http://x.example/a", status=200,
            payload=payload, links=None, next_url=None, attempts=0,
            page_seq=0, payload_kind=kind, image_id=None,
        )

    with pytest.raises(UnsupportedDocumentError, match="xml:"):
        ctx("xml", b"<a><b></a>").root
    with pytest.raises(UnsupportedDocumentError, match="json:"):
        ctx("json", b"{not json").json
    assert ctx("json", b'{"k": 1}').json == {"k": 1}
