"""URL canonicalization — Spark expression vs DuckDB rendering parity.

The canonicalizer is the seen-set key function (north rule): both
dialect renderings must agree byte-for-byte or the oracle comparison
(and any cross-engine resume) breaks.
"""

import duckdb
import pytest

from spatula_spark.urls import (
    canonicalize_url,
    canonicalize_url_duckdb,
    portable_hash64,
    portable_hash64_duckdb,
)

CASES = [
    ("http://Example.COM/a/b", "http://example.com/a/b"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a//b///c", "http://example.com/a/b/c"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("  http://example.com/a  ", "http://example.com/a"),
    (
        "HTTP://h0.Example.com:80/list/?z=9&a=1#x",
        "http://h0.example.com/list?a=1&z=9",
    ),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    return {
        r["url"]: r["canon"]
        for r in df.withColumn("canon", canonicalize_url("url")).collect()
    }


def test_spark_canonicalization(canon_rows):
    for raw, want in CASES:
        assert canon_rows[raw] == want, raw


def test_duckdb_rendering_matches_spark(canon_rows):
    con = duckdb.connect()
    expr = canonicalize_url_duckdb("url")
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [raw]
        ).fetchone()[0]
        assert got == want == canon_rows[raw], raw


def test_portable_hash_cross_engine(spark):
    vals = ["", "a", "http://example.com/x", "ünïcode ✓"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    from pyspark.sql import functions as F

    spark_hashes = {
        r["s"]: r["h"]
        for r in df.withColumn("h", portable_hash64(F.col("s"))).collect()
    }
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT {portable_hash64_duckdb('s')} FROM (SELECT ? AS s)", [v]
        ).fetchone()[0]
        assert duck == spark_hashes[v], v
        assert 0 <= duck < 2**60


def test_canonicalize_idempotent_and_parity_on_generated_urls(spark):
    """Combinatorial adversarial URLs: canonicalization must be
    IDEMPOTENT (canon(canon(u)) == canon(u) — the seen-set key must be
    a fixed point or re-crawls of emitted URLs double-fetch) and the
    DuckDB rendering must agree byte-for-byte on every one."""
    import itertools

    schemes = ["http", "HTTP", "https"]
    hosts = ["Example.com", "h0.example.COM"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/a//b/", "/x///y//", "/a/b/"]
    queries = ["", "?b=2&a=1", "?z=1", "?a=&b"]
    frags = ["", "#frag"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{f}"
        for s, h, po, pa, q, f in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    from pyspark.sql import functions as F

    rows = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    con = duckdb.connect()
    expr = canonicalize_url_duckdb("url")
    for r in rows:
        assert r["c1"] == r["c2"], f"not idempotent: {r['url']} -> {r['c1']} -> {r['c2']}"
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS url)", [r["url"]]
        ).fetchone()[0]
        assert got == r["c1"], f"dialect drift: {r['url']}: duck={got} spark={r['c1']}"
