"""Regression: 64-bit seen-set hashes must survive the hook-class
Arrow transform exactly.

The transform's output pandas frame used to coerce url_hash/seen_key
(int64 mixed with None) to float64, rounding away the low bits of any
|hash| > 2^53 — ~99% of xxhash64 values — so the seen set stored
MANGLED hashes while the frontier carried exact ones: every
cross-wave revisit of a hook-class page anti-join-missed and was
silently re-fetched (exactly-once F4 broken for hook specs on both
the driver fast path and the cluster path). engine.py _make_transform
now rebuilds those columns as exact nullable Int64.
"""

import json

from pyspark.sql import functions as F

from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
from spatula_spark.plans.pagespec import ChildPage, PageRegistry, PageSpec
from spatula_spark.urls import canonicalize_url, url_hash

BASE = "http://x.example.com"


def _registry() -> PageRegistry:
    from spatula_spark.operators.selectors import CSS

    reg = PageRegistry()

    def follow(ctx):
        out = []
        for a in CSS("a").match(ctx.root):
            href = a.get("href")
            cls = "Detail" if "/d/" in href else "Lst"
            out.append(ChildPage(cls, {}, source=href))
        return out

    reg.register(PageSpec(name="Lst", process_page=follow))
    reg.register(PageSpec(name="Detail",
                          process_page=lambda ctx: dict(ctx.json)))
    return reg


def _store(spark, tmp_path):
    # list1 -> (detail/x, list2); list2 -> detail/x AGAIN (cross-wave
    # revisit: detail/x is fetched in wave 1, re-emitted in wave 2)
    rows = [
        (f"{BASE}/list1", "x.example.com", "list", 200, "html",
         (f'<a href="{BASE}/d/x">x</a><a href="{BASE}/list2">n</a>'
          ).encode(), None, None, None, 0),
        (f"{BASE}/list2", "x.example.com", "list", 200, "html",
         f'<a href="{BASE}/d/x">x</a>'.encode(), None, None, None, 0),
        (f"{BASE}/d/x", "x.example.com", "detail", 200, "json",
         json.dumps({"v": 1}).encode(), None, None, None, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, host string, kind string, status int, "
        "payload_kind string, payload binary, links array<string>, "
        "next_url string, image_id string, flaky_rejects int",
    ).withColumn("canon_url", canonicalize_url(F.col("url"))).withColumn(
        "url_hash", url_hash(F.col("canon_url"))
    )
    path = str(tmp_path / "store.parquet")
    df.write.parquet(path)
    return path


def _run(spark, store_path, **cfg):
    eng = CrawlEngine(
        spark, _registry(),
        page_store=spark.read.parquet(store_path),
        config=CrawlConfig(**cfg) if cfg else CrawlConfig(),
    )
    return eng, eng.crawl(
        [{"page_cls": "Lst", "url": f"{BASE}/list1", "input": None}]
    )


def test_seen_hashes_exact_and_revisit_fetched_once(spark, tmp_path):
    store = _store(spark, tmp_path)
    eng, res = _run(spark, store)
    # exactly-once: 3 distinct pages -> exactly 3 fetches ever, even
    # though detail/x is emitted by both list pages in different waves
    assert int(res.metrics["fetched"].sum()) == 3
    assert len(res.items()) == 1  # detail item emitted once
    seen = {r["url_hash"] for r in res.seen.collect()}
    exact = {r["url_hash"] for r in eng.page_store.collect()}
    assert seen == exact  # bit-exact, not float64-rounded


def test_seen_hashes_exact_cluster_path(spark, tmp_path):
    # driver_wave_max=0 disables the driver-landing fast path so the
    # same guarantee is pinned on the cluster (anti-join) dedup path
    store = _store(spark, tmp_path)
    eng, res = _run(spark, store, driver_wave_max=0)
    assert int(res.metrics["fetched"].sum()) == 3
    seen = {r["url_hash"] for r in res.seen.collect()}
    exact = {r["url_hash"] for r in eng.page_store.collect()}
    assert seen == exact
