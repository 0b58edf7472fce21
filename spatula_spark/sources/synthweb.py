"""Deterministic synthetic web: page-store + media + seeds + robots.

The reference fetches the live web through scrapelib
(``/root/reference/src/spatula/sources.py:42-52``); in this sandbox the
"web" is a generated page-store table so the fetch operator is an
equi-join (SURVEY.md §7.2). Everything is a **pure function of the row
index** — no RNG, no wall-clock — so any scale regenerates
bit-identically and any prefix of the 10^10-URL design point is
addressable (FIXTURES.md §6).

Graph shape (exercises every engine operator):

* ``H`` hosts ``h{k}.example.com``; host 0 is **hot** (``skew``× more
  pages) to exercise salted repartitioning.
* per host: a paginated chain of list pages
  ``/list?page={p}`` (pagination via ``next_url``), each linking
  ``details_per_list`` detail pages ``/detail/{j}`` as HTML anchors.
* every list page also cross-links detail 0 of the next host —
  guaranteed duplicate URLs across hosts => real seen-set work.
* detail pages carry a JSON payload ``{doc, image_id, caption}`` and an
  ``image_id`` FK into the media table (BASELINE.json input_hint).
* every 97th detail is flaky (rejects first 2 attempts — retry path),
  every 101st returns HTTP 500 (error-handling path), and robots
  disallows ``/detail/13`` paths on host 1 (robots path).

Page-store **generation is itself Spark-native**: URLs, link arrays and
HTML payloads are built from ``sequence``/``transform``/``concat``
column expressions over ``spark.range`` — the only Python in the whole
generator is the PNG encoder inside the media ``mapInPandas`` (and that
is the designated binary-payload stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.images import (
    average_phash,
    lossy_encode,
    png_encode,
    synth_pixels,
)
from ..urls import canonicalize_url, url_hash

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "krill lumen maple nadir onyx prism quartz rune sable tundra"
).split()


def caption_for(g: int) -> str:
    """Deterministic caption for media row ``g`` (exact-equality invariant)."""
    w = [_WORDS[(g * 7 + i * 13) % len(_WORDS)] for i in range(4)]
    return f"image {g}: {' '.join(w)}"


def host_name(k: int) -> str:
    return f"h{k}.example.com"


def _host_offsets(n_hosts: int, details_per_host: int, skew: int) -> list[int]:
    """Cumulative global offsets; host 0 holds ``skew``× the base count."""
    counts = [details_per_host * (skew if k == 0 else 1) for k in range(n_hosts)]
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    return offsets


class SynthWeb:
    def __init__(
        self,
        n_hosts: int = 4,
        details_per_host: int = 25,
        details_per_list: int = 5,
        skew: int = 4,
        with_flaky: bool = True,
        with_errors: bool = True,
    ):
        self.n_hosts = n_hosts
        self.details_per_host = details_per_host
        self.details_per_list = details_per_list
        self.skew = skew
        self.with_flaky = with_flaky
        self.with_errors = with_errors
        self.offsets = _host_offsets(n_hosts, details_per_host, skew)
        self.n_media = self.offsets[-1]

    # ------------------------------------------------------------ media
    def media(self, spark: SparkSession) -> DataFrame:
        """The input_hint table: (image_id, bytes, w, h, fmt, caption,
        phash). Even rows PNG (lossless), odd rows the stub lossy codec
        (see functions/images.py)."""

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for g in pdf["id"].tolist():
                    g = int(g)
                    w, h = 16 + (g * 5) % 49, 16 + (g * 7) % 49
                    px = synth_pixels(g, w, h)
                    if g % 2 == 0:
                        fmt, data = "png", png_encode(px)
                        ph = average_phash(px)
                    else:
                        fmt, data = "jpeg", lossy_encode(px)
                        # phash of the *stored* (lossy) pixels, like a real
                        # pipeline hashing what it ingested
                        from ..functions.images import png_decode

                        ph = average_phash(png_decode(data))
                    rows.append(
                        (f"img-{g:08d}", data, w, h, fmt, caption_for(g), ph)
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                             "phash"],
                )

        return spark.range(self.n_media).mapInPandas(
            gen,
            schema="image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )

    # -------------------------------------------------------- page store
    def page_store(self, spark: SparkSession) -> DataFrame:
        """Detail + list pages as one DataFrame, PAGE_STORE_SCHEMA."""
        details = self._detail_pages(spark)
        lists = self._list_pages(spark)
        store = details.unionByName(lists)
        return (
            store.withColumn("canon_url", canonicalize_url(F.col("url")))
            .withColumn("url_hash", url_hash(F.col("canon_url")))
        )

    def page_store_with_media(
        self, spark: SparkSession, media: DataFrame | None = None
    ) -> DataFrame:
        """Page store whose detail payloads ARE the encoded image bytes
        (payload_kind 'bin') — the full-pipeline variant where the crawl
        decodes + verifies as it ingests (north-star shape)."""
        if media is None:
            media = self.media(spark)
        details = self._detail_pages(spark).drop("payload", "payload_kind")
        details = details.join(
            media.select(
                "image_id", F.col("bytes").alias("payload"),
                F.col("fmt").alias("_fmt"),
            ),
            "image_id",
            "left",
        ).withColumn("payload_kind", F.concat(F.lit("img/"), F.col("_fmt")))
        details = details.drop("_fmt").select(
            "url", "host", "kind", "status", "payload_kind", "payload",
            "links", "next_url", "image_id", "flaky_rejects",
        )
        lists = self._list_pages(spark)
        store = details.unionByName(lists)
        return (
            store.withColumn("canon_url", canonicalize_url(F.col("url")))
            .withColumn("url_hash", url_hash(F.col("canon_url")))
        )

    def _host_col(self, k: F.Column) -> F.Column:
        return F.concat(F.lit("h"), k.cast("string"), F.lit(".example.com"))

    def _detail_pages(self, spark: SparkSession) -> DataFrame:
        # one row per (host k, local detail j); global id g = offset_k + j
        hosts = spark.createDataFrame(
            [(k, self.offsets[k], self.offsets[k + 1] - self.offsets[k])
             for k in range(self.n_hosts)],
            "k int, off long, cnt long",
        )
        d = hosts.select(
            "k", "off", F.explode(F.sequence(F.lit(0), F.col("cnt") - 1)).alias("j")
        ).withColumn("g", F.col("off") + F.col("j"))
        host = self._host_col(F.col("k"))
        url = F.concat(F.lit("http://"), host, F.lit("/detail/"),
                       F.col("j").cast("string"))
        image_id = F.concat(F.lit("img-"), F.lpad(F.col("g").cast("string"), 8, "0"))
        payload = F.to_json(
            F.struct(
                F.col("g").alias("doc"),
                image_id.alias("image_id"),
                F.lit(None).cast("string").alias("caption"),
            )
        )
        status = (
            F.when((F.col("j") % 101 == 100) & F.lit(self.with_errors), 500)
            .otherwise(200)
        )
        flaky = (
            F.when((F.col("j") % 97 == 96) & F.lit(self.with_flaky), 2)
            .otherwise(0)
        )
        return d.select(
            url.alias("url"),
            host.alias("host"),
            F.lit("detail").alias("kind"),
            status.cast("int").alias("status"),
            F.lit("json").alias("payload_kind"),
            payload.cast("binary").alias("payload"),
            F.lit(None).cast("array<string>").alias("links"),
            F.lit(None).cast("string").alias("next_url"),
            image_id.alias("image_id"),
            flaky.cast("int").alias("flaky_rejects"),
        )

    def _list_pages(self, spark: SparkSession) -> DataFrame:
        per = self.details_per_list
        hosts = spark.createDataFrame(
            [(k, self.offsets[k + 1] - self.offsets[k]) for k in range(self.n_hosts)],
            "k int, cnt long",
        )
        pages = hosts.select(
            "k", "cnt",
            F.explode(
                F.sequence(F.lit(0), ((F.col("cnt") - 1) / per).cast("long"))
            ).alias("p"),
        )
        host = self._host_col(F.col("k"))
        base = F.concat(F.lit("http://"), host)
        lo = F.col("p") * per
        hi = F.least(lo + per - 1, F.col("cnt") - 1)
        own_links = F.transform(
            F.sequence(lo, hi),
            lambda j: F.concat(base, F.lit("/detail/"), j.cast("string")),
        )
        # cross-host duplicate link (seen-set exercise): detail 0 of next host
        cross = F.concat(
            F.lit("http://"),
            self._host_col((F.col("k") + 1) % self.n_hosts),
            F.lit("/detail/0"),
        )
        links = F.concat(own_links, F.array(cross))
        # HTML payload built natively: anchors joined into a body
        anchors = F.aggregate(
            links,
            F.lit(""),
            lambda acc, u: F.concat(
                acc, F.lit('<li><a class="d" href="'), u, F.lit('">x</a></li>')
            ),
        )
        payload = F.concat(
            F.lit("<html><body><ul>"), anchors, F.lit("</ul></body></html>")
        )
        has_next = (F.col("p") + 1) * per < F.col("cnt")
        next_url = F.when(
            has_next,
            F.concat(base, F.lit("/list?page="), (F.col("p") + 1).cast("string")),
        )
        url = F.concat(base, F.lit("/list?page="), F.col("p").cast("string"))
        return pages.select(
            url.alias("url"),
            host.alias("host"),
            F.lit("list").alias("kind"),
            F.lit(200).alias("status"),
            F.lit("html").alias("payload_kind"),
            payload.cast("binary").alias("payload"),
            links.alias("links"),
            next_url.cast("string").alias("next_url"),
            F.lit(None).cast("string").alias("image_id"),
            F.lit(0).alias("flaky_rejects"),
        )

    # ------------------------------------------------------------- seeds
    def seeds(self) -> list[dict]:
        """One seed per host root list page (multi-seed union,
        reference ``cli.py:143-154,424``)."""
        return [
            {
                "page_cls": "MediaListPage",
                "url": f"http://{host_name(k)}/list?page=0",
                "priority": 0,
                "seq": k,
            }
            for k in range(self.n_hosts)
        ]

    def robots(self, spark: SparkSession) -> DataFrame:
        """Disallow /detail/13* on host 1 (north-rule robots mandate)."""
        rows = [(host_name(1), "/detail/13", False)] if self.n_hosts > 1 else []
        return spark.createDataFrame(
            rows, "host string, path_prefix string, allow boolean"
        )


def expected_detail_urls(web: SynthWeb) -> set[str]:
    """Closed-form reachable detail URL set (test oracle)."""
    out = set()
    for k in range(web.n_hosts):
        cnt = web.offsets[k + 1] - web.offsets[k]
        for j in range(cnt):
            out.add(f"http://{host_name(k)}/detail/{j}")
    return out
