"""The flagship crawl: image+caption harvesting over the synthetic web.

This is the north-rule pipeline: a paginated list->detail crawl
(reference EmployeeList->EmployeeDetail shape,
``/root/reference/docs/scraper-basics.md:149-209``) whose page
transforms are **100% native Catalyst expressions** — between the Arrow
boundary of the final pixel-verification UDF and the parquet scan,
nothing runs in Python:

* ``MediaListPage``: children = ``posexplode`` of the page's link
  array (the native analog of ``SimilarLink`` extraction — the store
  materializes absolutized hrefs like the reference's lxml
  ``make_links_absolute``, pages.py:343-344); pagination from the
  ``next_url`` column (``get_next_source``, pages.py:318-324).
* ``MediaDetailPage``: item = the page's JSON payload; flaky
  responses retried via the native accept predicate
  ``attempts >= flaky_rejects`` (retry loop, pages.py:168-195);
  HTTP 500s handled (process_error_response, pages.py:298-304).

``verify_media`` then joins items against the media table and runs the
mandated per-row invariant (decoded-pixel allclose / PSNR>=40dB +
caption equality, BASELINE.json input_hint) in one Arrow-batched
``mapInPandas`` — the only stage allowed to touch ``bytes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.images import VERIFY_SCHEMA, decode_verify_iter
from .pagespec import PageRegistry, PageSpec


def _list_native(ok: DataFrame) -> DataFrame:
    children = ok.select(
        F.posexplode(F.col("links")).alias("pos", "child_url"),
        "page_cls", "path", "priority", "page_seq", "input_json",
    ).select(
        F.lit("child").alias("emit_kind"),
        F.col("page_cls").alias("src_cls"),
        F.concat(
            F.col("path"), F.lit(schemas.SLOT_CHILD),
            F.lower(F.lpad(F.hex(F.col("pos")), 8, "0")),
        ).alias("path"),
        F.lit(None).cast("string").alias("item_json"),
        F.lit("MediaDetailPage").alias("child_cls"),
        F.col("child_url"),
        F.lit(None).cast("string").alias("child_input_json"),
        F.col("priority"),
        F.lit(0).alias("page_seq"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("error"),
    )
    nexts = ok.filter(F.col("next_url").isNotNull()).select(
        F.lit("next").alias("emit_kind"),
        F.col("page_cls").alias("src_cls"),
        F.concat(
            F.col("path"), F.lit(schemas.SLOT_PAGINATION),
            F.lower(F.lpad(F.hex(F.col("page_seq") + 1), 8, "0")),
        ).alias("path"),
        F.lit(None).cast("string").alias("item_json"),
        F.col("page_cls").alias("child_cls"),
        F.col("next_url").alias("child_url"),
        F.col("input_json").alias("child_input_json"),
        F.col("priority"),
        (F.col("page_seq") + 1).cast("int").alias("page_seq"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("error"),
    )
    return children.unionByName(nexts)


def _detail_native(ok: DataFrame) -> DataFrame:
    # item = the JSON payload enriched with url; stays native via
    # string/JSON expressions (no from_json->to_json roundtrip needed:
    # payload is already canonical JSON from the store)
    return ok.select(
        F.lit("item").alias("emit_kind"),
        F.col("page_cls").alias("src_cls"),
        F.concat(
            F.col("path"), F.lit(schemas.SLOT_CHILD), F.lit("00000000")
        ).alias("path"),
        F.to_json(
            F.struct(
                F.get_json_object(F.col("payload").cast("string"), "$.doc")
                .cast("long").alias("doc"),
                F.col("image_id"),
                F.col("url"),
            )
        ).alias("item_json"),
        F.lit(None).cast("string").alias("child_cls"),
        F.lit(None).cast("string").alias("child_url"),
        F.lit(None).cast("string").alias("child_input_json"),
        F.col("priority"),
        F.col("page_seq"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("error"),
    )


def media_registry() -> PageRegistry:
    reg = PageRegistry()
    reg.register(PageSpec(name="MediaListPage", native_emissions=_list_native))
    reg.register(
        PageSpec(
            name="MediaDetailPage",
            native_emissions=_detail_native,
            accept_expr="attempts >= flaky_rejects",
            retries=2,
            handles_errors=True,
        )
    )
    return reg


def crawl_items_df(results: DataFrame) -> DataFrame:
    """Typed view of the flagship crawl's item stream (native)."""
    return results.filter(F.col("page_cls") == "MediaDetailPage").select(
        "path",
        F.get_json_object("item_json", "$.doc").cast("long").alias("doc"),
        F.get_json_object("item_json", "$.image_id").alias("image_id"),
        F.get_json_object("item_json", "$.url").alias("url"),
        "wave",
    )


def verify_media(items: DataFrame, media: DataFrame) -> DataFrame:
    """Per-row media invariant (BASELINE.json input_hint): join crawled
    items to the media table on image_id, decode bytes, check pixel
    allclose / PSNR>=40dB + phash; caption equality is checked by the
    caller against the expected caption function. The join shuffles on
    image_id; ``bytes`` is projected only here."""
    joined = items.select("image_id").distinct().join(
        media, "image_id", "inner"
    ).withColumn(
        "img_idx", F.substring("image_id", 5, 8).cast("int")
    ).select("image_id", "bytes", "w", "h", "fmt", "caption", "phash", "img_idx")
    return joined.mapInPandas(decode_verify_iter, VERIFY_SCHEMA)
