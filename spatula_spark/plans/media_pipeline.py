"""The flagship crawl: image+caption harvesting over the synthetic web.

This is the north-rule pipeline: a paginated list->detail crawl
(reference EmployeeList->EmployeeDetail shape,
``/root/reference/docs/scraper-basics.md:149-209``) whose page
transforms are **100% native Catalyst expressions** — between the Arrow
boundary of the final pixel-verification UDF and the parquet scan,
nothing runs in Python:

* ``MediaListPage``: children from the page's link array (the native
  analog of ``SimilarLink`` extraction — the store materializes
  absolutized hrefs like the reference's lxml ``make_links_absolute``,
  pages.py:343-344); pagination from ``next_url``
  (``get_next_source``, pages.py:318-324).
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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.images import VERIFY_SCHEMA, decode_verify_iter
from . import native as N
from .pagespec import PageRegistry, PageSpec


def _list_arr():
    return F.concat(
        N.children_from_links("MediaDetailPage"),
        N.paginate_if_next(),
    )


def _detail_arr():
    item_json = F.to_json(
        F.struct(
            F.get_json_object(F.col("payload").cast("string"), "$.doc")
            .cast("long").alias("doc"),
            F.col("image_id"),
            F.col("url"),
        )
    )
    return N.one(N.item_emission(item_json))


def media_registry() -> PageRegistry:
    reg = PageRegistry()
    reg.register(PageSpec(name="MediaListPage", native_emit_array=_list_arr))
    reg.register(
        PageSpec(
            name="MediaDetailPage",
            native_emit_array=_detail_arr,
            accept_expr="attempts >= flaky_rejects",
            retries=2,
            handles_errors=True,
        )
    )
    return reg


def _verify_detail(ctx):
    """Decode-as-you-ingest detail hook (runs Arrow-batched): decode
    the fetched image payload, verify the input_hint invariant inline
    (pixels allclose / PSNR>=40dB for lossy), emit phash."""
    import numpy as np

    from ..functions.images import (
        average_phash,
        dct_phash,
        decode_image,
        psnr,
        synth_pixels,
    )

    idx = int(ctx.image_id[4:])
    fmt = "png" if idx % 2 == 0 else "jpeg"
    px = decode_image(ctx.payload, fmt)
    ref = synth_pixels(idx, px.shape[1], px.shape[0])
    if fmt == "png":
        ok = bool(np.array_equal(px, ref))
    else:
        ok = bool(psnr(px, ref) >= 40.0)
    return {
        "image_id": ctx.image_id,
        "url": ctx.url,
        "phash": int(average_phash(px)),
        # the pipeline's emitted fingerprint for downstream near-dup
        # joins: the standard DCT pHash (robust to recompress/resize,
        # unlike the block-mean hash used for the store invariant)
        "fp": int(dct_phash(px)),
        "pixels_ok": ok,
    }


def media_verify_registry() -> PageRegistry:
    """Full-pipeline variant: detail payloads are image bytes
    (synthweb.page_store_with_media) and the detail transform decodes +
    verifies inline — fetch-join, scheduling, seen-set all identical,
    plus the mandated pixel work inside the wave."""
    reg = PageRegistry()
    reg.register(PageSpec(name="MediaListPage", native_emit_array=_list_arr))
    reg.register(
        PageSpec(
            name="MediaDetailPage",
            process_page=_verify_detail,
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
