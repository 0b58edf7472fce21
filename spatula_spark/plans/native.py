"""Native emission builders: page transforms as array<struct> columns.

The scale-critical inner loop. A page class whose semantics are
column-expressible registers ``native_emit_array`` — an expression that
maps ONE fetched batch row to an ``array<emission struct>`` (its items,
children, pagination). The engine concatenates the per-class arrays
under a ``CASE WHEN page_cls`` dispatch, prepends the fetched-marker,
and ``explode``s once:

    batch --(single projection, whole-stage codegen)--> emissions

One scan, zero unions, zero Python. The earlier design unioned one
DataFrame branch per class per outcome (error/retry/ok), which rescanned
the fetch join up to 7x per wave — measured as the wave-time floor.

Builders default the bookkeeping fields (src_cls, path, priority,
page_seq) from the batch row's columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import schemas

EMISSION_FIELDS = (
    ("emit_kind", "string"),
    ("src_cls", "string"),
    ("path", "string"),
    ("item_json", "string"),
    ("child_cls", "string"),
    ("child_url", "string"),
    ("child_input_json", "string"),
    ("priority", "int"),
    ("page_seq", "int"),
    ("attempts", "int"),
    ("error", "string"),
    ("url_hash", "bigint"),
    # page-identity key: xxhash64(page_cls, url_hash, input_json) — the
    # seen set and first-wins dedup key. The reference processes every
    # Page *instance*; scrapelib's cache only skips the HTTP call
    # (/root/reference/src/spatula/cli.py:91-93), so two classes/inputs
    # over one URL must both process. url_hash alone would collapse them.
    ("seen_key", "bigint"),
)

EMISSION_STRUCT_DDL = (
    "struct<" + ",".join(f"{n}:{t}" for n, t in EMISSION_FIELDS) + ">"
)
EMISSION_ARRAY_DDL = f"array<{EMISSION_STRUCT_DDL}>"


def emission(emit_kind: str | Column, **over) -> Column:
    """One emission struct; unspecified fields default from the batch
    row (src_cls/path/priority/page_seq) or null."""
    defaults: dict[str, Column] = {
        "src_cls": F.col("page_cls"),
        "path": F.col("path"),
        "priority": F.col("priority"),
        "page_seq": F.col("page_seq"),
        "attempts": F.lit(0),
    }
    cols = []
    for name, typ in EMISSION_FIELDS:
        if name == "emit_kind":
            c = F.lit(emit_kind) if isinstance(emit_kind, str) else emit_kind
        elif name in over:
            c = over[name]
        elif name in defaults:
            c = defaults[name]
        else:
            c = F.lit(None)
        cols.append(c.cast(typ).alias(name))
    return F.struct(*cols)


def empty_emissions() -> Column:
    return F.expr(f"CAST(array() AS {EMISSION_ARRAY_DDL})")


def one(e: Column) -> Column:
    return F.array(e)


def _hex8(idx: Column) -> Column:
    return F.lower(F.lpad(F.hex(idx), 8, "0"))


def child_path(idx: Column) -> Column:
    """Lineage slot for the idx-th item/child of this page (DFS order,
    schemas.path_key)."""
    return F.concat(F.col("path"), F.lit(schemas.SLOT_CHILD), _hex8(idx))


def pagination_path() -> Column:
    return F.concat(
        F.col("path"), F.lit(schemas.SLOT_PAGINATION),
        _hex8(F.col("page_seq") + 1),
    )


def next_emission(next_url: Column | None = None) -> Column:
    """Pagination: same class, same input, new source
    (reference get_next_source, pages.py:197-204,318-324)."""
    url = next_url if next_url is not None else F.col("next_url")
    return emission(
        "next",
        path=pagination_path(),
        child_cls=F.col("page_cls"),
        child_url=url,
        child_input_json=F.col("input_json"),
        page_seq=F.col("page_seq") + 1,
    )


def paginate_if_next() -> Column:
    """array(next) when the store carries a next_url, else empty."""
    return F.when(
        F.col("next_url").isNotNull(), F.array(next_emission())
    ).otherwise(empty_emissions())


def children_from_links(
    child_cls: str,
    links: Column | None = None,
    slot_offset: int = 0,
    child_input_json: Column | None = None,
) -> Column:
    """Detail fan-out: one child emission per link, document order
    (the native SimilarLink/extraction path; reference pages.py:225-238).
    """
    lk = links if links is not None else F.col("links")
    lk = F.coalesce(lk, F.expr("CAST(array() AS array<string>)"))
    inp = (
        child_input_json
        if child_input_json is not None
        else F.lit(None).cast("string")
    )
    return F.transform(
        lk,
        lambda u, i: emission(
            "child",
            path=child_path(i + slot_offset),
            child_cls=F.lit(child_cls),
            child_url=u,
            child_input_json=inp,
            page_seq=F.lit(0),
        ),
    )


def item_emission(item_json: Column, slot: int | Column = 0) -> Column:
    idx = F.lit(slot) if isinstance(slot, int) else slot
    return emission("item", path=child_path(idx), item_json=item_json)
