"""Engine StructTypes.

The reference has no schemas at all — every record is a live Python
object on the call stack (``/root/reference/src/spatula/pages.py:206-244``).
Making the frontier an explicit DataFrame is the core architecture
change; these types are its contract.

The ``path`` column is the lineage key that reconstructs the
reference's depth-first emission order from our breadth-first waves
(SURVEY.md §7.3). It is a fixed-width hex string: each level appends
``kk iiiiiiii`` where ``kk`` is a 2-hex-digit slot kind (``00`` =
child/item slot, ``01`` = pagination slot) and ``iiiiiiii`` the
8-hex-digit index. Plain lexicographic string order == the reference's
DFS pre-order (items/children in document order, pagination after —
``pages.py:225-244``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# one row per pending page fetch; the explicit version of the
# reference's recursion frames (`Page` instances awaiting `_to_items`).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("page_cls", T.StringType(), False),
        T.StructField("url", T.StringType(), True),  # null => NullSource
        T.StructField("input_json", T.StringType(), True),
        T.StructField("path", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("page_seq", T.IntegerType(), False),  # pagination chain index
        # page-identity hashes, computed at EMISSION time (one pass,
        # CSE-shared) so small-wave dedup can run driver-side without a
        # Spark job; null for seeds / hook-class emissions — the engine
        # coalesces in a cluster-side recompute when absent
        T.StructField("url_hash", T.LongType(), True),
        T.StructField("seen_key", T.LongType(), True),
    ]
)

# tagged-union emission rows produced by a page transform — the Spark
# encoding of "process_page may return an item, a Page, or a generator
# of either" (`pages.py:225-241`).
EMIT_KIND_ITEM = "item"
EMIT_KIND_CHILD = "child"
EMIT_KIND_NEXT = "next"

EMISSION_SCHEMA = T.StructType(
    [
        T.StructField("emit_kind", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("item_json", T.StringType(), True),
        T.StructField("child_cls", T.StringType(), True),
        T.StructField("child_url", T.StringType(), True),
        T.StructField("child_input_json", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
    ]
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("page_cls", T.StringType(), False),
        T.StructField("item_json", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

# synthetic web graph — the join target that replaces the HTTP socket
# (`sources.py:42-52` `URL.get_response`). One row per fetchable URL.
PAGE_STORE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # list|detail|media|error
        T.StructField("status", T.IntegerType(), False),
        T.StructField("payload_kind", T.StringType(), False),  # html|json|csv|xml|bin
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("next_url", T.StringType(), True),
        T.StructField("image_id", T.StringType(), True),
        # number of leading attempts accept_response rejects (retry tests,
        # reference retry loop `pages.py:168-195`)
        T.StructField("flaky_rejects", T.IntegerType(), False),
    ]
)

# BASELINE.json input_hint: Iceberg table of image+caption pairs.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

SEEDS_SCHEMA = T.StructType(
    [
        T.StructField("page_cls", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("input_json", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("deferred", T.LongType(), False),
        T.StructField("blocked", T.LongType(), False),
        T.StructField("items", T.LongType(), False),
        T.StructField("children", T.LongType(), False),
    ]
)

# lineage path-key construction ------------------------------------------

SLOT_CHILD = "00"
SLOT_PAGINATION = "01"
_IDX_WIDTH = 8


def path_key(parent_path: str, slot: str, index: int) -> str:
    """Append one lineage level (driver-side helper, used for seeds)."""
    return f"{parent_path}{slot}{index:0{_IDX_WIDTH}x}"


def root_path(seed_seq: int) -> str:
    return path_key("", SLOT_CHILD, seed_seq)
