"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full crawl-engine
frontier loop over a binary-tree web derived from the documents table)
at sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data operator families
(dedup, similarity, text analysis, streaming); implementations live in
``spatula_spark/entry_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spatula_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the doc-tree web at sf0.001 (engine loop
    end-to-end: fetch-join, seen set, native transforms, waves)."""
    return entry_queries.QUERIES["crawl_doc_tree"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    # entries may be lazy callables (oracles with computed literal
    # tables, e.g. the codec-pinned image fingerprints) — render here
    return {
        k: (v() if callable(v) else v)
        for k, v in entry_queries.ORACLES.items()
    }
