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


# Queries that have never had a durable row in any CORRECTNESS_r*.json
# (driver samples the first ~50 dict entries), plus this round's new
# operators — listed first so the union of rounds covers the full
# battery (VERDICT r4, next-round item 3).
_PRIORITY = [
    "quality_cut", "pagerank_top20", "degree_histogram",
    "url_template_mining", "cms_word_freq", "hll_url_distinct",
    "crawl_trap_hosts", "recrawl_priority", "anchor_text_topk",
    "hits_topk", "lm_perplexity_cut", "fetch_schedule",
    "colorhist_near_dups", "host_latency_quantiles", "oov_rate",
    "c4_clean", "gopher_quality", "caption_pixel_mismatch",
    "dsir_select", "revalidation_plan", "corpus_datacard",
    "anchor_spam_hosts", "stream_phash_dedup",
    # round-5 additions
    "bpe_train_merges", "duplicate_spans_n", "ann_ivfpq_topk",
    "bpe_encode_tokens", "corpus_shuffle", "mixture_plan", "warc_cdx",
]


def _ordered(d: dict) -> dict:
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return dict(
        sorted(d.items(), key=lambda kv: rank.get(kv[0], len(rank)))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(entry_queries.QUERIES))


def oracle_sql() -> dict[str, str]:
    # entries may be lazy callables (oracles with computed literal
    # tables, e.g. the codec-pinned image fingerprints) — render here
    return _ordered(
        {
            k: (v() if callable(v) else v)
            for k, v in entry_queries.ORACLES.items()
        }
    )
