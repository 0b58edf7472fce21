"""Benchmark driver: headline crawl throughput + operator timings.

Prints ONE JSON line:
  {"metric": "frontier URLs/sec (fetch-scheduled + deduped)",
   "value": <urls/sec>, "unit": "urls/sec",
   "queries": {<name>: seconds, ...}, "sf": <sf>, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPATULA_BENCH_URLS (frontier size knob).

The crawl benchmark runs the full engine (politeness budgets, robots,
bloom+exact seen-set, native transforms) over a deterministic synthetic
web sized so per-wave fixed costs amortize (details_per_list keeps the
pagination chains shallow; URLs/wave in the tens of thousands). The
two-cluster-size scaling evidence (local[8] vs local[32]) is produced
by scripts/run_scaling.py into BENCH/BASELINE.md — separate JVMs, same
input.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_crawl_bench(spark, n_hosts: int, details_per_host: int,
                    details_per_list: int, verify: bool = False,
                    img_scale: int = 1, verbose: bool = False,
                    checkpoint_every: int = 1,
                    checkpoint_async: bool = False) -> dict:
    """Crawl the wide synthetic web.

    ``verify=False``: pure frontier-scheduling loop (scheduling
    URLs/sec, the headline metric).
    ``verify=True``: the full north-rule pipeline — detail payloads are
    the encoded image bytes and the detail transform decodes + checks
    the pixel invariant *inside the wave* (Arrow-batched). This is the
    variant used for the N-vs-4N scaling evidence: the scheduling loop
    alone is shuffle/commit-bound (does not scale on one shared NVMe),
    the decode stage is the compute that scales with cores.
    """
    from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
    from spatula_spark.plans.media_pipeline import (
        media_registry,
        media_verify_registry,
    )
    from spatula_spark.sources.synthweb import SynthWeb

    # wide web: crawl frontiers are breadth-dominated; a deep pagination
    # chain on one host serializes waves and benchmarks the chain, not
    # the engine (measured: 25 waves -> 1.1k URLs/s vs 5 waves -> 5.2k)
    web = SynthWeb(
        n_hosts=n_hosts,
        details_per_host=details_per_host,
        details_per_list=details_per_list,
        skew=4,
        with_errors=False,
        with_flaky=False,
        img_scale=img_scale,
    )
    if verify:
        # VIRTUAL web: the fetch stage derives every payload from the
        # URL alone (the synthetic stand-in for the network) — memory-
        # flat at any URL count, and the whole pipeline including
        # payload arrival is inside the timed window. Equivalence with
        # the page-store join variant is pinned by
        # tests/test_crawl_media.py::test_virtual_fetcher_matches_store.
        store = None
        registry = media_verify_registry()
        eng = CrawlEngine(
            spark,
            registry,
            fetch_fn=web.fetcher(),
            robots=web.robots(spark),
            config=CrawlConfig(host_budget_per_wave=10**9, verbose=verbose,
                               checkpoint_every=checkpoint_every,
                               checkpoint_async=checkpoint_async),
        )
    else:
        store = web.page_store(spark)
        registry = media_registry()
        store.persist().count()  # exclude generation from the timing
        eng = CrawlEngine(
            spark,
            registry,
            page_store=store,
            robots=web.robots(spark),
            config=CrawlConfig(host_budget_per_wave=10**9,
                               checkpoint_every=checkpoint_every,
                               checkpoint_async=checkpoint_async),
        )
    t0 = time.time()
    res = eng.crawl(web.seeds())
    n_fetched = int(res.metrics["fetched"].sum())
    out = {
        "urls_fetched": n_fetched,
        "waves": int(res.waves),
    }
    if verify:
        from pyspark.sql import functions as F

        bad = res.results.filter(
            (F.col("page_cls") == "MediaDetailPage")
            & (F.get_json_object("item_json", "$.pixels_ok") != "true")
        ).count()
        out["verify_bad"] = int(bad)
        out["items"] = int(res.metrics["items"].sum())
        # per-wave fetched counts: lets a concurrent-pair analysis
        # attribute throughput to wall-clock windows (scaling evidence)
        out["per_wave_fetched"] = [
            int(x) for x in res.metrics["fetched"].tolist()
        ]
    wall = time.time() - t0
    out["wall_sec"] = round(wall, 3)
    out["urls_per_sec"] = round(n_fetched / wall, 1)
    if store is not None:
        store.unpersist()
    # drop the run's parquet wave snapshots (results consumed above);
    # repeated bench runs would otherwise accrete gigabytes in /tmp
    import shutil

    shutil.rmtree(eng._spill, ignore_errors=True)
    return out


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "host_budget_topk",
    "url_canonicalize",
    "sessionize",
    "text_profile",
    "tfidf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_lsh_capped",
    "dedup_incremental",
    "winnow_near_dups",
    "ngram_containment",
    "duplicate_spans",
    "dup_token_ratio",
    "dedup_simhash",
    "simhash_near_dups",
    "image_near_dup_phash",
    "media_phash_near_dups",
    "media_clean",
    "media_dedup_cc",
    "multimodal_dedup_cc",
    "corpus_split",
    "corpus_shuffle",
    "mixture_plan",
    "lang_rebalance",
    "redact_pii",
    "doc_repetition_filters",
    "quality_cut",
    "boilerplate_strip",
    "c4_clean",
    "gopher_quality",
    "dsir_select",
    "corpus_datacard",
    "logfreq_quality",
    "semdedup_prune",
    "image_stats_filter",
    "image_downsample",
    "colorhist_near_dups",
    "bpe_pair_counts",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "duplicate_spans_n",
    "oov_rate",
    "zorder_layout",
    "degree_histogram",
    "url_template_mining",
    "hll_url_distinct",
    "cms_word_freq",
    "host_latency_quantiles",
    "pagerank_top20",
    "hits_topk",
    "lm_perplexity_cut",
    "fetch_schedule",
    "decontaminate",
    "quality_sample",
    "pack_sequences",
    "audio_features",
    "caption_image_alignment",
    "caption_pixel_mismatch",
    "sitemap_frontier",
    "crawl_trap_hosts",
    "recrawl_priority",
    "revalidation_plan",
    "anchor_text_topk",
    "anchor_spam_hosts",
    "embedding_topk",
    "embedding_near_dups",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "stream_window_counts",
    "stream_sessionize",
    "stream_dedup_keys",
    "stream_phash_dedup",
    "warc_cdx",
    "crawl_doc_tree",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from spatula_spark import entry_queries
    from spatula_spark.session import get_spark

    spark = get_spark(
        app_name="spatula_bench", cores=cpus, shuffle_partitions=cpus
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # JVM/session warm-up OUTSIDE the timed window (one shuffle + one
    # Arrow python-worker round trip, ~3 s): without it the first
    # battery entry silently absorbs executor/codegen/python-daemon
    # startup that has nothing to do with that query
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy(
        "k"
    ).count().count()
    spark.range(1000).toDF("x").mapInPandas(
        lambda it: it, "x long"
    ).count()

    # operator battery at the given SF. Drain = noop-sink write, which
    # evaluates EVERY output column. count() is NOT a valid drain:
    # Catalyst column-prunes work that doesn't change cardinality, and
    # a plan-diff audit (r5) showed 16 battery queries losing
    # load-bearing operators under count — projection-only queries
    # (url_canonicalize, warc_cdx) lost everything but the scan, and
    # final-stage windows/broadcast-joins were pruned from
    # lm_perplexity_cut, oov_rate, pack_sequences, corpus_shuffle,
    # mixture_plan, fetch_schedule, host_latency_quantiles,
    # asof_join_purchases, decontaminate, dsir_select, semdedup_prune,
    # boilerplate_strip, logfreq_quality, minhash_signatures,
    # dedup_simhash. r5 battery numbers are therefore the first
    # full-evaluation series (see BENCH/BASELINE.md protocol note).
    for name in HEADLINE:
        fn = entry_queries.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # no-Spark hardware control measured in the SAME window as the
    # crawl: raw-kernel items/sec under multiprocessing (this sandbox
    # is a shared host whose capability swings ~3x between windows —
    # see BENCH/BASELINE.md; this number lets any two bench runs be
    # read against the host capability of their moment)
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"),
    )
    import hw_kernel_bench as hw  # normal import: picklable for mp.Pool

    hw_rate, _ = hw.run(16, 6000)
    hw_control = {"workers": 16, "items_per_sec": round(hw_rate, 1)}
    # IO-side control in the same window (round-4 finding: the crawl
    # is shuffle/commit-IO-bound and the CPU kernel is blind to
    # IO-side host degradation — raw parquet write/read MB/s is the
    # resource the wave snapshots actually contend on)
    import hw_io_bench

    hw_control["io"] = hw_io_bench.run(256)

    # headline crawl throughput on the bench frontier
    n_urls = int(os.environ.get("SPATULA_BENCH_URLS", "200000"))
    # scale BREADTH (hosts), not chain depth: host0 (skew 4) tops out at
    # a 4-page pagination chain, so wave count stays ~6 at any size
    n_hosts = max(8, n_urls // 1003)
    crawl = run_crawl_bench(
        spark, n_hosts=n_hosts, details_per_host=1000,
        details_per_list=1000,
    )
    timings["crawl_synth_web"] = crawl["wall_sec"]

    # secondary: identical crawl with the documented durability knobs
    # (snapshot commit every 4 waves on a background thread — resume
    # replays ≤3 waves, byte-identical resume pinned by
    # test_checkpoint_every_k_async_resume_identical). The headline
    # above stays K=1 sync for cross-round comparability; this row
    # shows what a deployment trading recovery granularity for
    # commit-IO overlap gets in the same window (BENCH/io_ab.json:
    # +7-9% quiet, +25% under induced IO load).
    crawl_async = run_crawl_bench(
        spark, n_hosts=n_hosts, details_per_host=1000,
        details_per_list=1000, checkpoint_every=4, checkpoint_async=True,
    )
    timings["crawl_synth_web_async_k4"] = crawl_async["wall_sec"]

    print(
        json.dumps(
            {
                "metric": "frontier URLs/sec (fetch-scheduled + deduped)",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "queries": timings,
                "sf": sf,
                "crawl": crawl,
                "crawl_async_k4": crawl_async,
                "cpus": cpus,
                "hw_control": hw_control,
            }
        )
    )


if __name__ == "__main__":
    main()
