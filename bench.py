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
                    details_per_list: int) -> dict:
    from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
    from spatula_spark.plans.media_pipeline import media_registry
    from spatula_spark.sources.synthweb import SynthWeb

    web = SynthWeb(
        n_hosts=n_hosts,
        details_per_host=details_per_host,
        details_per_list=details_per_list,
        skew=4,
        with_errors=False,
        with_flaky=False,
    )
    store = web.page_store(spark)
    store.persist().count()  # exclude generation from the timing
    eng = CrawlEngine(
        spark,
        media_registry(),
        page_store=store,
        robots=web.robots(spark),
        config=CrawlConfig(host_budget_per_wave=50_000),
    )
    t0 = time.time()
    res = eng.crawl(web.seeds())
    n_fetched = int(res.metrics["fetched"].sum())
    wall = time.time() - t0
    store.unpersist()
    return {
        "urls_fetched": n_fetched,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_fetched / wall, 1),
        "waves": int(res.waves),
    }


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "host_budget_topk",
    "url_canonicalize",
    "sessionize",
    "text_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_topk",
    "ann_lsh_topk",
    "stream_window_counts",
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

    # operator battery at the given SF (action = count to drain the plan)
    for name in HEADLINE:
        fn = entry_queries.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # headline crawl throughput on the bench frontier
    n_urls = int(os.environ.get("SPATULA_BENCH_URLS", "200000"))
    details_per_host = max(200, n_urls // 67)  # 64 hosts + skew 4 on host 0
    crawl = run_crawl_bench(
        spark, n_hosts=64, details_per_host=details_per_host,
        details_per_list=500,
    )
    timings["crawl_synth_web"] = crawl["wall_sec"]

    print(
        json.dumps(
            {
                "metric": "frontier URLs/sec (fetch-scheduled + deduped)",
                "value": crawl["urls_per_sec"],
                "unit": "urls/sec",
                "queries": timings,
                "sf": sf,
                "crawl": crawl,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
