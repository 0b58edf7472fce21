"""spark-submit entry point for cluster runs (north-rule packaging).

Usage:
  python scripts/build_pyfiles.py            # -> dist/spatula_spark.zip
  spark-submit --py-files dist/spatula_spark.zip \
      scripts/submit_crawl.py --store <page_store_path> \
      --seeds <seeds.json> --out <results_path> \
      [--checkpoint <dir>] [--host-budget N] [--max-waves N]

On a cluster the page store is an Iceberg/parquet table bucketed on
url_hash; results/checkpoints write to the shared filesystem. The same
script runs unchanged on local[N] for smoke tests.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--seeds", required=True, help="JSON list of seed dicts")
    ap.add_argument("--out", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--host-budget", type=int, default=None)
    ap.add_argument("--max-waves", type=int, default=None)
    args = ap.parse_args()

    from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
    from spatula_spark.plans.media_pipeline import media_registry

    spark = SparkSession.builder.appName("spatula_spark_crawl").getOrCreate()
    store = spark.read.parquet(args.store)
    robots = spark.read.parquet(args.robots) if args.robots else None
    with open(args.seeds) as f:
        seeds = json.load(f)

    eng = CrawlEngine(
        spark,
        media_registry(),
        page_store=store,
        robots=robots,
        config=CrawlConfig(
            host_budget_per_wave=args.host_budget,
            checkpoint_dir=args.checkpoint,
            max_waves=args.max_waves,
        ),
    )
    res = eng.crawl(seeds)
    res.results.write.mode("overwrite").parquet(args.out)
    print(res.metrics.to_string())


if __name__ == "__main__":
    main()
