"""Round-6 optimization instrument (guide §1): per-query noop-sink
timings (N repeats, min+median reported) and .explain("formatted")
dumps, isolated from bench.py (which is FROZEN for measurement).

Usage:
  python bench_extra.py time [query ...]        # time queries (default all)
  python bench_extra.py plans SUFFIX [query ...]  # dump plans/r06/<q>_<SUFFIX>.txt
  python bench_extra.py crawl                   # crawl bench only

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPEATS (default 3),
BENCH_EXTRA_OUT (json output path).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402  (round-start list, read-only)


def get_session():
    from spatula_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra", cores=cpus, shuffle_partitions=cpus
    )
    # same warm-up as bench.py: one shuffle + one Arrow round trip
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    spark.range(1000).toDF("x").mapInPandas(lambda it: it, "x long").count()
    return spark


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spatula_spark import entry_queries

    if mode == "plans":
        suffix = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        spark = get_session()
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            fn = entry_queries.QUERIES[name]
            df = fn(spark, sf_dir)
            with open(f"plans/r06/{name}_{suffix}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
            print(f"dumped {name}_{suffix}", flush=True)
        return

    if mode == "crawl":
        spark = get_session()
        from bench import run_crawl_bench

        n_urls = int(os.environ.get("SPATULA_BENCH_URLS", "200000"))
        n_hosts = max(8, n_urls // 1003)
        reps = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
        out = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"crawl bench rep {i}")
            r = run_crawl_bench(
                spark, n_hosts=n_hosts, details_per_host=1000,
                details_per_list=1000,
            )
            out.append(r)
            print(json.dumps(r), flush=True)
        print(json.dumps({"crawl_walls": [r["wall_sec"] for r in out]}))
        return

    # mode == "time"
    names = sys.argv[2:] or HEADLINE
    reps = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    spark = get_session()
    res: dict[str, dict] = {}
    for name in names:
        fn = entry_queries.QUERIES[name]
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep {i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        res[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(f"{name:28s} min={min(samples):7.3f} med={statistics.median(samples):7.3f} {samples}", flush=True)
    out_path = os.environ.get("BENCH_EXTRA_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    total_min = sum(v["min"] for v in res.values())
    total_med = sum(v["median"] for v in res.values())
    print(json.dumps({"total_min": round(total_min, 2),
                      "total_median": round(total_med, 2)}))


if __name__ == "__main__":
    main()
