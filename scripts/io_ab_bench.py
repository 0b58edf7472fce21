"""Same-window A/B for the snapshot-durability knobs (round-5 item 2).

Question: does checkpoint_every=K + checkpoint_async actually cut the
crawl's per-wave commit-IO sensitivity — the mechanism behind the
round-4 late-session band collapse (crawl throughput fell 9,678 ->
6,149 URLs/s while the CPU control stayed flat)?

Protocol: one local[16] session; the SAME durable-checkpointed crawl
(SynthWeb store join, host budgets, bloom+exact seen) runs in
interleaved legs A B A B ... where
  A = round-4 durability (checkpoint_every=1, sync commits)
  B = round-5 knobs      (checkpoint_every=4, checkpoint_async=True)
first in a quiet window, then again UNDER INDUCED IO LOAD (background
processes writing+fsyncing parquet in a loop on the same filesystem
the snapshots land on). Interleaving makes every A leg share its
window with a B leg; the load legs quantify each config's exposure to
a degraded store. Emits one JSON line and appends it to
BENCH/io_ab.json.

Run: python -u scripts/io_ab_bench.py [n_urls] [reps]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOG = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from scripts.hw_io_bench import _table
import pyarrow.parquet as pq
import tempfile
t = _table(400_000)  # ~100 MB on disk
d = tempfile.mkdtemp(prefix="io_hog_")
i = 0
while True:
    p = os.path.join(d, f"hog{{i % 4}}.parquet")
    pq.write_table(t, p, compression="snappy")
    fd = os.open(p, os.O_RDONLY); os.fsync(fd); os.close(fd)
    i += 1
"""


def crawl_leg(spark, web, store, cfg_kwargs, n_urls) -> float:
    from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
    from spatula_spark.plans.media_pipeline import media_registry

    ck = tempfile.mkdtemp(prefix="io_ab_ck_")
    shutil.rmtree(ck, ignore_errors=True)
    eng = CrawlEngine(
        spark, media_registry(), page_store=store,
        robots=web.robots(spark),
        config=CrawlConfig(
            host_budget_per_wave=10 ** 9, checkpoint_dir=ck, **cfg_kwargs
        ),
    )
    t0 = time.time()
    res = eng.crawl(web.seeds())
    n = int(res.metrics["fetched"].sum())
    dt = time.time() - t0
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(eng._spill, ignore_errors=True)
    return n / dt


def run_block(spark, web, store, n_urls, reps, label) -> dict:
    legs = {"A_sync_every1": [], "B_async_every4": []}
    for _ in range(reps):
        legs["A_sync_every1"].append(crawl_leg(
            spark, web, store,
            {"checkpoint_every": 1, "checkpoint_async": False}, n_urls))
        legs["B_async_every4"].append(crawl_leg(
            spark, web, store,
            {"checkpoint_every": 4, "checkpoint_async": True}, n_urls))
    out = {"label": label}
    for k, v in legs.items():
        out[k] = {
            "urls_per_sec": [round(x, 1) for x in v],
            "mean": round(sum(v) / len(v), 1),
            "spread": round((max(v) - min(v)) / max(v), 3),
        }
    return out


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from spatula_spark.session import get_spark
    from spatula_spark.sources.synthweb import SynthWeb

    spark = get_spark(app_name="io_ab", cores=16, shuffle_partitions=16)
    web = SynthWeb(n_hosts=max(8, n_urls // 1003), details_per_host=1000,
                   details_per_list=1000, skew=4,
                   with_errors=False, with_flaky=False)
    store = web.page_store(spark)
    store.persist().count()

    # untimed warmup crawl: the first leg of a fresh JVM otherwise
    # absorbs executor/codegen/python-daemon startup (~measured 40%)
    crawl_leg(spark, web, store,
              {"checkpoint_every": 1, "checkpoint_async": False}, n_urls)

    quiet = run_block(spark, web, store, n_urls, reps, "quiet")
    hogs = [subprocess.Popen(
        [sys.executable, "-c", HOG.format(repo=REPO)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for _ in range(3)]
    time.sleep(5)  # let the hogs reach steady state
    try:
        loaded = run_block(spark, web, store, n_urls, reps, "io_load")
    finally:
        for h in hogs:
            h.kill()
    result = {"n_urls": n_urls, "reps": reps,
              "quiet": quiet, "io_load": loaded}
    path = os.path.join(REPO, "BENCH", "io_ab.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f).get("runs", [])
    hist.append(result)
    with open(path, "w") as f:
        json.dump({"runs": hist}, f, indent=2)
    print("IO_AB_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
