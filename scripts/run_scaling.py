"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox; per the
task brief the >=0.8 N->4N scaling-efficiency criterion is evidenced
by running the SAME crawl job on the SAME input at local[8] and
local[32] in separate JVMs and reporting throughput at both plus
efficiency = (T8 / T32) / 4.

Writes BENCH/scaling.json and regenerates the results table in
BENCH/BASELINE.md. Run: python scripts/run_scaling.py [n_urls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from spatula_spark.session import get_spark
from bench import run_crawl_bench
cores = int(sys.argv[1]); n_urls = int(sys.argv[2])
spark = get_spark(app_name=f"scaling_{{cores}}", cores=cores,
                  shuffle_partitions=cores)
n_hosts = max(8, n_urls // 1003)
out = run_crawl_bench(spark, n_hosts=n_hosts, details_per_host=1000,
                      details_per_list=1000, verify=True)
out["cores"] = cores
print("SCALING_RESULT " + json.dumps(out))
"""


def run(cores: int, n_urls: int) -> dict:
    code = CHILD.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_urls)],
        capture_output=True, text=True, timeout=3000,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(
        f"cores={cores} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    results = {c: run(c, n_urls) for c in (8, 32)}
    eff = (results[32]["urls_per_sec"] / results[8]["urls_per_sec"]) / 4.0
    summary = {
        "n_urls": n_urls,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
