"""Whole-box CPU-accounting probe for the scaling-protocol analysis
(BENCH/BASELINE.md "why unpinned-sequential under-reads").

Runs one crawl leg at the given core count and reports, alongside the
usual throughput, how many cores the WHOLE BOX actually spent on it —
/proc/stat busy-jiffies delta across the timed window. Only
meaningful on an otherwise idle box (everything busy is attributed to
the leg). Findings recorded in BENCH/scaling.json: an unpinned
local[4] leg consumes ~4.19 cores (JVM GC/IO/shuffle threads beside
the 4 task slots); a local[16] leg occupies only ~13.25/16 (per-wave
barriers + stragglers).

Run: python scripts/cores_used_probe.py <cores> <n_urls>
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def busy_jiffies() -> int:
    f = open("/proc/stat").readline().split()
    # user nice system idle iowait irq softirq steal guest guest_nice
    v = [int(x) for x in f[1:]]
    return sum(v) - v[3] - v[4]  # everything except idle+iowait


def main() -> None:
    from bench import run_crawl_bench
    from spatula_spark.session import get_spark

    cores = int(sys.argv[1])
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    spark = get_spark(app_name=f"cores_used_{cores}", cores=cores,
                      shuffle_partitions=cores)
    n_hosts = max(8, n_urls // 1003)
    b0, t0 = busy_jiffies(), time.time()
    out = run_crawl_bench(spark, n_hosts=n_hosts, details_per_host=1000,
                          details_per_list=1000, verify=True, img_scale=2)
    b1, t1 = busy_jiffies(), time.time()
    out["cores"] = cores
    hz = 100  # userspace jiffies are USER_HZ=100 on linux
    out["cpu_sec_box"] = round((b1 - b0) / hz, 1)
    out["cores_used_box"] = round((b1 - b0) / hz / (t1 - t0), 2)
    print("SCALING_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
