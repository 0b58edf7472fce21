"""Collect the orphaned run-3 equal-duration control children.

The launcher (scripts/run_scaling_control.py, n4=1,700,000 default)
was killed by a stray pkill after it had launched both pinned children
and recorded its launch probe (scratch/scaling_ctl3.log); the children
kept running and write CTL_RESULT lines to scratch/ctl_child_{4,16}.out.
This reproduces the parent's summary math verbatim and appends the run
to BENCH/scaling_control.json, with a close probe taken at collect time.
"""
import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
from scripts.run_scaling import probe_window  # noqa: E402


def read_result(path):
    with open(path) as f:
        for line in f:
            if line.startswith("CTL_RESULT "):
                return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"no CTL_RESULT in {path}")


r4 = read_result(os.path.join(REPO, "scratch", "ctl_child_4.out"))
r16 = read_result(os.path.join(REPO, "scratch", "ctl_child_16.out"))

with open(os.path.join(REPO, "scratch", "scaling_ctl3.log")) as f:
    launch_probe = None
    for line in f:
        if line.startswith("{") and "launch_probe" in line:
            launch_probe = json.loads(line)["launch_probe"]
print("probing window (close)...", flush=True)
close_probe = probe_window()

pc4 = r4["urls_fetched"] / r4["wall_sec"] / 4
pc16 = r16["urls_fetched"] / r16["wall_sec"] / 16
eff_weak = pc16 / pc4

w_lo = max(r4["t_start"], r16["t_start"])
w_hi = min(r4["t_end"], r16["t_end"])


def in_window(r):
    total = r["t_end"] - r["t_start"]
    frac = max(0.0, (min(w_hi, r["t_end"]) - max(w_lo, r["t_start"]))) / total
    return r["urls_fetched"] * frac / max(1e-9, (w_hi - w_lo))


ov4 = in_window(r4) / 4
ov16 = in_window(r16) / 16
eff_overlap = ov16 / ov4 if ov4 > 0 else None

summary = {
    "protocol": "equal-duration weak-scaling control (concurrent-"
                "pinned, disjoint cpusets 0-3 / 4-19, same window "
                "by construction); eff = per-core URLs/s at 16 "
                "cores over per-core URLs/s at 4 cores",
    "n_urls": {"4": 1_700_000, "16": 4_000_000},
    "local4": r4,
    "local16": r16,
    "per_core_urls_s": {"4": round(pc4, 2), "16": round(pc16, 2)},
    "eff_weak": round(eff_weak, 3),
    "eff_overlap_window": (round(eff_overlap, 3)
                           if eff_overlap is not None else None),
    "overlap_frac_of_longer_leg": round(
        (w_hi - w_lo) / max(r4["t_end"] - r4["t_start"],
                            r16["t_end"] - r16["t_start"]), 3),
    "launch_probe": launch_probe,
    "close_probe": close_probe,
    "note": "launcher killed post-launch by a stray pkill; children "
            "ran to completion unperturbed and were collected by "
            "scripts/collect_ctl3.py with the identical summary math. "
            "n4 left at the 1.7M default, so legs are duration-"
            "mismatched; the overlap-window figure is the primary "
            "read for this run.",
}
summary["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")

out = os.path.join(REPO, "BENCH", "scaling_control.json")
with open(out) as f:
    prev = json.load(f).get("runs", [])
with open(out, "w") as f:
    json.dump({"runs": prev + [summary]}, f, indent=1)
print(json.dumps({k: summary[k] for k in (
    "per_core_urls_s", "eff_weak", "eff_overlap_window",
    "overlap_frac_of_longer_leg")}, indent=1))
