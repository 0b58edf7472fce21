"""No-Spark host-ceiling control for the scaling evidence: the
per-image kernel (synth -> lossy encode -> decode -> PSNR -> phash)
under plain ``multiprocessing`` at 4 vs 16 workers.

The N->4N efficiency a Spark job can reach on ONE box is bounded by
what the box's memory bus gives raw python workers; this control
measures that bound in the SAME load window as a scaling run, so an
engine number can be read against the hardware ceiling of the day
rather than an idealized 1.0 (this sandbox is a shared host — the
ceiling itself moves 0.87 -> 0.81 between days).

Run: python scripts/hw_kernel_bench.py [n_items] [--concurrent]

``--concurrent`` mirrors run_scaling.py --concurrent exactly: the
4-worker and 16-worker kernels run SIMULTANEOUSLY, taskset-pinned to
the same disjoint cpusets the engine legs use (0-3 / 4-19), so the
control measures the ceiling of the identical protocol — including the
shared-bus interaction between the two pinned sets.
"""
import multiprocessing as mp
import os
import subprocess
import sys, time
sys.path.insert(0, "/root/repo")

def work(args):
    lo, hi = args
    from spatula_spark.functions.images import (
        synth_pixels, lossy_encode, decode_image, psnr, average_phash)
    bad = 0
    for i in range(lo, hi):
        w = 32 + (i * 37) % 97
        h = 32 + (i * 53) % 97
        px = synth_pixels(i, 2 * w, 2 * h)   # img_scale=2 weight
        data = lossy_encode(px, "fast")
        px2 = decode_image(data, "jpeg")
        if psnr(px2, px) < 40.0:
            bad += 1
        average_phash(px2)
    return bad

def run(workers, n_items):
    chunks = [(j * n_items // workers, (j + 1) * n_items // workers)
              for j in range(workers)]
    t0 = time.time()
    with mp.Pool(workers) as p:
        bads = p.map(work, chunks)
    dt = time.time() - t0
    return n_items / dt, sum(bads)

def run_concurrent(n_items):
    """Both worker counts at once on the run_scaling cpusets; each
    child prints 'rate bad' and the parent pairs them up."""
    child = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "from scripts.hw_kernel_bench import run; "
        "r, b = run(int(sys.argv[1]), int(sys.argv[2])); "
        "print(f'{r:.1f} {b}')"
    )
    procs = {
        w: subprocess.Popen(
            ["taskset", "-c", cpus, sys.executable, "-c", child,
             str(w), str(n_items)],
            stdout=subprocess.PIPE, text=True, cwd="/root/repo",
            env=dict(os.environ),
        )
        for w, cpus in ((4, "0-3"), (16, "4-19"))
    }
    out = {}
    for w, p in procs.items():
        stdout, _ = p.communicate(timeout=1200)
        rate, bad = stdout.split()
        out[w] = (float(rate), int(bad))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 24000
    if "--concurrent" in sys.argv[1:]:
        res = run_concurrent(n)
        (r4, b4), (r16, b16) = res[4], res[16]
        eff = (r16 / r4) / 4
        print(f"HW_RESULT mode=concurrent r4={r4:.0f} r16={r16:.0f} "
              f"eff={eff:.3f} bad={b4 + b16}")
    else:
        r4, b4 = run(4, n)
        r16, b16 = run(16, n)
        eff = (r16 / r4) / 4
        print(f"HW_RESULT r4={r4:.0f} r16={r16:.0f} eff={eff:.3f} "
              f"bad={b4 + b16}")
