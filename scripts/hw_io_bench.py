"""IO-side host control for the scaling evidence: raw parquet
write+read MB/s with no Spark and no engine — the resource the crawl
is actually bound on once decode work is spread across cores (the
round-4 finding: the late-session crawl band collapsed 9,678 ->
6,149 URLs/s while the CPU-kernel control stayed FLAT, i.e. the
CPU-only control is blind to IO-side host degradation; VERDICT r4
next-round item 1 asks for exactly this control).

Measures, in the same scratch filesystem the engine's wave snapshots
use: (a) single-stream pyarrow parquet write MB/s (fsync'd),
(b) single-stream read-back MB/s, (c) 8-way concurrent write MB/s —
the shape of a wave's parallel snapshot writers.

Run: python scripts/hw_io_bench.py [n_mb]     (default 512)
Emits one line:  IO_RESULT write=... read=... cwrite=... (MB/s)

Healthy-band reference for THIS host (measured in the same windows as
the CPU probe; see BENCH/scaling.json probe history): single-stream
write >= ~900 MB/s, concurrent write >= ~1500 MB/s aggregate. A
scaling pair whose close-probe IO lands materially below the band is
classified IO-degraded regardless of what the CPU control says.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def _table(n_rows: int):
    import pyarrow as pa

    rng = np.random.default_rng(42)
    # crawl-snapshot-shaped rows: slim ints + a short string + a small
    # binary payload column (compressible but not degenerate)
    return pa.table({
        "url_hash": rng.integers(-(2 ** 62), 2 ** 62, n_rows),
        "seen_key": rng.integers(-(2 ** 62), 2 ** 62, n_rows),
        "kind": np.array(["fetched", "child", "item", "next"])[
            rng.integers(0, 4, n_rows)
        ],
        "payload": [bytes(x) for x in rng.integers(
            0, 256, (n_rows, 160), dtype=np.uint8)],
    })


def _write_one(args) -> float:
    path, n_rows = args
    import pyarrow.parquet as pq

    t = _table(n_rows)
    t0 = time.time()
    pq.write_table(t, path, compression="snappy")
    fd = os.open(path, os.O_RDONLY)
    os.fsync(fd)
    os.close(fd)
    return time.time() - t0


def run(n_mb: int = 512, workers: int = 8, base: str | None = None) -> dict:
    # ~250 B/row on disk after snappy; calibrate row count to n_mb
    n_rows = int(n_mb * 1024 * 1024 / 250)
    d = tempfile.mkdtemp(prefix="io_bench_", dir=base)
    try:
        import pyarrow.parquet as pq

        one = os.path.join(d, "single.parquet")
        _write_one((one, n_rows))  # warm the allocator/page cache
        os.remove(one)
        dt = _write_one((one, n_rows))
        size_mb = os.path.getsize(one) / 1e6
        write = size_mb / dt

        t0 = time.time()
        pq.read_table(one)
        read = size_mb / (time.time() - t0)

        # concurrent: `workers` processes each write size/workers —
        # the wave-snapshot shape (many tasks committing part files)
        paths = [(os.path.join(d, f"c{j}.parquet"), n_rows // workers)
                 for j in range(workers)]
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_write_one, paths)
        cdt = time.time() - t0
        csize = sum(os.path.getsize(p_) for p_, _ in paths) / 1e6
        cwrite = csize / cdt
        return {
            "write_mb_s": round(write, 1),
            "read_mb_s": round(read, 1),
            "cwrite_mb_s": round(cwrite, 1),
            "n_mb": round(size_mb, 1),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    r = run(n)
    print(f"IO_RESULT write={r['write_mb_s']} read={r['read_mb_s']} "
          f"cwrite={r['cwrite_mb_s']} (MB/s, {r['n_mb']} MB payload)")
