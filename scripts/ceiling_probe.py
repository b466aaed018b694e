#!/usr/bin/env python
"""Memory-bandwidth ceiling probe: the quantitative companion to every
scaling pair (VERDICT r4 item 5).

Measures aggregate memcpy bandwidth at increasing process counts — the
hardware quantity that caps throughput scaling for any copy-heavy job on
this VM (rounds 1-4 established the knee by decomposition; this script
automates it so BENCH.md can report, per scaling pair, the raw ratio, the
copy-ceiling cap, and the ceiling-adjusted efficiency in the SAME session
as the measurement).

Method: N worker processes each own two ~256 MB buffers and run
np.copyto in a loop for ~1.5 s after a barrier start; aggregate GB/s =
total bytes / wall. Ceiling cap for an n→4n pair = min(4, bw(4n)/bw(n));
adjusted efficiency = raw_ratio / cap.

A second, independent probe measures CPU AVAILABILITY: N spin workers
pinned to cores 0..N-1 counting pure-Python loop iterations. memcpy
bounds what DRAM permits; spin bounds what the scheduler permits — the
round-5 contended windows showed clean memcpy caps while bursty
co-tenant steal depressed the actual legs, and the spin probe is the
instrument that separates those two states.

Usage:
  python scripts/ceiling_probe.py                # probes 1 2 4 8 16 32
  python scripts/ceiling_probe.py 1 4           # probe just these counts
Prints one JSON line:
  {"gbps": {...}, "pairs": {...}, "spin_per_core": {...}, "load": [...]}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

BUF_MB = 256
SECONDS = 1.5


def _worker(barrier, out, idx):
    import numpy as np

    src = np.ones(BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # touch pages before the timed window
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    out[idx] = n * len(src) / (time.perf_counter() - t0)


def _spin_worker(barrier, out, idx):
    import os

    os.sched_setaffinity(0, {idx})
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        for _ in range(100000):
            pass
        n += 1
    out[idx] = n / (time.perf_counter() - t0)


def spin_probe(nproc: int) -> float:
    """Per-core spin throughput (loop-units/s/core) with nproc pinned
    workers — 1.0x scaling from 1 to N means N fully available cores."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(nproc)
    out = ctx.Array("d", nproc)
    procs = [
        ctx.Process(target=_spin_worker, args=(barrier, out, i))
        for i in range(nproc)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return float(sum(out)) / nproc


def probe(nproc: int) -> float:
    """Aggregate copy bandwidth (bytes/s) with nproc concurrent workers."""
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(nproc)
    out = ctx.Array("d", nproc)
    procs = [
        ctx.Process(target=_worker, args=(barrier, out, i))
        for i in range(nproc)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return float(sum(out))


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    gbps = {}
    for n in sorted(set(counts)):
        best = max(probe(n) for _ in range(2))  # best-of-2 vs host noise
        gbps[str(n)] = round(best / 1e9, 2)
    pairs = {}
    for n in sorted(set(counts)):
        m = n * 4
        if str(m) in gbps:
            cap = min(4.0, gbps[str(m)] / gbps[str(n)])
            pairs[f"{n}->{m}"] = {
                "bw_ratio": round(gbps[str(m)] / gbps[str(n)], 3),
                "cap": round(cap, 3),
                "max_possible_efficiency": round(cap / 4.0, 3),
            }
    import os

    spin = {
        str(n): round(max(spin_probe(n) for _ in range(2)), 1)
        for n in sorted(set(counts))
    }
    print(
        json.dumps(
            {
                "buf_mb": BUF_MB,
                "gbps": gbps,
                "pairs": pairs,
                "spin_per_core": spin,
                "load": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
