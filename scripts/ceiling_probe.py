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

Usage:
  python scripts/ceiling_probe.py                # probes 1 2 4 8 16 32
  python scripts/ceiling_probe.py 1 4           # probe just these counts
Prints one JSON line: {"gbps": {"1": ..., ...}, "pairs": {"1->4": {...}}}
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
    print(json.dumps({"buf_mb": BUF_MB, "gbps": gbps, "pairs": pairs}))


if __name__ == "__main__":
    main()
