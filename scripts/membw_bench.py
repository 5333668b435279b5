#!/usr/bin/env python
"""Memory-bus saturation probe (no Spark): aggregate streaming bandwidth
vs process count on THIS box.

Why it exists: the north_rule asks for >=0.8 throughput scaling from N to
4N executors. On a real cluster each node brings its own memory bus; in
this single-box sandbox every core shares ONE bus, so any bandwidth-bound
stage stops scaling once the bus saturates. This probe measures where
that happens, independent of Spark and of our code: each worker streams a
large float64 array (read + write ~3x8 bytes per element per pass, the
classic STREAM-triad shape), pinned to cores 0..N-1, and we report
aggregate GB/s. If aggregate bandwidth flatlines while N grows, core-count
scaling on this box is bus-capped — not an artifact of the engine.

Run: python scripts/membw_bench.py [--procs 1,2,4,8,16,32] [--mb 256]
Emits one JSON line: {"procs": {"1": gb_s, ...}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(n_mb: int, seconds: float, core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    n = n_mb * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.full(n, 2.0)
    c = np.empty(n)
    # warm up (fault the pages)
    np.add(a, b, out=c)
    passes = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        # triad: c = a + 2*b -> 2 reads + 1 write of 8B each per element
        np.add(a, b, out=c)
        c *= 2.0  # extra read+write pass keeps the kernel bandwidth-bound
        passes += 1
    dt = time.perf_counter() - t0
    gb = passes * n * 8 * 5 / 1e9  # 5 array touches per loop
    q.put(gb / dt)


def measure(procs: int, n_mb: int, seconds: float) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ws = [
        ctx.Process(target=_worker, args=(n_mb, seconds, i, q))
        for i in range(procs)
    ]
    for w in ws:
        w.start()
    rates = [q.get() for _ in ws]
    for w in ws:
        w.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8,16,32")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    out = {"mb_per_worker": args.mb, "procs": {}}
    for p in [int(x) for x in args.procs.split(",")]:
        gb_s = measure(p, args.mb, args.seconds)
        out["procs"][str(p)] = round(gb_s, 2)
        print(f"# procs={p} aggregate GB/s={gb_s:.1f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
