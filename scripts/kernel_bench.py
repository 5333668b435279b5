#!/usr/bin/env python
"""Bare analyzer-kernel scaling probe (no Spark, no JVM).

Measures the hardware ceiling for the index build's dominant phase —
``analyze_flat_grouped`` over the synthetic ``pages`` corpus — using raw
``multiprocessing`` with CPU affinity pinned per worker. This isolates
the Python/numpy kernel from Spark scheduling, shuffle, and parquet IO,
so BENCH.md can state what fraction of the box's own throughput the full
Spark build reaches, and what the 8->32-core efficiency of the *kernel
itself* is (the north-rule denominator: a VM whose memory bus saturates
at E<1 bounds any string workload at that E, Spark or not).

Run:  python scripts/kernel_bench.py [--sf 0.1] [--procs 1,8,32]
Emits one JSON line: {"procs": {"1": docs_s, ...}, "eff_8_32": E, ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _worker(args):
    """Analyze a list of text batches; pinned to one core."""
    core, batches = args
    try:
        os.sched_setaffinity(0, {core})
    except (AttributeError, OSError):
        pass
    from lucene_solr_spark.analysis import analyze_flat_grouped

    n_docs = 0
    t0 = time.perf_counter()
    for batch in batches:
        analyze_flat_grouped(batch, "en")
        n_docs += len(batch)
    return n_docs, time.perf_counter() - t0


def _load_texts(sf: float, batch_rows: int = 2000) -> list:
    """Materialize the corpus text column as a list of numpy batches."""
    import pyarrow.parquet as pq

    path = f"/tmp/spark_graft_pages_sf{sf}.parquet"
    if not os.path.exists(path):
        from lucene_solr_spark.fixtures import write_pages

        write_pages(sf, path + ".tmp")
        os.replace(path + ".tmp", path)
    col = pq.read_table(path, columns=["text"]).column("text").to_pandas()
    vals = col.to_numpy()
    return [vals[i : i + batch_rows] for i in range(0, len(vals), batch_rows)]


def run(nproc: int, batches: list) -> float:
    """Aggregate docs/s at nproc pinned workers over the full corpus."""
    # round-robin batches across workers so Zipf-length skew balances
    shards = [batches[i::nproc] for i in range(nproc)]
    jobs = [(core, shard) for core, shard in enumerate(shards)]
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(nproc) as pool:
        results = pool.map(_worker, jobs)
    wall = time.perf_counter() - t0
    n_docs = sum(r[0] for r in results)
    return n_docs / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--procs", default="1,8,32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    batches = _load_texts(args.sf)
    n_docs = sum(len(b) for b in batches)
    out = {"sf": args.sf, "n_docs": n_docs, "procs": {}}
    for p in [int(x) for x in args.procs.split(",")]:
        best = max(run(p, batches) for _ in range(args.reps))
        out["procs"][str(p)] = round(best, 1)
        print(f"# procs={p} docs/s={best:.0f}", file=sys.stderr)
    if "8" in out["procs"] and "32" in out["procs"]:
        out["eff_8_32"] = round(out["procs"]["32"] / out["procs"]["8"] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
