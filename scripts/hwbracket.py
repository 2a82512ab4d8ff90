#!/usr/bin/env python
"""Hardware bracket for the scaling protocol: measures this box's OWN
N->4N core-scaling ceiling, independent of Spark.

Two GIL-free microbenchmarks, run at each requested parallelism:

  stream   per-worker private 64 MB float64 buffer, repeated np.sum —
           RAM-bandwidth-bound (the resource a single box CANNOT
           multiply when cores are quadrupled, but a real 4N-node
           cluster does: each node brings its own memory bus)
  compute  L1-resident float math in SEPARATE PROCESSES —
           pure-CPU ceiling (vCPU oversubscription shows up here)

The crawl pipeline's measured N->4N efficiency should land between
stream_eff and compute_eff; if it sits AT or ABOVE the blended
hardware ceiling, the remaining gap to 0.8 is the box, not the engine.

Usage: python scripts/hwbracket.py --threads 4 16
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import threading
import time

import numpy as np

STREAM_MB = 64
STREAM_REPS = 40
COMPUTE_N = 4096  # floats: 32 KB, L1/L2-resident
COMPUTE_REPS = 20000


def _stream_worker(out, idx):
    buf = np.ones(STREAM_MB * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(STREAM_REPS):
        acc += float(buf.sum())  # releases the GIL inside np.sum
    out[idx] = (STREAM_MB / 1024 * STREAM_REPS) / (time.perf_counter() - t0)
    assert acc > 0


def stream_gbps(nthreads: int) -> float:
    out = [0.0] * nthreads
    ts = [threading.Thread(target=_stream_worker, args=(out, i))
          for i in range(nthreads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return round(sum(out), 1)


def _compute_worker(q):
    a = np.arange(COMPUTE_N, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(COMPUTE_REPS):
        a = a * 1.0000001 + 0.5
    ops = 2.0 * COMPUTE_N * COMPUTE_REPS
    q.put(ops / (time.perf_counter() - t0) / 1e9)


def compute_gops(nprocs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_compute_worker, args=(q,)) for _ in range(nprocs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, nargs=2, default=[4, 16],
                    metavar=("N", "FOURN"))
    args = ap.parse_args()
    n, n4 = args.threads
    scale = n4 / n
    res = {}
    for k in (n, n4):
        res[f"stream_GBps_{k}"] = stream_gbps(k)
        res[f"compute_gops_{k}"] = compute_gops(k)
    res[f"stream_eff_{n}_to_{n4}"] = round(
        res[f"stream_GBps_{n4}"] / (scale * res[f"stream_GBps_{n}"]), 3)
    res[f"compute_eff_{n}_to_{n4}"] = round(
        res[f"compute_gops_{n4}"] / (scale * res[f"compute_gops_{n}"]), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
