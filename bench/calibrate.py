"""Environment calibration for the scaling evidence: what parallel speedup
can THIS box physically deliver?

Two probes, both trivial and embarrassingly parallel:

* streaming — per-process numpy passes over a 32 MB uint64 array
  (pure DRAM bandwidth; every real data workload sits between this and
  register-only compute)
* register — per-process integer mixing on a cache-resident array

Prints per-level aggregate throughput (units/s) at 1, 2, 4, 8, 16, 32
processes. Interpretation: if streaming throughput saturates at K x the
single-process rate, no memory-touching workload can scale past K on this
box regardless of plan shape — the scaling BENCH must compare parallelism
levels whose total demand stays under that wall.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _stream_worker(q):
    a = np.arange(4_000_000, dtype=np.uint64)  # 32 MB, far beyond L2
    t0 = time.monotonic()
    for _ in range(120):
        b = a ^ np.uint64(123456789)
        b *= np.uint64(0xBF58476D1CE4E5B9)
        b ^= b >> np.uint64(27)
    q.put(time.monotonic() - t0)


def _register_worker(q):
    x = np.uint64(88172645463325252)
    t0 = time.monotonic()
    acc = np.uint64(0)
    for _ in range(3_000_000):
        x ^= (x << np.uint64(13)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(7)
        acc += x
    q.put(time.monotonic() - t0)


def run(worker, n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    per = [q.get() for _ in range(n)]
    for p in ps:
        p.join()
    return n / (sum(per) / n)  # aggregate units per second


def main() -> None:
    levels = [1, 2, 4, 8, 16, 32]
    out = {"levels": levels, "streaming_units_per_sec": [],
           "register_units_per_sec": []}
    for n in levels:
        out["streaming_units_per_sec"].append(round(run(_stream_worker, n), 2))
    for n in levels:
        out["register_units_per_sec"].append(round(run(_register_worker, n), 2))
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
