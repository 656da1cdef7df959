#!/usr/bin/env python
"""Attribute the measured p4 per-task CPU-time inflation (~1.4x at 16 active
cores vs 4, stage telemetry in /tmp/probe_warm_r4c.json) to either
(a) host-level CPU oversubscription / steal (then even cache-resident pure
CPU work inflates) or (b) shared memory-subsystem contention (then only
memory-streaming work inflates).

Three kernels, each run with P pinned worker processes (P in 1, 4, 16):
  * cpu:   sha256 over a 4 KB cache-resident buffer, fixed iteration count
  * mem:   numpy copy of a 256 MB buffer (streams through LLC), fixed reps
  * rnd:   random 8-byte gathers over a private 256 MB working set
           (DRAM-latency-bound, the access pattern of hash-aggregation /
           join probes), fixed reps
Per-worker metric: MEDIAN per-rep wall (same robust statistic as the
campaign idle-gap probe — discards ambient transients); reported wall is
the median over workers. inflation = wall(P) / wall(P=1) (ideal 1.0 —
each worker always owns its own core, all buffers are worker-private).

Cores used: 0..P-1 (the same slices the elastic protocol pins workers to).
Output: one JSON line per (kernel, P) with per-worker walls.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def _cpu_kernel(core: int, reps: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import hashlib
    buf = os.urandom(4096)
    h = hashlib.sha256(buf)          # warm
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        for _ in range(50_000):
            h = hashlib.sha256(buf)
        walls.append(time.monotonic() - t0)
    q.put((core, _median(walls), h.hexdigest()[:4]))


def _mem_kernel(core: int, reps: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np
    a = np.ones(256 * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    np.copyto(b, a)                  # fault pages in (untimed)
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        np.copyto(b, a)
        walls.append(time.monotonic() - t0)
    q.put((core, _median(walls), int(b[0]) & 0xF))


def _rnd_kernel(core: int, reps: int, q) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np
    rng = np.random.default_rng(core + 1)
    a = np.ones(256 * 1024 * 1024 // 8, dtype=np.int64)
    idx = rng.integers(0, a.size, size=8 * 1024 * 1024)
    out = np.empty(idx.size, dtype=np.int64)
    np.take(a, idx, out=out)         # fault/warm (untimed)
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        np.take(a, idx, out=out)
        walls.append(time.monotonic() - t0)
    q.put((core, _median(walls), int(out[0]) & 0xF))


def run(kernel, arg: int, procs: int) -> list[float]:
    q = mp.Queue()
    ps = [mp.Process(target=kernel, args=(c, arg, q))
          for c in range(procs)]
    for p in ps:
        p.start()
    walls = [q.get(timeout=600)[1] for _ in ps]
    for p in ps:
        p.join()
    return sorted(round(w, 3) for w in walls)


def main() -> None:
    mp.set_start_method("spawn")
    for name, kernel, arg in (("cpu", _cpu_kernel, 9),
                              ("mem", _mem_kernel, 15),
                              ("rnd", _rnd_kernel, 15)):
        base = None
        for procs in (1, 4, 16):
            walls = run(kernel, arg, procs)
            med = walls[len(walls) // 2]
            if procs == 1:
                base = med
            print(json.dumps({
                "kernel": name, "procs": procs, "walls": walls,
                "median_wall": med,
                "inflation_vs_1": round(med / base, 3)}), flush=True)


if __name__ == "__main__":
    main()
