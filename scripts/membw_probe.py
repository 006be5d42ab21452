#!/usr/bin/env python
"""Memory-bandwidth scaling calibration for the two-cluster-size evidence.

The pure-CPU calibration in bench_scaling.py (cache-resident integer loop)
measures the box's CPU ceiling between N and 4N concurrent processes. A
shuffle-heavy Spark job is not cache-resident: exchanges, sorts, and Arrow
transfers stream through DRAM, so the ceiling that binds them is the
*memory-bandwidth* speedup between the two concurrency levels — on this
single-socket VM all threads share one memory controller, whereas on a real
cluster 4N executors bring 4N sockets' worth of bandwidth with them.

Each worker process streams over a buffer far larger than L3 (256 MiB of
float64) doing a triad-style update (a = a * s + b), the classic STREAM
pattern. Effective parallelism at n procs = n * t_serial / t_wall, same
definition as the CPU probe. Output: one JSON line with effective
parallelism at 1/4/16/32 procs and the 4→16 bandwidth speedup, consumed by
BENCH/BASELINE.md alongside the CPU calibration.

Run AFTER benches finish — it saturates the memory bus for ~1-2 min.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

N_ELEM = 32 * 1024 * 1024  # 256 MiB of float64 per process, >> L3
PASSES = 6


def _stream(_):
    a = np.ones(N_ELEM)
    b = np.full(N_ELEM, 0.5)
    t0 = time.time()
    for _ in range(PASSES):
        a *= 1.000001
        a += b
    return time.time() - t0


def calibrate_membw(
    ns=(1, 4, 16, 32), pinned: bool = False, repeat: int = 1
) -> dict[int, float]:
    """Effective bandwidth parallelism at each n (n * t_serial / t_wall).

    The SINGLE definition of this calibration — bench_scaling.py calls it
    with pinned=True, repeat=3 so the number is measured under the same
    taskset confinement + min-of-k noise policy as the benches it
    normalizes. pinned confines the pool to CPUs 0..n-1 (the same
    container-bounded-executor proxy the benches use); repeat takes the
    min over k timed passes after an untimed page-fault warmup."""
    all_cpus = os.sched_getaffinity(0)
    _stream(0)  # touch pages / warm allocator in the parent before forking
    serials = []
    for _ in range(max(1, repeat)):
        t0 = time.time()
        _stream(0)
        serials.append(time.time() - t0)
    serial = min(serials)
    out = {1: 1.0}
    for n in ns:
        if n == 1:
            continue
        if pinned:
            os.sched_setaffinity(0, set(range(n)))
        try:
            walls = []
            with mp.Pool(n) as p:
                # pool warmup: fault in each worker's buffers untimed
                p.map(_stream, range(n))
                for _ in range(max(1, repeat)):
                    t0 = time.time()
                    p.map(_stream, range(n))
                    walls.append(time.time() - t0)
        finally:
            if pinned:
                os.sched_setaffinity(0, all_cpus)
        out[n] = round(n * serial / min(walls), 2)
    return out


def main() -> None:
    cal = calibrate_membw()
    summary = {
        "metric": "membw_effective_parallelism",
        "per_procs": cal,
        "membw_speedup_4_to_16": round(cal[16] / cal[4], 2) if cal.get(4) else None,
        "note": "STREAM-triad over 256MiB/proc; the ceiling for shuffle-heavy stages",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
