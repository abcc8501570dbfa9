"""Hardware-ceiling calibration for the scaling-efficiency evidence:
run the scoring kernel (kernels.cross_token_set_scores) under plain
multiprocessing — zero Spark — at 4/8/16/32 procs and print pairs/sec.

This isolates what the single 32-core sandbox box can physically do as
thread count rises (all-core turbo droop + one shared memory controller).
The Spark pipeline's measured scaling efficiency should be read against
this ceiling: on a real N→4N-EXECUTOR cluster both effects vanish
(4N machines = 4N memory controllers and per-chip turbo headroom).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BLOCKS, S_PER, R_PER = 96, 420, 520


def make_work(n_blocks: int, s_per: int, r_per: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    words = ["ash", "road", "london", "flat", "court", "house", "street",
             "avenue", "green", "park", "hill", "grove", "mill", "king",
             "queen", "station"]

    def addr():
        k = rng.randint(3, 7)
        return [str(rng.randint(1, 200))] + [
            words[rng.randint(len(words))] for _ in range(k)
        ]

    return [
        ([addr() for _ in range(s_per)], [addr() for _ in range(r_per)])
        for _ in range(n_blocks)
    ]


def work(args):
    from address_matcher_spark import kernels as K

    l, r = args
    return len(K.cross_token_set_scores(l, r, 85.0)[0])


def _spin(_):
    """L1-resident integer work: no DRAM traffic, no allocator — measures
    the box's pure all-core frequency/scheduling ceiling, the upper bound
    ANY workload (however cache-friendly) can scale to."""
    a = np.arange(4096, dtype=np.uint64)
    b = a.copy()
    acc = a.copy()
    for _ in range(12000):
        np.bitwise_and(acc, b, out=acc)
        np.add(acc, a, out=acc)
        np.bitwise_or(acc, b, out=acc)
    return int(acc[0])


def compute_ceiling() -> dict[int, float]:
    res = {}
    for procs in [8, 32]:
        with mp.Pool(procs) as pool:
            pool.map(_spin, range(procs))
            t0 = time.perf_counter()
            pool.map(_spin, range(procs * 4))
            dt = time.perf_counter() - t0
        res[procs] = procs * 4 / dt
    return res


def main() -> None:
    blocks = make_work(N_BLOCKS, S_PER, R_PER)
    pairs = N_BLOCKS * S_PER * R_PER
    results = {}
    for procs in [4, 8, 16, 32]:
        with mp.Pool(procs) as pool:
            pool.map(work, blocks[:procs])  # warm the pool
            t0 = time.perf_counter()
            pool.map(work, blocks)
            dt = time.perf_counter() - t0
        results[procs] = pairs / dt
        print(f"procs={procs} time={dt:.2f}s pairs_per_sec={pairs/dt/1e6:.2f}M")
    kern_832 = (results[32] / results[8]) / 4
    print(f"eff 4->16: {(results[16]/results[4])/4:.3f}   "
          f"eff 8->32: {kern_832:.3f}")
    ceil = compute_ceiling()
    ceil_832 = ceil[32] / ceil[8] / 4
    print(f"L1-resident compute ceiling 8->32: {ceil_832:.3f} "
          f"(kernel reaches {100*kern_832/ceil_832:.0f}% of the box's "
          f"attainable scaling)")


if __name__ == "__main__":
    main()
