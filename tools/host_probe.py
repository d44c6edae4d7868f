"""Host-weather probe: single-thread AND parallel memory bandwidth.

bench.py's probe gate (round 5) is single-threaded; round 6 found a
second host degradation mode it cannot see: the sandbox host sometimes
throttles PARALLEL bandwidth (16-thread aggregate ~11 GB/s, ~0.6
GB/s/thread) while the single-thread probe still reads healthy
(~15 GB/s cache-resident).  In that mode Arrow/numpy-streaming bench
lines (gorilla_encode, segments_ccdc) ran up to 5x slow on identical
code (BENCH/bench_r06_run7.json vs run4).  bench.py is FROZEN for
measurement, so the parallel probe lives here; run it next to any
suspicious bench number.

Usage: python tools/host_probe.py [n_threads]   (default 16)
Prints one JSON line:
  {"st_cache_gbs": .., "st_dram_gbs": .., "par_threads": N,
   "par_agg_gbs": .., "par_per_thread_gbs": ..}
Healthy anchors on this host: st_cache 10-15+, st_dram 5.5+,
par_agg well above ~25 (degraded windows measured ~11).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _bw(n: int) -> float:
    x = np.random.rand(n)
    outs = []
    for _ in range(3):
        t0 = time.time()
        _ = x * 1.5 + 2.0
        outs.append(n * 8 * 2 / (time.time() - t0) / 1e9)
    return round(statistics.median(outs), 2)


def _par(n_threads: int) -> tuple[float, float]:
    def work(_):
        x = np.random.rand(8_000_000)
        t0 = time.time()
        for _ in range(3):
            _y = x * 1.5 + 2.0
        return 8_000_000 * 8 * 2 * 3 / (time.time() - t0) / 1e9

    with ThreadPoolExecutor(n_threads) as ex:
        outs = sorted(ex.map(work, range(n_threads)))
    return round(sum(outs), 1), round(outs[len(outs) // 2], 2)


def main() -> None:
    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    _bw(1_000_000)  # allocator/page-fault warm-up (same as bench.py)
    st_cache = _bw(1_000_000)
    st_dram = _bw(30_000_000)
    agg, per = _par(n_threads)
    print(json.dumps({"st_cache_gbs": st_cache, "st_dram_gbs": st_dram,
                      "par_threads": n_threads, "par_agg_gbs": agg,
                      "par_per_thread_gbs": per}))


if __name__ == "__main__":
    main()
