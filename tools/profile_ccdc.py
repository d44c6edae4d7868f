"""Profile the CCDC kernel on REAL bench series (no Spark): rebuild the
dense 1m turn_count series per conv with DuckDB exactly as the operator
does (rollup + in-kernel densify), then run ccdc_fit over a sample of
convs under cProfile. Prints total kernel seconds, per-conv stats and the
top cumulative functions — evidence for OPTIMIZATION_r06.md.

Usage: python tools/profile_ccdc.py [n_convs] [--profile]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

TX = os.environ.get(
    "TX_PATH", "/root/repo/data/transcripts_sf0.1.parquet/*.parquet")


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2000
    from yatsm_spark.kernel.ccdc import ccdc_fit, CCDCParams
    from yatsm_spark.kernel.gapfill import gapfill_slots
    from yatsm_spark.operators.changescore import CONV_PARAMS

    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT conv_id,
               (floor(epoch(ts)/60)*60)::bigint AS slot,
               count(*)::bigint AS y
        FROM read_parquet('{TX}')
        GROUP BY 1, 2 ORDER BY conv_id, slot
    """).fetchnumpy()
    conv = rows["conv_id"]
    slots = rows["slot"]
    ys = rows["y"]
    # group boundaries (input sorted by conv)
    change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    bounds = np.concatenate([[0], change, [len(conv)]])
    n_groups = len(bounds) - 1
    take = min(n_convs, n_groups)
    print(f"# {n_groups} convs total, profiling first {take}")

    series = []
    for gi in range(take):
        lo, hi = bounds[gi], bounds[gi + 1]
        series.append((slots[lo:hi], ys[lo:hi]))

    def run():
        total_pts = 0
        nseg = 0
        for ep, y in series:
            dense = gapfill_slots(ep, {"y": y.astype(np.int64)}, step=60)
            t = dense["slot_epoch"] / 86400.0
            yv = dense["y"].astype(np.float64)
            total_pts += len(t)
            res = ccdc_fit(t, yv, CCDCParams(**CONV_PARAMS.__dict__))
            nseg += len(res.segments)
        return total_pts, nseg

    t0 = time.time()
    total_pts, nseg = run()
    dt = time.time() - t0
    print(f"# plain: {dt:.2f}s for {take} convs, {total_pts} dense pts, "
          f"{nseg} segments -> {1e6 * dt / max(total_pts, 1):.2f} us/pt")

    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        run()
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
        print(s.getvalue())


if __name__ == "__main__":
    main()
