"""Merge two check_oracles.py ORACLE_OUT artifacts (two parallelism
levels) into CORRECTNESS_FULL_r{N}.json: per query, both runs must pass
AND be present; the artifact records both walls so value-identity across
parallelism is evidenced, not asserted.

Usage: python tools/merge_sweeps.py <out.json> <sweep_a.json> <sweep_b.json>
"""

import json
import sys


def main():
    out, a_path, b_path = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b = json.load(open(a_path)), json.load(open(b_path))
    ma, mb = a.pop("_meta"), b.pop("_meta")
    merged = {}
    names = sorted(set(a) | set(b))
    n_pass = 0
    for n in names:
        ra, rb = a.get(n), b.get(n)
        ok = bool(ra and rb and ra["ok"] and rb["ok"]
                  and ra["rows"] == rb["rows"])
        n_pass += ok
        merged[n] = {
            "ok": ok,
            "rows": ra["rows"] if ra else None,
            "status": ra["status"] if ra else "missing",
            f"secs_cpu{ma['cpus']}": ra["secs"] if ra else None,
            f"secs_cpu{mb['cpus']}": rb["secs"] if rb else None,
        }
    merged["_meta"] = {
        "n_queries": len(names), "n_pass_both": n_pass,
        "runs": [ma, mb],
        "note": ("full-registry driver-mimic sweep (tools/check_oracles.py) "
                 "at two parallelism levels; ok = value-exact vs the DuckDB/"
                 "golden oracle at BOTH levels with identical row counts"),
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"{n_pass}/{len(names)} pass at both levels -> {out}")


if __name__ == "__main__":
    main()
