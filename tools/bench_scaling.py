"""Two-parallelism scaling run (north rule: N vs 4N executors — sandbox
proxy local[8] vs local[32]) -> BENCH/BASELINE.md.

Protocol (BASELINE.md): identical input bytes, cold JVM per run (separate
subprocesses), median over BENCH_REPS; efficiency = (thr32/thr8)/4.
Also cross-checks tier hashes between the two parallelism levels —
exactness across cluster sizes is part of the parity claim.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOW = int(os.environ.get("BENCH_LOW_CPUS", "8"))
HIGH = int(os.environ.get("BENCH_HIGH_CPUS", "32"))
REPS = int(os.environ.get("BENCH_SCALE_REPS", "2"))


def run(cmd, cpus):
    # BENCH_REPS=2 + min(): the first in-JVM pass is the warmup (JIT, page
    # cache); the reported number is steady-state compute, which is what a
    # long-running cluster job looks like and what the N->4N efficiency
    # criterion is about. JVMs are still cold per (rep, cpus) subprocess.
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_FULL_JOB="1", BENCH_REPS="2")
    p = subprocess.run([sys.executable, cmd], env=env, capture_output=True, text=True,
                       cwd=REPO, timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"{cmd} cpus={cpus} failed:\n{p.stderr[-2000:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def main():
    results = {LOW: [], HIGH: []}
    for rep in range(REPS):
        for cpus in (LOW, HIGH):
            r = run("bench.py", cpus)
            results[cpus].append(r)
            print(f"rep{rep} cpus={cpus}: wall={r['value']}s "
                  f"thr={r['turns_rolled_per_sec']}/s", file=sys.stderr)

    def med(c, key):
        vals = sorted(x[key] for x in results[c])
        return vals[len(vals) // 2]

    thr_low = med(LOW, "turns_rolled_per_sec")
    thr_high = med(HIGH, "turns_rolled_per_sec")
    eff = (thr_high / thr_low) / (HIGH / LOW)

    hashes = {c: run("tools/tier_hash.py", c) for c in (LOW, HIGH)}
    tiers_match = hashes[LOW]["tiers"] == hashes[HIGH]["tiers"]

    n_turns = results[HIGH][0]["n_turns"]
    lines = [
        "# BENCH/BASELINE.md — scaling + throughput evidence",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())} by tools/bench_scaling.py.",
        f"Input: deterministic transcripts for `{SF_DIR}` ({n_turns:,} turns), identical bytes for every run;",
        f"cold JVM per run; median of {REPS} reps; pipeline = measures -> 1m rollup -> gap-fill -> 1h -> 1d cascade (noop sink).",
        "",
        "| parallelism | wall s (median) | turns/s |",
        "|---|---|---|",
        f"| local[{LOW}] | {med(LOW, 'value')} | {thr_low:,.0f} |",
        f"| local[{HIGH}] | {med(HIGH, 'value')} | {thr_high:,.0f} |",
        "",
        f"**Scaling efficiency ({LOW} -> {HIGH} cores, x{HIGH // LOW}): "
        f"{eff:.3f}** (target >= 0.8 per BASELINE.json).",
        "",
        "## Cross-parallelism exactness",
        "",
        f"Tier hashes (bit_xor of xxhash64 over all columns) at local[{LOW}] vs local[{HIGH}]: "
        + ("**identical** for 1m/1h/1d — integral-moment design makes aggregation "
           "order irrelevant (SURVEY.md §7.5.1)." if tiers_match else "**MISMATCH — BUG**"),
        "",
        "```json",
        json.dumps(hashes[HIGH]["tiers"], indent=1),
        "```",
        "",
        "## Per-stage wall times at local[%d] (median rep)" % HIGH,
        "",
        "| stage | sec |",
        "|---|---|",
    ]
    q = sorted(results[HIGH], key=lambda r: r["value"])[len(results[HIGH]) // 2]["queries"]
    for k, v in q.items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"eff": round(eff, 3), "thr_low": thr_low, "thr_high": thr_high,
                      "tiers_match": tiers_match}))
    if not tiers_match:
        sys.exit(1)


if __name__ == "__main__":
    main()
