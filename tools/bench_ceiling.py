"""Hardware-ceiling microbench: a trivial scan+length aggregation with ZERO
engine logic, run at several parallelism levels in cold JVM subprocesses.

Purpose (BASELINE.json scaling row): on a single box, all local[N] threads
share one memory subsystem, so even this no-op job cannot scale linearly
once the DRAM bandwidth saturates. Its N->4N efficiency is therefore the
CEILING any Spark job can reach on this machine — published next to the
engine's numbers in BENCH/BASELINE_8_32.md so the gap attributable to the
engine (vs the box) is explicit. On a real cluster each executor brings
its own memory channels, so this ceiling does not exist there.

Usage: python tools/bench_ceiling.py [cpus ...]   (default 4 8 16 32)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from yatsm_spark.conf import get_spark
from yatsm_spark.synth import transcripts_for_sf

cpus = int(os.environ["CPUS"])
master = os.environ.get("CEILING_MASTER", f"local[{cpus}]")
extra = None
if master.startswith("local-cluster"):
    extra = {"spark.executor.memory": os.environ.get("CEILING_EXEC_MEM", "10g"),
             "spark.driver.memory": "8g"}
spark = get_spark(app_name="ceiling", master=master,
                  shuffle_partitions=max(cpus, 8), extra_confs=extra)
tx = transcripts_for_sf(spark, os.environ["SF_DIR"],
                        data_root=os.path.join(os.environ["REPO"], "data"))
best = None
for rep in range(2):  # rep0 = warmup (JIT + page cache), rep1 = measured
    t0 = time.time()
    row = tx.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.length("text")).alias("chars")).collect()[0]
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)

# Compute-pure probe: fixed TOTAL work (128 partitions x constant numpy
# kernel, ~no data movement). If this scales ~1.0 while the scan does not,
# the scan gap is the box's shared memory subsystem, not Spark overhead.
def _burn(it):
    # ~1 core-second per partition: long enough that the 128-task dispatch
    # + python worker spin-up (~0.7 s at 32 threads) stays a small
    # fraction of the wall at every level.
    import numpy as np
    rng = np.random.default_rng(0)
    A = rng.normal(size=(400, 4)); b = rng.normal(size=400)
    for _ in range(8000):
        np.linalg.lstsq(A, b, rcond=None)
    yield 1

cbest = None
for rep in range(2):
    t0 = time.time()
    spark.sparkContext.parallelize(range(128), 128).mapPartitions(_burn).count()
    dt = time.time() - t0
    cbest = dt if cbest is None else min(cbest, dt)

# Shuffle-bound probe: fixed total bytes through ONE full-width exchange
# (repartition by expression — no map-side reduction) and a noop sink.
# In thread mode the exchange is in-process memory; with process-isolated
# executors it is real serialize -> loopback socket -> deserialize, all
# contending for the same DRAM. This probe isolates exactly that cost:
# the engine's full job is a blend of scan + shuffle + compute, and only
# this reference moves bytes between executors the way its rollup
# exchanges do.
shuffle_df = (spark.range(0, 120_000_000, 1, 256)
              .selectExpr("id", "repeat('x', 32) AS payload",
                          "id % 7777777 AS key"))
sbest = None
for rep in range(2):
    t0 = time.time()
    shuffle_df.repartition(F.col("key")).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    sbest = dt if sbest is None else min(sbest, dt)
print(json.dumps({"cpus": cpus, "wall_s": round(best, 3),
                  "cpu_wall_s": round(cbest, 3),
                  "shuffle_wall_s": round(sbest, 3),
                  "rows": row["n"], "chars": int(row["chars"])}))
"""


#: BENCH_ISOLATION=process mirrors tools/bench_scaling.py: each level runs
#: as local-cluster[N/4, 4, mem] (separate executor JVMs) so the reference
#: probes share the ENGINE run's exact topology — required to attribute a
#: process-isolated efficiency drop to the one-box topology vs the engine.
ISOLATION = os.environ.get("BENCH_ISOLATION", "thread")
CORES_PER_EXEC = int(os.environ.get("BENCH_CORES_PER_EXEC", "4"))
EXEC_MEM_MB = int(os.environ.get("BENCH_EXEC_MEM_MB", "12288"))


def run(cpus: int) -> dict:
    env = dict(os.environ, REPO=REPO, CPUS=str(cpus), SF_DIR=SF_DIR)
    if ISOLATION == "process":
        n_exec = max(1, cpus // CORES_PER_EXEC)
        env["CEILING_MASTER"] = f"local-cluster[{n_exec},{CORES_PER_EXEC},{EXEC_MEM_MB}]"
        env["CEILING_EXEC_MEM"] = f"{EXEC_MEM_MB * 5 // 6}m"
    p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def main():
    levels = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    out = {}
    for c in levels:
        out[c] = run(c)
        print(f"local[{c}]: {out[c]['wall_s']}s "
              f"({out[c]['rows'] / out[c]['wall_s'] / 1e6:.1f}M rows/s)", file=sys.stderr)
    effs, cpu_effs, sh_effs = {}, {}, {}
    for lo in levels:
        for hi in levels:
            if hi == 4 * lo and lo in out and hi in out:
                effs[f"{lo}->{hi}"] = round(
                    (out[lo]["wall_s"] / out[hi]["wall_s"]) / 4, 3)
                cpu_effs[f"{lo}->{hi}"] = round(
                    (out[lo]["cpu_wall_s"] / out[hi]["cpu_wall_s"]) / 4, 3)
                if "shuffle_wall_s" in out[lo] and "shuffle_wall_s" in out[hi]:
                    sh_effs[f"{lo}->{hi}"] = round(
                        (out[lo]["shuffle_wall_s"] / out[hi]["shuffle_wall_s"]) / 4, 3)
    payload = {"sf": SF_DIR, "isolation": ISOLATION, "walls": out,
               "ceiling_efficiency": effs, "cpu_pure_efficiency": cpu_effs,
               "shuffle_efficiency": sh_effs}
    out_name = "ceiling.json" if ISOLATION != "process" else "ceiling_process.json"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
