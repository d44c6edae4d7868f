#!/bin/bash
# Cache-state-controlled sf1.0 protocol (round-3 VERDICT next #5):
# pre-touch the 27 GB input into page cache before EVERY rep, fixed
# config (128-wide shuffle, tmpfs tiers, local[32]), cold JVM per rep.
# Usage: bench_sf1_protocol.sh [rep ...]   (default: 1 2 3)
set -u
cd /root/repo
OUT=BENCH/sf1_protocol_runs.jsonl
for rep in "${@:-1 2 3}"; do
  t0=$(date +%s)
  cat data/transcripts_sf1.0.parquet/*.parquet > /dev/null
  t1=$(date +%s)
  echo "{\"rep\": $rep, \"pretouch_s\": $((t1-t0))}" >> "$OUT"
  SPARK_GRAFT_SF_DIR=sf1.0 SPARK_GRAFT_CPUS=32 BENCH_FULL_JOB=1 BENCH_REPS=1 \
    BENCH_SHUFFLE_PARTITIONS=128 BENCH_WORK_DIR=/dev/shm/yatsm_bench_sf1 \
    python bench.py 2>/dev/null | tail -1 >> "$OUT"
done
rm -rf /dev/shm/yatsm_bench_sf1
