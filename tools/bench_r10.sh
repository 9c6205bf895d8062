#!/bin/bash
# Round bench pair: full contract at sf0.1 (driver scale, refreshes
# bench_perq.json) then at sf1.0 (the growth artifact,
# bench_perq_sf1.0.json). Median-of-3 with env header; sequential so
# each run owns the box.
set -u
cd /root/repo
echo "== bench sf0.1 start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 \
  sbt -batch "runMain graft.Bench" 2>/tmp/bench_r10_sf0.1.err \
  | grep '"metric"' > logs/bench_r10_sf0.1.jsonl
tail -1 logs/bench_r10_sf0.1.jsonl
echo "== bench sf1.0 start $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1.0 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_PERQ=bench_perq_sf1.0.json \
  sbt -batch "runMain graft.Bench" 2>/tmp/bench_r10_sf1.0.err \
  | grep '"metric"' > logs/bench_r10_sf1.0.jsonl
tail -1 logs/bench_r10_sf1.0.jsonl
echo "== bench pair done $(date -u +%H:%M:%S)"
