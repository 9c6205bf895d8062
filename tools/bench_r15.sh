#!/bin/bash
# Round-15 measurement chain — sequential so each run owns the box.
#
# 1. VacuumBench growth-vs-flat A/B (r14 verdict task 3 artifact): the
#    cohort-cycling emptying shape, 90 days x 6k rows x 7 cohorts,
#    (a) never vacuuming (the unbounded-residue baseline) and
#    (b) vacuuming every 7 days — physical footprint must grow
#    linearly in (a) and stay flat at live + reader window in (b),
#    with the logical store law-identical in both.
# 2. Quarter-length peak-shape backfill (r14 verdict task 5): the
#    60k-orders/day shape where the BucketedStore layout inverts,
#    run 90 days on bucketed_store vs delta_store, each followed by
#    the exact DuckDB upsert-law replay of its final master.
# 3. Same-box A/B on the re-frozen 17-query subset (r14 verdict task
#    2: w05/w06 now inside the instrument) vs the round-14 final
#    engine head f83640f.
set -u
cd /root/repo
run_vac() { # run_vac <vacuumEvery> <log>
  echo "== vacuum bench every=$1 -> $2 ($(date -u +%H:%M:%S))"
  local out=/tmp/vac_r15_$1
  rm -rf "$out"
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.VacuumBench 90 6000 7 $1 $out" \
    2>/dev/null | grep '"metric"' > "$2"
  tail -1 "$2"
  rm -rf "$out"
}
run_bf() { # run_bf <days> <orders> <mode> <outRoot> <log> <finalMaster>
  echo "== backfill $3 $1x$2 -> $5 ($(date -u +%H:%M:%S))"
  rm -rf "$4"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BackfillBench $1 $2 $3 $4" \
    2>/dev/null | grep '"metric"' > "$5"
  tail -1 "$5"
  python3 tools/check_backfill.py "$4" "$6" | tail -1
}
run_vac 0 logs/vacuum_r15_nogc.jsonl
run_vac 7 logs/vacuum_r15_gc7.jsonl
run_bf 90 60000 bucketed_store /tmp/bf_r15_bs60k logs/backfill_r15_bstore60k_90d.jsonl /tmp/bf_r15_bs60k/master_bstore_export
run_bf 90 60000 delta_store    /tmp/bf_r15_ds60k logs/backfill_r15_store60k_90d.jsonl  /tmp/bf_r15_ds60k/master_store_export
tools/bench_ab.sh f83640f /root/testdata/sf0.1 logs/bench_r15_ab
echo "== r15 chain done ($(date -u +%H:%M:%S))"
