#!/bin/bash
# Round-13 backfill measurement chain — sequential so each run owns the
# box. Four points: the two NEW delta modes (transactional PartitionStore
# store; bucketed catalog with the key-range-pregated probe) at the
# standard 90-day 6k shape, and the r12 delta mode at the PEAK day shapes
# (20k, 60k orders/day) the batch pipeline proved. Each run is followed
# by the DuckDB upsert-law replay (tools/check_backfill.py) against its
# final master.
set -u
cd /root/repo
run() { # run <days> <orders> <mode> <outRoot> <log> <finalMaster>
  echo "== backfill $3 $1x$2 -> $5 ($(date -u +%H:%M:%S))"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BackfillBench $1 $2 $3 $4" \
    2>/dev/null | grep '"metric"' > "$5"
  tail -1 "$5"
  python3 tools/check_backfill.py "$4" "$6" | tail -1
}
run 90 6000  delta_store /tmp/bf_r13_store "logs/backfill_r13_store.jsonl" /tmp/bf_r13_store/master_store_export
run 90 6000  bucketed    /tmp/bf_r13_bkt   "logs/backfill_r13_bucketed.jsonl" /tmp/bf_r13_bkt/warehouse/graft_backfill_master
run 15 20000 delta       /tmp/bf_r13_d20k  "logs/backfill_r13_delta20k.jsonl" /tmp/bf_r13_d20k/master_delta
run 8  60000 delta       /tmp/bf_r13_d60k  "logs/backfill_r13_delta60k.jsonl" /tmp/bf_r13_d60k/master_delta
echo "== backfill chain done ($(date -u +%H:%M:%S))"
