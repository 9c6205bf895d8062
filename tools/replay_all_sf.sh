#!/bin/bash
# Five-SF strict certification of the full contract on ONE head:
# Verify-dump each scale factor, then replay every oracle in DuckDB
# (--strict) and log to logs/replay_<tag>_<sf>.log. SFs run
# SEQUENTIALLY (each Verify owns the box); the DuckDB side is capped by
# check_oracle.py's memory/threads/spill limits, so a concurrent driver
# replay cannot be starved by these runs.
#
# Usage: tools/replay_all_sf.sh <tag> [sf ...]   (default: all five)
set -u
cd /root/repo
TAG="${1:-r10}"
shift || true
SFS=("$@")
[ ${#SFS[@]} -eq 0 ] && SFS=(sf0.001 sf0.01 sf0.1 sf0.3 sf1.0)
dir_for() {
  case "$1" in
    sf0.3) echo /root/repo/testdata_sf0.3 ;;
    sf1.0) echo /root/repo/testdata_sf1.0 ;;
    *)     echo "/root/testdata/$1" ;;
  esac
}
for sf in "${SFS[@]}"; do
  d=$(dir_for "$sf")
  out="/tmp/verify_${TAG}_${sf}"
  echo "== $sf: Verify -> $out"
  SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $d $out" \
    > "/tmp/verify_${TAG}_${sf}.sbt.log" 2>&1
  if grep -q "\[verify\].*failed" "/tmp/verify_${TAG}_${sf}.sbt.log"; then
    echo "== $sf: VERIFY-STAGE FAILURES:"
    grep "\[verify\].*failed" "/tmp/verify_${TAG}_${sf}.sbt.log"
  fi
  echo "== $sf: oracle replay"
  python3 tools/check_oracle.py "$d" "$out" --strict \
    > "logs/replay_${TAG}_${sf}.log" 2>&1
  tail -1 "logs/replay_${TAG}_${sf}.log"
done
echo "== all requested SFs done"
