#!/bin/bash
# The test-gated ship — the engine's analogue of the reference's
# cloudbuild.yaml:10-29, which runs the repo's unittests FIRST and only
# then copies the pipelines to the Composer bucket (ship gated on
# green). Here "shipping" a head = certifying it: the gate chains
#
#   gate 1: the full ScalaTest suite (sbt test), and
#   gate 2: the six-SF strict oracle certification
#           (tools/replay_all_sf.sh — itself hash-stamped per log and
#           completeness-gated),
#
# and exits 0 ONLY if both pass. The committed gate log
# (logs/ship_gate_<tag>.log) carrying the certified head hash is the
# "artifact copied to the bucket" analogue: ship-worthiness of a named
# commit is machine-checkable from the log alone.
#
# Usage: tools/ship_gate.sh <tag> [sf ...]   (SFs forwarded to replay_all_sf.sh;
#                                             default: all six)
set -u
cd /root/repo
TAG="${1:?usage: ship_gate.sh <tag> [sf ...]}"
shift || true
LOG="logs/ship_gate_${TAG}.log"
HEAD_HASH=$(git rev-parse HEAD)
echo "== ship gate $TAG head $HEAD_HASH start $(date -u +%FT%TZ) ==" | tee "$LOG"

echo "== gate 1/2: sbt test ==" | tee -a "$LOG"
if ! sbt -batch test > "/tmp/ship_gate_${TAG}_test.log" 2>&1; then
  grep -E "\*\*\* FAILED|Tests: succeeded" "/tmp/ship_gate_${TAG}_test.log" \
    | tail -20 | tee -a "$LOG"
  echo "== GATE FAILED: sbt test (full log: /tmp/ship_gate_${TAG}_test.log) ==" \
    | tee -a "$LOG"
  exit 1
fi
grep -E "Total number of tests run|Tests: succeeded" \
  "/tmp/ship_gate_${TAG}_test.log" | tail -2 | tee -a "$LOG"

echo "== gate 2/2: strict oracle certification ==" | tee -a "$LOG"
if ! tools/replay_all_sf.sh "$TAG" "$@" >> "$LOG" 2>&1; then
  tail -5 "$LOG"
  echo "== GATE FAILED: certification does not stand ==" | tee -a "$LOG"
  exit 1
fi
tail -1 "$LOG" # the CERTIFIED line from replay_all_sf.sh
echo "== SHIP GATE PASSED: head $HEAD_HASH tag $TAG $(date -u +%FT%TZ) ==" \
  | tee -a "$LOG"
