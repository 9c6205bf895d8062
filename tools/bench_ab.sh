#!/bin/bash
# Same-box A/B bench: adjudicates a round-over-round bench drift as CODE
# vs ENVIRONMENT by artifact instead of narrative (the r7->r8 and r9->r10
# lesson: uniform drift on untouched queries is the box, but only a
# same-box A/B minutes apart can prove it). Runs the SAME fixed 15-query
# subset (the round-10 adjudication set), median-of-3 with env header,
# on (A) a given previous git rev in a detached worktree and (B) the
# current head, sequentially so each run owns the box.
#
# Usage: tools/bench_ab.sh <prev-rev> [sf-dir] [out-prefix]
#   e.g. tools/bench_ab.sh 0ec5c22 /root/testdata/sf0.1 logs/bench_r11_ab
# Output: ${out-prefix}_prev.jsonl + ${out-prefix}_head.jsonl; compare
# the trailing "total" lines — a code regression shows in B only, a box
# drift shows in both (vs the round's committed artifact).
set -eu
PREV=${1:?usage: bench_ab.sh <prev-rev> [sf-dir] [out-prefix]}
SFDIR=${2:-/root/testdata/sf0.1}
PREFIX=${3:-logs/bench_ab}
# frozen adjudication subset (re-frozen round 15 at 17 queries): spans
# the pipeline core (oq), dedup/LSH/CC, text, window, similarity
# families, and — the round-14 verdict gap — the two STREAMING twins
# (w05/w06), the contract's highest round-over-round variance, now
# inside the instrument instead of invisible to it (median-of-3
# amortizes micro-batch startup). Totals are NOT comparable with
# rounds <= 14's 15-query artifacts; the r15 _prev run re-baselines.
SUBSET="oq01_filter,oq07_agg_suite,w05_stream_watermark,w06_stream_dedup,x05_fingerprints,x118_dedup_cascade,x142_sample_calib,x14_sessionize,x154_len_quality_corr,x157_detector_agreement,x21_cc_dedup,x42_anomaly,x50_dup_rate,x65_percent_rank,x71_retention,x91_bpe_merges,x92_leak_split"
cd "$(dirname "$0")/.."
WT=$(mktemp -d /tmp/graft_ab_XXXXXX)
rmdir "$WT"
git worktree add --detach "$WT" "$PREV" >/dev/null
trap 'git worktree remove --force "$WT" >/dev/null 2>&1 || true' EXIT
# the subset filter only exists since 27967ee — an older rev would
# silently bench all 207 queries and the trailing totals would not be
# comparable; fail fast instead
grep -q SPARK_GRAFT_BENCH_ONLY "$WT/src/main/scala/graft/Bench.scala" || {
  echo "ERROR: rev $PREV predates SPARK_GRAFT_BENCH_ONLY (27967ee);" \
       "its Bench would ignore the subset and bench everything" >&2
  exit 1
}
run() { # run <dir> -> filtered bench JSON on stdout
  ( cd "$1" &&
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_ONLY="$SUBSET" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' )
}
echo "== A (prev $PREV) start $(date -u +%H:%M:%S)"
run "$WT" > "${PREFIX}_prev.jsonl"
tail -1 "${PREFIX}_prev.jsonl"
echo "== B (current head) start $(date -u +%H:%M:%S)"
run . > "${PREFIX}_head.jsonl"
tail -1 "${PREFIX}_head.jsonl"
echo "== A/B done $(date -u +%H:%M:%S) — artifacts: ${PREFIX}_{prev,head}.jsonl"
