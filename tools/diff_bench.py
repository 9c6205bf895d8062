#!/usr/bin/env python3
"""Full-contract round-over-round bench diff.

Compares two per-query timing artifacts and prints the queries whose
ratio moved most, plus sums over the common subset. Accepts any mix of:

  - bench_perq.json        (Bench's in-repo artifact: {"unit":"ms","queries":{...}})
  - BENCH_r<N>.json        (driver artifact: only the tail survives its
                            capture — parsed best-effort from the "tail"
                            field, so older rounds cover ~57 queries)

Usage: diff_bench.py <old.json> <new.json> [topN]

The point (r8 verdict task 1): the driver's BENCH tail truncates to the
last ~57 query names, leaving 70% of the contract invisible to
regression diffs. bench_perq.json carries all of them; this tool makes
the comparison one command.
"""
import json
import re
import sys


def load(path):
    """-> (name -> seconds)"""
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        q = d["queries"]
        scale = 1e-3 if d.get("unit") == "ms" else 1.0
        return {k: v * scale for k, v in q.items() if v is not None and v >= 0}
    if "tail" in d:  # driver artifact: reconstruct what the capture kept
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.]+)', d["tail"])
        summary = {"n", "rc", "cpus", "sf", "value", "failed", "filtered",
                   "events", "orders", "packages", "runs", "heap_max_gb",
                   "load_avg", "total"}
        return {k: float(v) for k, v in pairs
                if k not in summary and float(v) >= 0}
    raise SystemExit(f"{path}: no queries/tail field")


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    only_old, only_new = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    if not common:
        raise SystemExit("no common queries")
    rows = []
    for k in common:
        o, n = old[k], new[k]
        ratio = n / o if o > 0 else float("inf")
        rows.append((ratio, k, o, n))
    rows.sort(reverse=True)
    print(f"common subset: {len(common)} queries | "
          f"sum {sum(old[k] for k in common):.2f}s -> "
          f"{sum(new[k] for k in common):.2f}s "
          f"({sum(new[k] for k in common) / sum(old[k] for k in common):.3f}x)")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old[:8])}"
              + (" ..." if len(only_old) > 8 else ""))
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new[:8])}"
              + (" ..." if len(only_new) > 8 else ""))
    print(f"\ntop {top_n} regressions (new/old):")
    for ratio, k, o, n in rows[:top_n]:
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s")
    print(f"\ntop {top_n} improvements:")
    for ratio, k, o, n in rows[::-1][:top_n]:
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s")


if __name__ == "__main__":
    main()
