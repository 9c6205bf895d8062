#!/usr/bin/env python3
"""Full-contract round-over-round bench diff.

Compares two per-query timing artifacts and prints the queries whose
ratio moved most, plus sums over the common subset. Accepts any mix of:

  - bench_perq.json        (Bench's in-repo artifact: {"unit":"ms","queries":{...}})
  - BENCH_r<N>.json        (driver artifact: only the tail survives its
                            capture — parsed best-effort from the "tail"
                            field, so older rounds cover ~57 queries)

Usage: diff_bench.py <old.json> <new.json> [topN] [--growth=<factor>]

The point (r8 verdict task 1): the driver's BENCH tail truncates to the
last ~57 query names, leaving 70% of the contract invisible to
regression diffs. bench_perq.json carries all of them; this tool makes
the comparison one command.

--growth mode (r9 verdict task 2): when the two artifacts are the SAME
code at DIFFERENT scale factors (e.g. bench_perq.json at sf0.1 vs
bench_perq_sf1.0.json), pass the data-size factor between them
(--growth=10 for sf0.1 -> sf1.0). The ratio column then reads as a
SCALING exponent: ratio == factor is linear growth, ratio well above
factor is super-linear (the operator to investigate before a 100 TB
run), ratio below is sub-linear (fixed overhead amortizing). Queries
are bucketed accordingly and the super-linear set is listed in full.
Sub-second queries are noise-dominated at both scales and marked.
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


def growth_report(rows, factor):
    """Bucket sf-step ratios against the data-size factor.

    super-linear: ratio > 1.3 * factor AND the big-scale time is over a
    second (sub-second queries are startup/jitter-dominated and a 3x on
    80 ms is measurement, not scaling).
    """
    sup, lin, sub = [], [], []
    for ratio, k, o, n in rows:
        if ratio > 1.3 * factor and n >= 1.0:
            sup.append((ratio, k, o, n))
        elif ratio >= 0.7 * factor:
            lin.append((ratio, k, o, n))
        else:
            sub.append((ratio, k, o, n))
    print(f"\ngrowth vs data factor {factor:g}x: "
          f"{len(sup)} super-linear, {len(lin)} ~linear, "
          f"{len(sub)} sub-linear of {len(rows)}")
    print(f"\nsuper-linear (ratio > {1.3 * factor:g}x and >= 1 s at scale)"
          " — investigate before a further 10x:")
    if not sup:
        print("  (none)")
    for ratio, k, o, n in sup:
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s")
    print(f"\nsteepest 15 overall (noise-marked when < 1 s at scale):")
    for ratio, k, o, n in rows[:15]:
        flag = "  [sub-second: noise]" if n < 1.0 else ""
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s{flag}")


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    growth = None
    args = []
    for a in sys.argv[3:]:
        if a.startswith("--growth="):
            growth = float(a.split("=", 1)[1])
        else:
            args.append(a)
    top_n = int(args[0]) if args else 15
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
    if growth is not None:
        growth_report(rows, growth)
        return
    print(f"\ntop {top_n} regressions (new/old):")
    for ratio, k, o, n in rows[:top_n]:
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s")
    print(f"\ntop {top_n} improvements:")
    for ratio, k, o, n in rows[::-1][:top_n]:
        print(f"  {ratio:6.2f}x  {k:32s} {o:8.3f}s -> {n:8.3f}s")


if __name__ == "__main__":
    main()
