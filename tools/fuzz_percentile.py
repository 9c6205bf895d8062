#!/usr/bin/env python3
"""Fuzz DuckDB quantile_cont against the linear-interpolation closed form.

The contract's percentile discipline (x61/x83/x84 and the quantile-bucket
family) assumes Spark `percentile` == DuckDB `quantile_cont` after
ROUND(.,4). Both are supposed to implement the same definition: linear
interpolation at rank h = p*(n-1) over the sorted values,
v[floor(h)] + (h - floor(h)) * (v[floor(h)+1] - v[floor(h)]), in double
arithmetic. PropertiesSpec pins the Spark side to this closed form; this
script pins the DuckDB side, so the cross-engine parity claim is tested
from both ends rather than asserted.

Usage: fuzz_percentile.py [n_cases] (default 200; exit 1 on any mismatch)
"""
import decimal
import math
import random
import sys

import duckdb


def closed_form(vals, p):
    s = sorted(float(v) for v in vals)
    h = p * (len(s) - 1)
    lo = math.floor(h)
    if lo + 1 < len(s):
        exact = s[lo] + (h - lo) * (s[lo + 1] - s[lo])
    else:
        exact = s[lo]
    # HALF_UP over the exact double (Python's round() is banker's — wrong
    # at ties); matches Spark round() and DuckDB ROUND on positives
    return float(decimal.Decimal(exact).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP))


def main(n_cases):
    random.seed(7)
    con = duckdb.connect()
    bad = 0
    for i in range(n_cases):
        n = random.randint(1, 400)
        vals = [random.randint(0, 10000) for _ in range(n)]
        p = random.choice([0.05, 0.25, 0.5, 0.75, 0.95])
        got = con.execute(
            "SELECT ROUND(quantile_cont(v, ?), 4) FROM (SELECT unnest(?) AS v)",
            [p, vals]).fetchone()[0]
        want = closed_form(vals, p)
        if got != want:
            print(f"MISMATCH case {i}: p={p} n={n} duckdb={got!r} closed={want!r}")
            bad += 1
    print(f"== {n_cases - bad} pass / {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 200))
