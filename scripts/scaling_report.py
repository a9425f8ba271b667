#!/usr/bin/env python3
"""Scaling-curve report: per-query times from two bench JSONs (sf0.1 and
sf1) with the sf1/sf0.1 ratio, sorted by ratio desc, flagging suspects.

With 10x the rows on the same 32 cores, a scan/shuffle-bound query should
grow ~<=10x; fixed-overhead queries (streaming micro-batch machinery, tiny
dimension scans) grow far less. A ratio well above 10 means superlinear
work (quadratic candidate generation, per-group blowup) — the thing the
curve exists to catch.

Usage: scaling_report.py BENCH_lo.json BENCH_hi.json [flag_ratio] [lo_label hi_label]
"""
import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    la = sys.argv[4] if len(sys.argv) > 4 else "sf0.1"
    lb = sys.argv[5] if len(sys.argv) > 5 else "sf1"
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(set(qa) | set(qb)):
        ta, tb = qa.get(name), qb.get(name)
        ratio = (tb / ta) if (ta and tb and ta > 0) else None
        rows.append((name, ta, tb, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"| query | {la} s | {lb} s | ratio | |")
    print(f"|---|---|---|---|---|")
    for name, ta, tb, ratio in rows:
        fa = f"{ta:.2f}" if ta is not None else "—"
        fb = f"{tb:.2f}" if tb is not None else "—"
        fr = f"{ratio:.1f}×" if ratio is not None else "—"
        mark = "⚠" if (ratio or 0) > flag else ""
        print(f"| {name} | {fa} | {fb} | {fr} | {mark} |")
    tot_a = sum(v for v in qa.values() if v)
    tot_b = sum(v for v in qb.values() if v)
    print(f"\ntotals: {la} {tot_a:.1f}s ({len(qa)} queries, "
          f"{a.get('failed')} failed) -> {lb} {tot_b:.1f}s ({len(qb)} queries, "
          f"{b.get('failed')} failed), ratio {tot_b / tot_a:.2f}x")
    flagged = [r for r in rows if (r[3] or 0) > flag]
    print(f"flagged (> {flag}x): {[r[0] for r in flagged]}")


if __name__ == "__main__":
    main()
