#!/usr/bin/env python3
"""Scaling-curve report: per-query times from two or more bench JSONs
(ascending scale factors) with step ratios, sorted by the LAST step's
ratio desc, flagging suspects.

With 10x the rows on the same 32 cores, a scan/shuffle-bound query should
grow ~<=10x per step; fixed-overhead queries (streaming micro-batch
machinery, tiny dimension scans) grow far less. A step ratio well above 10
means superlinear work (quadratic candidate generation, per-group blowup)
— the thing the curve exists to catch.

Usage: scaling_report.py BENCH1.json BENCH2.json [BENCH3.json ...]
           [--flag R] [--labels l1,l2,...]
Defaults: flag ratio 12, labels sf0.1,sf1,sf10,...
"""
import json
import sys


def main():
    args = sys.argv[1:]
    flag = 12.0
    labels = None
    paths = []
    i = 0
    while i < len(args):
        if args[i] == "--flag":
            flag = float(args[i + 1]); i += 2
        elif args[i] == "--labels":
            labels = args[i + 1].split(","); i += 2
        else:
            paths.append(args[i]); i += 1
    if len(paths) < 2:
        sys.exit("need at least two bench JSONs")
    if labels is None:
        labels = ["sf0.1", "sf1", "sf10", "sf100"][:len(paths)]
    benches = [json.load(open(p)) for p in paths]
    qs = [b["queries"] for b in benches]
    names = sorted(set().union(*qs))

    def fmt(v):
        return f"{v:.2f}" if v is not None else "—"

    rows = []
    for name in names:
        ts = [q.get(name) for q in qs]
        ratios = [
            (ts[j + 1] / ts[j]) if (ts[j] and ts[j + 1]) else None
            for j in range(len(ts) - 1)
        ]
        rows.append((name, ts, ratios))
    rows.sort(key=lambda r: -(r[2][-1] or 0))

    head = " | ".join(f"{l} s" for l in labels)
    rhead = " | ".join(f"{labels[j]}→{labels[j + 1]}" for j in range(len(labels) - 1))
    print(f"| query | {head} | {rhead} | |")
    print("|---" * (1 + len(labels) + len(labels) - 1) + "|---|")
    for name, ts, ratios in rows:
        cells = " | ".join(fmt(t) for t in ts)
        rcells = " | ".join(f"{r:.1f}×" if r is not None else "—" for r in ratios)
        mark = "⚠" if any((r or 0) > flag for r in ratios) else ""
        print(f"| {name} | {cells} | {rcells} | {mark} |")

    tots = [sum(v for v in q.values() if v) for q in qs]
    parts = [
        f"{labels[j]} {tots[j]:.1f}s ({len(qs[j])} queries, "
        f"{benches[j].get('failed')} failed)"
        for j in range(len(paths))
    ]
    steps = " ".join(
        f"{labels[j]}→{labels[j + 1]} {tots[j + 1] / tots[j]:.2f}x"
        for j in range(len(paths) - 1)
    )
    print(f"\ntotals: {' -> '.join(parts)}; step ratios: {steps}")
    flagged = sorted({r[0] for r in rows if any((x or 0) > flag for x in r[2])})
    print(f"flagged (> {flag}x on any step): {flagged}")


if __name__ == "__main__":
    main()
