#!/usr/bin/env python3
"""Merge per-query fresh-JVM bench records into one artifact.

Each input file is a full graft.Bench JSON record that happened to measure a
single query (SPARK_GRAFT_BENCH_ONLY=<q>). The merged artifact keeps the same
shape as a one-JVM run plus a "method" field recording the methodology, so a
reader can tell these numbers carry no cross-query JVM-accumulation tax.

Usage: merge_bench.py <indir> <outfile>
"""
import json, sys, glob, os

indir, outfile = sys.argv[1], sys.argv[2]
queries, errors, raw = {}, {}, {}
sf = master = shuffle = runs = None
for f in sorted(glob.glob(os.path.join(indir, "*.json"))):
    d = json.load(open(f))
    queries.update(d["queries"])
    errors.update(d.get("errors", {}))
    raw.update(d.get("raw_runs", {}))
    sf, master, shuffle, runs = d["sf"], d["master"], d["shuffle_partitions"], d["runs"]

total = sum(v for v in queries.values() if v is not None)
failed = sum(1 for v in queries.values() if v is None)
out = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": dict(sorted(queries.items())),
    "errors": errors, "failed": failed, "runs": runs,
    "raw_runs": dict(sorted(raw.items())),
    "sf": sf, "master": master, "shuffle_partitions": shuffle,
    "method": "fresh-jvm-per-query, min-of-%s; no cross-query JVM state "
              "(kills the runs=1 accumulation tax measured in r9)" % runs,
    # explanations travel WITH the numbers so a reader of this artifact
    # alone never mistakes a measured wall for a plan defect
    "notes": {
        "x09_token_count": "scan-bound: pure per-row tokenize+count, no "
            "shuffle to remove, no pushdown left; the super-linear sf10->sf100 "
            "step is the single-node memory-bandwidth wall (BASELINE #C)",
        "st20_stream_semdedup_gate": "candidate pairs measured exactly linear "
            "(ProbeSt20, 10.15x per 10x rows); residual over-linear step is the "
            "same single-node memory wall — fresh-JVM solo equals the warm "
            "sidecar, so no harness effect remains (BASELINE #C)",
    },
}
with open(outfile, "w") as fh:
    fh.write(json.dumps(out, separators=(",", ":")) + "\n")
print("merged %d queries, %d failed, total %.1f s -> %s"
      % (len(queries), failed, total, outfile))
