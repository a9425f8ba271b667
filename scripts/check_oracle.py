#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
graft.Verify parquet output, run the matching oracle SQL in DuckDB over the
same sf tables, and compare schema + rows (column-name-sorted, row-sorted,
exact values). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cmp_frames(name, spark_df, duck_df):
    problems = []
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return [f"schema mismatch: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} duck={len(b)}")
    nrows = min(len(a), len(b))
    for col in a.columns:
        av, bv = a[col].values[:nrows], b[col].values[:nrows]
        bad = 0
        first = None
        for i in range(nrows):
            x, y = av[i], bv[i]
            if x is None and y is None:
                continue
            xn = isinstance(x, float) and math.isnan(x)
            yn = isinstance(y, float) and math.isnan(y)
            if xn and yn:
                continue
            if pd.isna(x) and pd.isna(y):
                continue
            eq = (x == y)
            if isinstance(x, float) and isinstance(y, float) and not eq:
                eq = (x == y)  # exact: the convention demands bit-parity
            if not eq:
                bad += 1
                if first is None:
                    first = f"row {i}: spark={x!r} duck={y!r}"
        if bad:
            problems.append(f"col {col}: {bad}/{nrows} diff; first: {first}")
    # dtype note (non-fatal print)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(f"dtype {col}: spark={a[col].dtype} duck={b[col].dtype}")
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail = [], []
    import glob
    produced = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    for name in sorted(produced | set(oracle)):
        if name not in produced:
            fail.append((name, ["no spark output produced"]))
            continue
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            ok.append(f"{name} (rows-only: {len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            fail.append((name, [f"oracle SQL error: {e}"]))
            continue
        problems = cmp_frames(name, spark_df, duck_df)
        if problems:
            fail.append((name, problems))
        else:
            ok.append(f"{name} ({len(spark_df)} rows)")
    print(f"== PASS {len(ok)} ==")
    for o in ok:
        print("  ok:", o)
    print(f"== FAIL {len(fail)} ==")
    for name, probs in fail:
        print(f"  FAIL {name}:")
        for p in probs[:6]:
            print("    -", p)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
