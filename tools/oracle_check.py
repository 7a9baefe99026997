#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB (tables =
testdata parquet registered as views), loads the Spark result parquet from
<outDir>/<name>/, and compares: columns sorted by name, rows sorted, values
compared exactly (with dtype report). Dev tool only — not part of the
library.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        e2, g2 = norm(expect), norm(got)
        if list(e2.columns) != list(g2.columns):
            print(f"FAIL {name}: columns differ: oracle={list(e2.columns)} spark={list(g2.columns)}")
            n_bad += 1
            continue
        if len(e2) != len(g2):
            print(f"FAIL {name}: row count differ: oracle={len(e2)} spark={len(g2)}")
            n_bad += 1
            continue
        mismatch = None
        for c in e2.columns:
            a, b = e2[c], g2[c]
            try:
                same = (a.astype(object).where(pd.notnull(a), None).tolist() ==
                        b.astype(object).where(pd.notnull(b), None).tolist())
            except Exception:
                same = False
            if not same:
                for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
                    if x != y and not (pd.isnull(x) and pd.isnull(y)):
                        mismatch = (c, i, x, y)
                        break
                if mismatch:
                    break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: value mismatch col={c} row={i}: oracle={x!r} ({expect[c].dtype}) spark={y!r} ({got[c].dtype})")
            n_bad += 1
        else:
            dt_note = ""
            for c in e2.columns:
                if str(e2[c].dtype) != str(g2[c].dtype):
                    dt_note += f" [dtype {c}: oracle={e2[c].dtype} spark={g2[c].dtype}]"
            print(f"OK   {name}: {len(e2)} rows{dt_note}")
    # rows-only queries (no oracle)
    import os
    declared = {d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(declared - set(oracle)):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            n_bad += 1
    print(f"\n{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
