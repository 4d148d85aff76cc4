#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on oracle_sql.json against the same sf dir, and compares each
query's Spark parquet output (written by graft.Verify) value-by-value:
columns sorted by name, rows sorted by all columns, exact equality
(floats: exact bits; report max abs diff when mismatching).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            g, e = got[c], exp[c]
            if str(g.dtype) != str(e.dtype):
                print(f"  WARN {name}.{c}: dtype {g.dtype} vs {e.dtype}")
            try:
                if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                    gv, ev = g.astype(float), e.astype(float)
                    both_nan = gv.isna() & ev.isna()
                    eq = (gv == ev) | both_nan
                    if not eq.all():
                        d = (gv - ev).abs().max()
                        print(f"FAIL {name}.{c}: {int((~eq).sum())} diffs, max abs {d}")
                        ok = False
                else:
                    eq = (g == e) | (g.isna() & e.isna())
                    if not eq.all():
                        i = (~eq).idxmax()
                        print(f"FAIL {name}.{c}: {int((~eq).sum())} diffs, e.g. {g[i]!r} vs {e[i]!r}")
                        ok = False
            except Exception as ex:
                print(f"FAIL {name}.{c}: compare error {ex}"); ok = False
        if ok: print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else: n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
