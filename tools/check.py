#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and compare (schema-insensitive:
columns sorted by name, rows sorted, values compared with rounding)."""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            want = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        ok = True
        for c in g.columns:
            gv, wv = g[c], w[c]
            try:
                import numpy as np
                if np.issubdtype(gv.dtype, np.number) and np.issubdtype(wv.dtype, np.number):
                    if not np.allclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        bad = (~np.isclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9)).sum()
                        print(f"  col {c}: {bad} mismatches, e.g. {gv[~np.isclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9)].head(3).tolist()} vs {wv[~np.isclose(gv.astype(float), wv.astype(float), rtol=0, atol=1e-9)].head(3).tolist()}")
                        ok = False
                else:
                    if not gv.equals(wv):
                        bad = (gv != wv)
                        print(f"  col {c}: {bad.sum()} mismatches, e.g. {gv[bad].head(3).tolist()} vs {wv[bad].head(3).tolist()}")
                        ok = False
            except Exception as ex:
                print(f"  col {c}: compare error {ex}"); ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
