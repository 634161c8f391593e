#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB (tables registered
as views over <sfDir>/*.parquet), load the Spark result parquet, sort
columns by name, sort rows, and compare values (exact; floats require
bit-identical values, mirroring a hash comparison).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp_c, got_c = canon(exp), canon(got)
        if list(exp_c.columns) != list(got_c.columns):
            print(f"FAIL {name}: columns exp={list(exp_c.columns)} got={list(got_c.columns)}")
            n_bad += 1
            continue
        if len(exp_c) != len(got_c):
            print(f"FAIL {name}: rows exp={len(exp_c)} got={len(got_c)}")
            n_bad += 1
            continue
        # normalize dtypes for compare
        mismatch = None
        for c in exp_c.columns:
            e, g = exp_c[c], got_c[c]
            try:
                if e.dtype.kind in "fc" or g.dtype.kind in "fc":
                    eq = (e.astype("float64").fillna(-1e308) == g.astype("float64").fillna(-1e308))
                else:
                    eq = (e.astype(str) == g.astype(str))
                if not eq.all():
                    i = eq.idxmin()
                    mismatch = f"col {c} row {i}: exp={e[i]!r} got={g[i]!r}"
                    break
            except Exception as ex:
                mismatch = f"col {c}: compare error {ex}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(exp_c)} rows)")
            n_ok += 1
    # rows-only queries
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if os.path.isdir(d) and name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
