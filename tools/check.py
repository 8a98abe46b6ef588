#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sfDir tables, and compares: schema (sorted column names), row count,
and a hash of values with columns sorted by name.

Dev-tool only (driver-side python is available in this container);
the shipped Scala library never depends on this.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["events", "lineitem", "orders", "customer", "part", "supplier",
          "nation", "region", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: timestamps → iso strings, floats → repr
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v))
        else:
            out[c] = s.map(lambda v: repr(v))
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            status = "WEAK(rows>0)" if len(got) > 0 else "WEAK-EMPTY"
            n_weak += 1
            print(f"  {name:28s} {status} rows={len(got)}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name:28s} ORACLE-ERROR {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  {name:28s} SCHEMA-MISMATCH got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"  {name:28s} ROWS-MISMATCH got={len(g)} exp={len(e)}")
            n_fail += 1
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"  {name:28s} VALUE-MISMATCH ({int(diff.sum())}/{len(g)} rows)")
            for i in idx:
                print(f"    got {dict(g.loc[i])}")
                print(f"    exp {dict(e.loc[i])}")
            n_fail += 1
        else:
            print(f"  {name:28s} OK rows={len(g)}")
            n_pass += 1
    print(f"pass={n_pass} fail={n_fail} weak={n_weak}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
