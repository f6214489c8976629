#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>.parquet result written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB over the same source tables,
sorts columns by name + rows by all columns, and compares values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists/dicts hashable for sorting
    def key(v):
        if isinstance(v, (list, tuple)):
            return str([key(x) for x in v])
        if isinstance(v, dict):
            return str(sorted((k, key(x)) for k, x in v.items()))
        return str(v)
    if len(df):
        df = df.iloc[df.astype(object).apply(
            lambda r: tuple(key(v) for v in r), axis=1).argsort()]
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    import glob, os
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    # queries that threw in Verify wrote no result dir; the manifest
    # makes them loud FAILs instead of silently absent rows
    try:
        attempted = json.load(open(f"{out_dir}/queries.json"))
    except FileNotFoundError:
        attempted = names
    for name in sorted(set(attempted) - set(names)):
        n_fail += 1
        print(f"MISSING-RESULT     {name}: query threw in Verify (see [verify] stderr)")
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            if len(got) > 0:
                n_rowsonly += 1
            else:
                n_fail += 1
            print(f"{status:18s} {name} rows={len(got)}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"ORACLE-ERR         {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"SCHEMA-MISMATCH    {name}: got={list(g.columns)} exp={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"ROWCOUNT-MISMATCH  {name}: got={len(g)} exp={len(e)}")
            continue
        same = True
        for c in g.columns:
            gv = g[c].astype(object).map(lambda v: str(v))
            ev = e[c].astype(object).map(lambda v: str(v))
            if not gv.equals(ev):
                bad = (gv != ev)
                i = bad[bad].index[0]
                print(f"VALUE-MISMATCH     {name}.{c} row {i}: got={gv[i]!r} exp={ev[i]!r}")
                same = False
                break
        if same:
            n_pass += 1
            print(f"PASS               {name} rows={len(g)}")
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} FAIL ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
