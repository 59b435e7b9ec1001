#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (<out>/<name>/*.parquet +
<out>/oracle_sql.json), runs the oracle SQL in DuckDB with one view per
testdata table, canonicalizes both sides (columns sorted by name, rows
sorted by all columns, floats rounded to 9 significant places) and
reports match/mismatch per query.  Dev tool only — not part of the
engine (the engine is pure Scala/Spark).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif dt.startswith("int") or dt.startswith("uint"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    import glob
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
                   if not p.endswith(".json"))
    for name in names:
        got = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = con.sql(oracle[name]).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"✗ {name}: COLUMNS spark={list(g.columns)} duck={list(w.columns)}")
            bad += 1
            continue
        if len(g) != len(w):
            print(f"✗ {name}: ROWS spark={len(g)} duck={len(w)}")
            bad += 1
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            cols = [c for c in g.columns if neq[c].any()]
            print(f"✗ {name}: VALUES differ in {cols}")
            for c in cols[:3]:
                i = neq[c].idxmax()
                print(f"    row {i} {c}: spark={g[c][i]!r} duck={w[c][i]!r}")
            bad += 1
            continue
        print(f"✓ {name} ({len(g)} rows)")
        ok += 1
    print(f"\n{ok} ok, {bad} bad, {len(names) - ok - bad} rows-only")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
