#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle gate (builder-side tooling
only; the shipped library is pure Scala/Spark).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB against views over the fixture parquet, reads the corresponding
Spark result parquet, sorts columns by name (the driver does), and compares
row-by-row with exact equality. Reports per-query PASS/FAIL.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        widx = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for r, (wr, gr) in enumerate(zip(want, got)):
            w = tuple(canon(wr[i]) for i in widx)
            g = tuple(canon(gr[i]) for i in gidx)
            if w != g:
                bad = (r, w, g)
                break
        if bad:
            r, w, g = bad
            print(f"FAIL {name}: row {r} (cols {sorted(wcols)})\n"
                  f"  oracle: {w}\n  spark : {g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
