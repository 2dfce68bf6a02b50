#!/usr/bin/env python3
"""Cross-engine differential gate for the AQL front-end (builder-side
tooling, like check.py; the shipped library is pure Scala/Spark).

Usage: python3 tools/aql_check.py <sfDir> <outDir>

Reads <outDir>/aql_oracle.json (written by AqlOracleSpec: fuzz-query name
-> DuckDB SQL), runs each SQL in DuckDB against views over the fixture
parquet, reads the Spark result parquet for the same query, and compares
ORDER-INSENSITIVELY (both sides canonically sorted) with exact equality
for ints/strings and 1e-9 relative tolerance for doubles (aggregate
accumulation order differs across engines). Reports per-query PASS/FAIL.
"""
import sys, json, math
import duckdb

TABLES = ["events"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def sort_key(row):
    return tuple(repr(norm(v)) for v in row)


def eqv(w, g):
    if w is None and g is None:
        return True
    if w is None or g is None:
        return False
    if isinstance(w, float) or isinstance(g, float):
        try:
            wf, gf = float(w), float(g)
        except (TypeError, ValueError):
            return False
        if math.isnan(wf) and math.isnan(gf):
            return True
        return abs(wf - gf) <= 1e-9 * max(1.0, abs(wf))
    return w == g


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/aql_oracle.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}\n  sql: {sql}")
            n_fail += 1
            continue
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        widx = sorted(range(len(wcols)), key=lambda i: wcols[i])
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
        want = sorted((tuple(r[i] for i in widx) for r in want), key=sort_key)
        got = sorted((tuple(r[i] for i in gidx) for r in got), key=sort_key)
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}\n  sql: {sql}")
            n_fail += 1
            continue
        def row_eq(wr, gr):
            return len(wr) == len(gr) and all(eqv(w, g) for w, g in zip(wr, gr))
        # sort_key rounds floats to 6 decimals while eqv compares at 1e-9
        # relative: within-tolerance values straddling a rounding boundary
        # can sort apart and zip against the wrong partners — re-match the
        # residue as a multiset with the tolerant compare first
        residue = [(wr, gr) for wr, gr in zip(want, got) if not row_eq(wr, gr)]
        w_res = [wr for wr, _ in residue]
        bad = None
        for _, gr in residue:
            j = next((i for i, wr in enumerate(w_res) if row_eq(wr, gr)), -1)
            if j < 0:
                bad = gr
                break
            del w_res[j]
        if bad is not None:
            print(f"FAIL {name}: unmatched row (cols {sorted(wcols)})\n"
                  f"  spark : {bad}\n  near  : {w_res[:3]}\n  sql: {sql}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
