#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
tables, sorts columns by name in both, and compares schema + values
exactly. Dev-only tool — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only), rows={len(got)}")
            continue
        exp = con.execute(oracle[name]).fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        ok, why = True, ""
        if list(got.columns) != list(exp.columns):
            ok, why = False, f"columns {list(got.columns)} vs {list(exp.columns)}"
        elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            ok, why = False, f"dtypes {list(map(str,got.dtypes))} vs {list(map(str,exp.dtypes))}"
        elif len(got) != len(exp):
            ok, why = False, f"rows {len(got)} vs {len(exp)}"
        else:
            import math
            def bitdiff(x, y):
                # Mirror the driver's bit-level hash: NaN == NaN, but
                # -0.0 != +0.0 (Spark round emits +0.0, DuckDB keeps
                # the sign of a tiny-negative rounded value).
                if x != x and y != y:
                    return False
                if x != y:
                    return True
                if isinstance(x, float) and x == 0.0 and y == 0.0:
                    return math.copysign(1, x) != math.copysign(1, y)
                return False
            for c in got.columns:
                a, b = got[c].tolist(), exp[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b))
                       if bitdiff(x, y)]
                if bad:
                    ok, why = False, f"col {c}: first diff @{bad[0]}"
                    break
        if ok:
            n_pass += 1
            print(f"  PASS {name} rows={len(got)}")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {why}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
