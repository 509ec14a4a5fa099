#!/usr/bin/env python3
"""Dev-only determinism probe: value-compare two graft.Verify output
dirs produced at different degrees of parallelism (e.g. CPUS=8 vs 3).

Usage: python3 scripts/dopdiff.py <outDirA> <outDirB>

Order-insensitive per query: both dumps are read through DuckDB,
columns sorted by name, rows sorted by all columns, then compared
bit-level the same way check.py does. A diff means some aggregate or
window depends on partition count — the exact bug class the driver's
dop probe exists to catch.
"""
import sys, os, math
import duckdb

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        qa = con.execute(
            f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").fetchdf()
        qb = con.execute(
            f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").fetchdf()
        qa = qa.reindex(sorted(qa.columns), axis=1)
        qb = qb.reindex(sorted(qb.columns), axis=1)
        ok, why = True, ""
        if list(qa.columns) != list(qb.columns):
            ok, why = False, "columns differ"
        elif len(qa) != len(qb):
            ok, why = False, f"rows {len(qa)} vs {len(qb)}"
        else:
            qa = qa.sort_values(by=list(qa.columns), ignore_index=True)
            qb = qb.sort_values(by=list(qb.columns), ignore_index=True)
            def bitdiff(x, y):
                if x != x and y != y:
                    return False
                if x != y:
                    return True
                if isinstance(x, float) and x == 0.0 and y == 0.0:
                    return math.copysign(1, x) != math.copysign(1, y)
                return False
            for c in qa.columns:
                bad = [i for i, (x, y) in enumerate(zip(qa[c], qb[c]))
                       if bitdiff(x, y)]
                if bad:
                    ok, why = False, f"col {c} first diff row {bad[0]}"
                    break
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"  DIFF {name}: {why}")
    print(f"== dop-compare: {n_pass} identical, {n_fail} differ")
    sys.exit(1 if n_fail else 0)

main()
