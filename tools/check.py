#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact for non-floats, rel-tol 1e-9 for floats).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/sql error: {e}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        bad = None
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], exp[c])):
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
                        bad = (c, i, a, b)
                        break
                else:
                    if str(a) != str(b):
                        bad = (c, i, a, b)
                        break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_bad += 1
        else:
            exact = all(
                str(a) == str(b)
                for c in got.columns for a, b in zip(got[c], exp[c]))
            tag = "exact" if exact else "tol"
            print(f"OK   {name} ({len(got)} rows, {tag})")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
