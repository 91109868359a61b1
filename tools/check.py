#!/usr/bin/env python3
"""Dev-side emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result, runs the matching oracle
SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, sorts columns by
name and rows by all values, and diffs. NOT part of the shipped library —
build-time tooling only (driver-side python is available per the prompt).
"""
import sys, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: no result parquet ({e})"); fails += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1; continue
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"WARN {name}: dtype mismatch {dt}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x is None and y is None: continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y): continue
                    if x != y:
                        bad = (c, i, x, y); break
                elif str(x) != str(y):
                    bad = (c, i, x, y); break
            if bad: break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} oracle={y!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    missing = set()  # queries without oracle are rows-only checks; list them
    print(f"== {len(oracle)-fails}/{len(oracle)} oracle-checked queries pass ==")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
