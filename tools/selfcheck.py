#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
with views over <sfDir>/*.parquet, load the Spark parquet result, sort
columns by name and rows by value, compare cell-by-cell.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints->int64 where possible, floats stay float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = canon(con.execute(sql).fetchdf())
            actual = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        # The driver hashes stringified values, so an int-vs-float dtype
        # mismatch (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64 "123.0"
        # vs Spark int64 "123") fails there even when values are equal.
        dtype_bad = [c for c in expect.columns
                     if pd.api.types.is_float_dtype(expect[c]) != pd.api.types.is_float_dtype(actual[c])]
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype mismatch on {dtype_bad} "
                  f"(oracle {[str(expect[c].dtype) for c in dtype_bad]} vs "
                  f"spark {[str(actual[c].dtype) for c in dtype_bad]}) — "
                  f"CAST the oracle aggregate to BIGINT or both sides to DOUBLE")
            n_fail += 1
            continue
        if len(expect) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expect)}")
            n_fail += 1
            continue
        bad = None
        for c in expect.columns:
            e, a = expect[c], actual[c]
            if pd.api.types.is_float_dtype(e):
                ok = ((e == a) | (e.isna() & a.isna())).all()
            else:
                ok = (e == a).all()
            if not ok:
                idx = (e != a).idxmax()
                bad = (c, a.iloc[idx], e.iloc[idx])
                break
        if bad:
            print(f"FAIL {name}: col {bad[0]} spark={bad[1]!r} oracle={bad[2]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expect)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
