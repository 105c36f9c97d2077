#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Loads each Spark result parquet from <outDir>/<name>/, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over views on the
fixture parquet, sorts columns by name and rows by all columns, and
reports exact/near matches per query.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    def cell(v):
        if isinstance(v, np.ndarray):
            return tuple(cell(x) for x in v.tolist())
        if isinstance(v, list):
            return tuple(cell(x) for x in v)
        if isinstance(v, float) and v == 0.0:
            return 0.0  # fold -0.0
        return v
    df = df[sorted(df.columns)].map(cell)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(str))
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) < 1e-9 * max(1.0, abs(a), abs(b))
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            a, b = list(a), list(b)
            return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    except Exception:
        pass
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
            continue
        bad = None
        for i in range(len(spark_df)):
            for c in spark_df.columns:
                a, b = spark_df.at[i, c], duck_df.at[i, c]
                if not cells_equal(a, b):
                    bad = f"row {i} col {c}: spark={a!r} duck={b!r}"
                    break
            if bad:
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH {bad}"
    width = max(len(k) for k in results) if results else 0
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(f"  {k:<{width}}  {v}")
    print(f"[compare] {ok}/{len(results)} OK")
    sys.exit(0 if ok == len(results) else 1)

if __name__ == "__main__":
    main()
