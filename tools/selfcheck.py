#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with tables registered as views
over <sfDir>/*.parquet, canonicalizes both (columns sorted by name, rows
sorted, doubles rounded 1e-6, timestamps as UTC strings) and diffs.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except TypeError:
                pass
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str) if s.dtype == object else s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                             want[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {len(oracles) - n_fail}/{len(oracles)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
