#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
outputs against DuckDB executing oracle_sql.json over the same parquet
tables, compare after sorting columns by name and rows by all columns.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64 (rounded to 9dp to
    # absorb float32/decimal representation differences), rest -> str
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
        elif not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            print(f"FAIL {name}: value mismatch in {neq.any()[neq.any()].index.tolist()}")
            bad = neq.any(axis=1)
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  duck :", w[bad].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
    # rows-only checks for queries without oracles
    import os
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("q") and d not in oracles and os.path.isdir(f"{out_dir}/{d}"):
            try:
                n = len(pd.read_parquet(f"{out_dir}/{d}"))
                print(f"ROWS {d}: {n} rows")
            except Exception as e:
                print(f"FAIL {d}: unreadable: {e}")
                failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
