#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, canonicalizes both (columns sorted by name, rows sorted),
and reports exact-match status per query.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    df = rel.df() if hasattr(rel, "df") else rel
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            want = canon(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(want.columns)}")
            continue
        gt = [str(t) for t in got.dtypes]
        wt = [str(t) for t in want.dtypes]
        if gt != wt:
            print(f"WARN {name}: dtypes {gt} != {wt}")
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; "
                  f"first diffs:")
            print(got[bad].head(3))
            print(want[bad].head(3))
            continue
        n_ok += 1
        print(f"OK   {name} ({len(got)} rows)")
    print(f"== {n_ok}/{len(oracle)} queries match ==")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
