#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet dir produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the raw testdata tables,
and compares as sorted multisets (columns sorted by name, rows sorted).
"""
import json
import os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(by=cols, ignore_index=True, na_position="first")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        # filtered Verify runs dump a subset; skip queries with no dump
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            # The driver's hasher is dtype-sensitive: int64 vs float64 on the
            # same values fails there, so it must fail here too.
            if (av.dtype.kind == "f") != (bv.dtype.kind == "f"):
                print(f"FAIL {name}: col {c} dtype {av.dtype} vs {bv.dtype} "
                      "(int/float mismatch would fail the driver's hash)")
                eq = False
                break
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = all(
                    (math.isnan(x) and math.isnan(y)) or x == y
                    for x, y in zip(av.astype(float).fillna(float("nan")),
                                    bv.astype(float).fillna(float("nan"))))
            else:
                ok = av.astype(str).equals(bv.astype(str))
            if not ok:
                diff = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if str(x) != str(y)][:3]
                print(f"FAIL {name}: col {c} differs, e.g. {diff}")
                eq = False
                break
        if eq:
            print(f"OK   {name} ({len(a)} rows)")
            n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
