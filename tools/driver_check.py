"""Replicate the driver's CORRECTNESS pass locally: run every
registered query on Spark AND its DuckDB oracle at the given sf,
canonicalize (sorted columns, sorted rows) and compare rows/schema/
values EXACTLY (no rounding slack - stricter than tests/).

Usage: python tools/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
os.environ["TEST_SF_DIR"] = SF_DIR
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    # last-ulp double differences after ROUND() are below the driver
    # hash's resolution (round-1 evidence: rounded cosine queries were
    # hash-green); normalize to 9 decimals so only real diffs surface
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9).astype("float64")
        elif df[c].dtype.kind in "iu":
            # width-normalize (int32 vs int64 is not a driver
            # mismatch); KIND stays significant - see main()
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "M":
            # resolution-normalize (Spark->pandas gives ns, DuckDB
            # gives us; same instants either way)
            df[c] = df[c].astype("datetime64[ns]")
    cols = sorted(df.columns)
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    return out


def main() -> int:
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    queries = e.queries()
    oracles = e.oracle_sql()
    bad = 0
    for name, q in sorted(queries.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = q(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"{name:28s} SPARK-ERR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        if name not in oracles:
            print(f"{name:28s} no_oracle rows={len(sdf)}")
            bad += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as ex:
            print(f"{name:28s} DUCK-ERR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        s, d = canon(sdf), canon(ddf)
        rows = len(s) == len(d)
        schema = list(s.columns) == list(d.columns)
        # dtype-KIND gate (r4 verdict item 2): a DuckDB HUGEINT
        # aggregate surfaces as float64/object while Spark returns
        # int64 - the driver's value hash then mismatches even when
        # every value is equal. Require matching pandas dtype kinds
        # (int vs int, float vs float, ...) after canonicalization so
        # any oracle exposing a raw SUM/COUNT HUGEINT fails HERE, not
        # at the driver. No lenient fallback.
        kinds_ok = schema and all(
            s[c].dtype.kind == d[c].dtype.kind for c in s.columns)
        if schema and not kinds_ok:
            for c in s.columns:
                if s[c].dtype.kind != d[c].dtype.kind:
                    print(f"  dtype-kind mismatch {c}: spark="
                          f"{s[c].dtype} duck={d[c].dtype}")
        try:
            values = rows and schema and kinds_ok and s.equals(d)
        except Exception as ex:
            values = False
            print(f"  compare error: {ex}")
        ok = rows and schema and kinds_ok and values
        bad += 0 if ok else 1
        print(f"{name:28s} rows={len(s)}/{len(d)} "
              f"schema={'Y' if schema else 'N'} "
              f"values={'Y' if values else 'N'} "
              f"{'OK' if ok else '** MISMATCH **'}")
    spark.stop()
    return bad


if __name__ == "__main__":
    sys.exit(main())
