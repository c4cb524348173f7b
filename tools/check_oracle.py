"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares to
oracle_sql() via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns, values stringified).

Usage: python tools/check_oracle.py [query_name ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from social_media_pii_scrubber_spark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, np.floating):
        return f"{float(v):.6g}"
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main():
    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:400]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"     WARNING: zero rows")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {str(ex)[:400]}")
            continue
        ok = True
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        else:
            a, b = normalize(sdf), normalize(odf)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for x, y in diff:
                    print(f"   spark : {str(x)[:200]}")
                    print(f"   oracle: {str(y)[:200]}")
        if ok:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PASS")
    spark.stop()


if __name__ == "__main__":
    main()
