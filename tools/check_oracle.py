"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 and compares to
oracle_sql() via DuckDB: row count, column names, an order-insensitive
value comparison (columns sorted by name, rows sorted by all columns,
values stringified), and — because the DRIVER's value hash is
type-sensitive while stringification is not — a type gate: any oracle
column that DuckDB types as HUGEINT or DECIMAL (sum() of integers does
this) is a hard FAIL telling you to cast, and per-column pandas dtype
kinds must agree between the two engines.

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
            rel = con.sql(sql)
            otypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            odf = rel.df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {str(ex)[:400]}")
            continue
        ok = True
        bad_types = {c: t for c, t in otypes.items()
                     if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")}
        if bad_types:
            ok = False
            print(f"FAIL {name}: oracle columns typed {bad_types} — the "
                  f"driver's hash is type-sensitive; cast(... as bigint/double)")
        elif sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        else:
            kind_diff = {
                c: (sdf[c].dtype.kind, odf[c].dtype.kind)
                for c in sdf.columns
                if sdf[c].dtype.kind != odf[c].dtype.kind
                # a column that is all-null on both sides may surface as
                # object-vs-float without any driver-visible difference
                and not (sdf[c].isna().all() and odf[c].isna().all())
            }
            if kind_diff:
                ok = False
                print(f"FAIL {name}: dtype-kind drift spark-vs-oracle: "
                      f"{kind_diff}")
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
