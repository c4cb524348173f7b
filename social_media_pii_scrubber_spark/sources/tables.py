"""Table loaders for the driver-generated testdata and engine tables.

Production scans are Iceberg (``spark.read.format("iceberg")``); the
sandbox uses plain parquet files, so the loader falls back cleanly.
The scan layer is where Catalyst pushes filters and prunes columns —
every query in this repo reads through here so `.explain` shows
PushedFilters/ReadSchema doing the pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_iceberg_or_parquet(spark: SparkSession, ref: str) -> DataFrame:
    """Iceberg table name or parquet path — Iceberg first, parquet fallback."""
    try:
        return spark.read.format("iceberg").load(ref)
    except Exception:
        return spark.read.parquet(ref)


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing is the pre-shuffle: both sides of a repeated equi-join on
    ``key`` read already-hash-partitioned files, so the join plans with
    NO Exchange (pinned by tests/test_plan_shapes.py). At 100 TB this is
    how the corpus joins its dedup keep-list, audit table, and per-host
    stats every run without re-shuffling petabytes; the Iceberg analogue
    is a ``bucket(N, key)`` partition transform.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def load_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
