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
