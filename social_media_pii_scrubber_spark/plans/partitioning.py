"""Partitioning / skew machinery (north-star scale requirements).

- ``url_bucket_expr`` — stable url-hash bucket; the table's physical
  partition key at scale (Iceberg ``bucket(N, url)`` transform).
- ``repartition_by_url`` — shuffle onto url-hash with optional SALT for
  skewed hosts: the salt widens one hot key into S subkeys so no single
  task owns host0's 30% of the corpus. AQE's skew-join handling covers
  joins; salting covers aggregations/writes where AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256

# shared with operators/hosts.py url_host_sql — ONE pattern literal so
# the Spark expr and its DuckDB twin cannot drift (CLAUDE.md twin
# invariant)
HOST_RE = r"^[a-z]+://([^/]+)"


def url_host_expr(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def url_bucket_expr(url: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def salt_expr(url: Column, n_salts: int = 16) -> Column:
    """Deterministic per-url salt (NOT rand() — resume-safe)."""
    return F.pmod(F.xxhash64(url, F.lit(0x5A17)), F.lit(n_salts)).cast("int")


def repartition_by_url(
    df: DataFrame, url_col: str = "url",
    n_partitions: int | None = None, n_salts: int = 16,
) -> DataFrame:
    """Repartition on (host, salt): co-locates a host's pages for
    host-level ops while capping any one task at ~1/n_salts of a hot
    host. Pages of one url always land together (salt is url-hashed).
    """
    host = url_host_expr(F.col(url_col))
    salt = salt_expr(F.col(url_col), n_salts)
    if n_partitions:
        return df.repartition(n_partitions, host, salt)
    return df.repartition(host, salt)


def salted_distinct_count(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 16,
) -> DataFrame:
    """Exact per-key distinct count, skew-safe via two-phase salting.

    ``groupBy(key).agg(countDistinct(value))`` puts EVERY distinct
    value of a hot key through one reducer. Salting on
    ``hash(value) % S`` splits that key across S reducers; because the
    salt is value-derived, each distinct value lands in exactly one
    salt bucket, so phase-2 ``sum`` of per-bucket distinct counts is
    exact, not approximate. Output: (key_col, distinct_count).
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    phase1 = (
        df.groupBy(F.col(key_col), salt.alias("_salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return (
        phase1.groupBy(key_col)
        .agg(F.sum("_partial").alias("distinct_count"))
    )
