"""Sinks: reference-semantics CSV + scrubbed-table writers (S5/S6).

``gen_csv`` reproduces genCSV
(/root/reference/SMParser/smparserbase.py:173-182): a FIXED declared
header; record fields not in the header are silently dropped
(``extrasaction='ignore'``), header fields missing from the data emit
empty string; utf-8; one logical file per dataset named
``{candidate_id}-{name}``.

At scale the primary sink is the partitioned parquet/Iceberg writer in
plans/checkpoint.py; CSV remains for the reference's report outputs
(small aggregates), so ``coalesce(1)`` is acceptable there — do NOT use
it for the page-scale table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gen_csv_frame(df: DataFrame, header: list[str]) -> DataFrame:
    """Project to the declared header: extras dropped, missing → ''."""
    cols = []
    for name in header:
        if name in df.columns:
            cols.append(F.coalesce(F.col(name).cast("string"), F.lit("")).alias(name))
        else:
            cols.append(F.lit("").alias(name))
    return df.select(*cols)


def gen_csv(df: DataFrame, header: list[str], out_dir: str,
            candidate_id: str, name: str) -> str:
    """Write `{candidate_id}-{name}` CSV with genCSV semantics."""
    path = f"{out_dir}/{candidate_id}-{name}"
    (
        gen_csv_frame(df, header)
        .coalesce(1)  # report-sized outputs only
        .write.mode("overwrite")
        .option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return path


def write_shuffled_shards(df: DataFrame, key_col: str, path: str,
                          n_shards: int, seed: int = 17) -> dict:
    """Order-only shuffled shard writer — the production counterpart
    of ``operators/sampling.py global_shuffle``: training needs the
    shuffled ORDER on disk, not a dense index, so this skips the
    window entirely. shard = the same md5-mod projection; rows land in
    ``shard=K/`` directories, each written by ONE task in shuffle-hash
    order (repartition on shard + sortWithinPartitions on the hash —
    the sort is external, it spills rather than OOMs). Deterministic
    for a given (key set, n_shards, seed) on any input layout, so a
    re-run after failure rewrites identical shards (same
    all-or-nothing per-directory semantics as the checkpoint writer).

    At scale pick n_shards >= cluster parallelism: roughly one task
    per shard is the write parallelism — ``repartition(n, "shard")``
    HASH-partitions the shard value, so for small n distinct shards
    can collide into one task while others stay empty (contents and
    order are still correct; only the task fan-out is approximate).
    corpus/n_shards rows must fit a task's spill budget. Returns
    ``{"path", "n_shards", "rows"}``.
    """
    from ..operators.sampling import shard_expr, shuffle_hash_expr

    keyed = df.withColumn(
        "_h", shuffle_hash_expr(F.col(key_col), seed)
    ).withColumn("shard", shard_expr(F.col("_h"), n_shards))
    # the sort MUST lead with the partition column: the planned V1
    # write requires an ordering on (shard) and otherwise inserts its
    # own sort, which ELIMINATES this one (observed: rows landed in
    # input order). With the shard prefix the writer sees its
    # requirement already satisfied and the hash order survives.
    (
        keyed.repartition(n_shards, "shard")
        .sortWithinPartitions(
            F.col("shard").asc(), F.col("_h").asc(), F.col(key_col).asc())
        .drop("_h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # row count from the WRITTEN files' parquet footers — metadata
    # only, no second corpus pass through the hash/shard projection
    rows = df.sparkSession.read.parquet(path).count()
    return {"path": path, "n_shards": n_shards, "rows": rows}
