"""Per-partition checkpoint manifest + resume (batch-level).

North-star requirement: "resumes from per-partition checkpoints after
failure". This is BATCH resume (not Structured Streaming): the output
is written one url-hash bucket at a time; each completed bucket gets a
manifest entry; a restarted job anti-joins the pending bucket list and
only recomputes what's missing.

On a real cluster the manifest lives next to the Iceberg table (or IS
the Iceberg snapshot log); here it is a directory of
``bucket=<id>.done`` marker files — atomic enough for single-writer
batch jobs, trivially portable to an object store.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import url_bucket_expr


class CheckpointManifest:
    def __init__(self, output_dir: str):
        self.output_dir = Path(output_dir)
        self.manifest_dir = self.output_dir / "_manifest"
        self.manifest_dir.mkdir(parents=True, exist_ok=True)

    def done_buckets(self) -> set[int]:
        return {
            int(p.stem.split("=")[1])
            for p in self.manifest_dir.glob("bucket=*.done")
        }

    def mark_done(self, bucket: int) -> None:
        (self.manifest_dir / f"bucket={bucket}.done").touch()

    def reset(self) -> None:
        for p in self.manifest_dir.glob("bucket=*.done"):
            p.unlink()


def write_with_checkpoints(
    df: DataFrame,
    output_dir: str,
    n_buckets: int = 16,
    url_col: str = "url",
    buckets_per_batch: int = 4,
    fail_after: int | None = None,
) -> dict:
    """Write df partitioned by url-hash bucket, checkpointing progress.

    Buckets are grouped into batches (one write job per batch — at
    scale you trade job overhead vs blast radius). ``fail_after``
    injects a crash after N batches (test hook for resume).

    Returns {written_buckets, skipped_buckets}.
    """
    manifest = CheckpointManifest(output_dir)
    done = manifest.done_buckets()
    bucketed = df.withColumn("bucket", url_bucket_expr(F.col(url_col), n_buckets))

    pending = [b for b in range(n_buckets) if b not in done]
    written: list[int] = []
    batches = [
        pending[i : i + buckets_per_batch]
        for i in range(0, len(pending), buckets_per_batch)
    ]
    # dynamic partition overwrite → re-running a half-written bucket
    # replaces it instead of duplicating rows: resume is idempotent.
    spark = df.sparkSession
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for batch_no, batch in enumerate(batches):
            if fail_after is not None and batch_no >= fail_after:
                raise RuntimeError(f"injected failure after {batch_no} batches")
            (
                bucketed.filter(F.col("bucket").isin(batch))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(str(Path(output_dir) / "data"))
            )
            for b in batch:
                manifest.mark_done(b)
                written.append(b)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {"written_buckets": written, "skipped_buckets": sorted(done)}
