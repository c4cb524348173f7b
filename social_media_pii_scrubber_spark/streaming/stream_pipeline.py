"""Structured Streaming variant of the filter+scrub pipeline.

The reference is pure batch (SURVEY.md §2.9 — no streaming operators),
and the north star's checkpoint/resume requirement is batch-level. This
module exists because the engine's stages are all stateless column
expressions / vectorized UDFs, so the SAME pipeline composes onto
``readStream`` unchanged — useful when pages arrive as a feed (e.g. a
WARC drop directory) rather than a completed table.

Windowed drop-rate metrics use a watermark so state is bounded; the
scrub/filter stages themselves need no state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ScrubConfig
from ..plans.pipeline import filter_scrub_pipeline


def stream_pages_from_directory(
    spark: SparkSession, path: str, schema
) -> DataFrame:
    """File-drop source: each new parquet file in `path` is a micro-batch."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_filter_scrub(
    pages_stream: DataFrame, cfg: ScrubConfig | None = None
) -> DataFrame:
    """Apply the batch pipeline stages to a stream (stateless)."""
    return filter_scrub_pipeline(pages_stream, cfg or ScrubConfig()).df


def windowed_drop_rates(
    pages_stream: DataFrame, cfg: ScrubConfig | None = None,
    window: str = "10 minutes", watermark: str = "30 minutes",
) -> DataFrame:
    """Per-window keep/drop counts with late-data handling.

    The audit-table analogue for streaming: tumbling windows on
    ``warc_ts`` with a watermark bounding state.
    """
    scored = streaming_filter_scrub(pages_stream, cfg)
    return (
        scored.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rows", "kept",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, pages_stream: DataFrame, cfg: ScrubConfig | None = None,
    table_name: str = "scrubbed_stream",
):
    """Start the streaming scrub into an in-memory sink (tests/demos)."""
    out = streaming_filter_scrub(pages_stream, cfg)
    return (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .start()
    )
