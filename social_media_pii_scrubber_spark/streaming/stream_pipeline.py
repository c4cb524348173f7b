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
    spark: SparkSession, path: str, schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop source: new parquet files in `path` become micro-batches.

    ``max_files_per_trigger`` caps files per batch (default: all
    available files in one batch, the Spark file-source default)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


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


def streaming_exact_dedup(
    pages_stream: DataFrame, watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state.

    The batch ``exact_dedup`` keeps min-id per fingerprint over the whole
    corpus; a stream can't hold infinite fingerprint state, so the
    streaming contract is "drop re-occurrences within the watermark
    horizon": ``dropDuplicatesWithinWatermark`` evicts fingerprint state
    once the event-time watermark passes — the standard
    bounded-state/bounded-recall trade every streaming dedup makes.
    """
    from ..functions.text import fingerprint_fast_expr

    return (
        pages_stream
        .withColumn("fp", fingerprint_fast_expr(F.col(text_col)))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )


def stateful_host_counters(
    pages_stream: DataFrame, cfg: ScrubConfig | None = None,
    timeout_minutes: int | None = None,
):
    """Custom stateful operator (applyInPandasWithState): RUNNING
    per-host (rows_in, rows_kept) counters across micro-batches.

    Windowed aggs can't express "cumulative counters emitted every
    batch"; explicit state can. State per host is two int64s — bounded
    by the active-host set. Pass ``timeout_minutes`` to additionally
    evict hosts idle past that processing time (flushed with
    final=true); note a processing-time timeout keeps the engine
    triggering even without data, so tests/drains use the default
    NoTimeout.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    scored = streaming_filter_scrub(pages_stream, cfg)
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    by_host = scored.select(host.alias("host"), "keep").groupBy("host")

    def update(key, pdf_iter, state: GroupState):
        rows, kept = state.get if state.exists else (0, 0)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"host": [key[0]], "rows_in": [rows], "rows_kept": [kept],
                 "final": [True]}
            )
            return
        for pdf in pdf_iter:
            rows += len(pdf)
            kept += int(pdf["keep"].sum())
        state.update((rows, kept))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"host": [key[0]], "rows_in": [rows], "rows_kept": [kept],
             "final": [False]}
        )

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if timeout_minutes is not None else GroupStateTimeout.NoTimeout)
    return by_host.applyInPandasWithState(
        update,
        outputStructType="host string, rows_in long, rows_kept long, final boolean",
        stateStructType="rows long, kept long",
        outputMode="update",
        timeoutConf=timeout,
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
