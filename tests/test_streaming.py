"""Streaming pipeline: the batch stages compose onto readStream."""

import time

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.sources.webpages import webpages_from_documents
from social_media_pii_scrubber_spark.streaming.stream_pipeline import (
    run_stream_to_memory, stream_pages_from_directory,
)


def test_windowed_drop_rates_with_watermark(spark, sf_dir, tmp_path):
    from social_media_pii_scrubber_spark.streaming.stream_pipeline import (
        windowed_drop_rates,
    )

    batch = webpages_from_documents(spark, sf_dir)
    src = str(tmp_path / "feed2")
    batch.limit(200).write.parquet(src)
    stream = stream_pages_from_directory(spark, src, batch.schema)
    agg = windowed_drop_rates(stream, ScrubConfig(), window="30 days",
                              watermark="60 days")
    q = (agg.writeStream.format("memory").queryName("t_rates")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # append mode only emits windows the watermark has closed; with
        # a single micro-batch the final windows stay open — assert the
        # stateful plan ran and the schema is the audit shape
        cols = set(spark.table("t_rates").columns)
        assert cols == {"window_start", "window_end", "rows", "kept"}
        assert q.lastProgress is not None
    finally:
        q.stop()


def test_streaming_scrub_end_to_end(spark, sf_dir, tmp_path):
    batch = webpages_from_documents(spark, sf_dir)
    src = str(tmp_path / "feed")
    batch.limit(100).write.parquet(src)

    stream = stream_pages_from_directory(spark, src, batch.schema)
    assert stream.isStreaming
    q = run_stream_to_memory(spark, stream, ScrubConfig(), table_name="t_scrub")
    try:
        q.processAllAvailable()
        got = spark.sql("select count(*) c, sum(cast(keep as int)) k from t_scrub").collect()[0]
        assert got.c > 0
        assert "scrubbed_text" in spark.table("t_scrub").columns
    finally:
        q.stop()
