"""Streaming pipeline: the batch stages compose onto readStream."""

import time

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.sources.webpages import webpages_from_documents
from social_media_pii_scrubber_spark.streaming.stream_pipeline import (
    run_stream_to_memory, stream_pages_from_directory,
)


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
