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


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Planted duplicate texts in one micro-batch are dropped; state is
    watermark-bounded by construction."""
    from pyspark.sql import functions as F

    from social_media_pii_scrubber_spark.streaming.stream_pipeline import (
        streaming_exact_dedup,
    )

    batch = webpages_from_documents(spark, sf_dir).limit(50)
    dup = batch.withColumn(
        "url", F.concat(F.col("url"), F.lit("?dup"))
    )  # same text, different url → same fingerprint
    src = str(tmp_path / "feed3")
    batch.unionByName(dup).write.parquet(src)

    stream = stream_pages_from_directory(spark, src, batch.schema)
    q = (streaming_exact_dedup(stream, watermark="30 days")
         .writeStream.format("memory").queryName("t_dedup")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        n = spark.sql("select count(*) c from t_dedup").collect()[0].c
        assert n == 50, f"expected 50 deduped rows, got {n}"
    finally:
        q.stop()


def test_stateful_host_counters(spark, sf_dir, tmp_path):
    """applyInPandasWithState: cumulative per-host counters across TWO
    micro-batches (second batch adds to the first's state)."""
    from pyspark.sql import functions as F

    from social_media_pii_scrubber_spark.streaming.stream_pipeline import (
        stateful_host_counters,
    )

    batch = webpages_from_documents(spark, sf_dir).limit(120)
    pdf = batch.toPandas()
    src = str(tmp_path / "feed4")
    spark.createDataFrame(pdf.iloc[:60], batch.schema).write.parquet(src)

    stream = stream_pages_from_directory(spark, src, batch.schema)
    q = (stateful_host_counters(stream, ScrubConfig())
         .writeStream.format("memory").queryName("t_hosts")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        first = {r.host: r.rows_in for r in spark.table("t_hosts").collect()}
        assert sum(first.values()) == 60
        # second micro-batch: counters must ACCUMULATE, not reset
        spark.createDataFrame(pdf.iloc[60:], batch.schema) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table("t_hosts").collect()
        latest = {}
        for r in rows:  # memory sink appends updates; take the max per host
            latest[r.host] = max(latest.get(r.host, 0), r.rows_in)
        assert sum(latest.values()) == 120
        assert all(not r.final for r in rows)
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


def test_streaming_classifier_score_stateless(spark, sf_dir, tmp_path):
    """classifier_score_expr is a stateless projection — it composes
    onto readStream with NO stateful operator (the explode+groupBy
    batch path would need one), and the streamed scores match the
    batch expression on the same rows."""
    from pyspark.sql import functions as F

    from social_media_pii_scrubber_spark.operators import classifier as CL

    batch = webpages_from_documents(spark, sf_dir).limit(100)
    src = str(tmp_path / "clf_feed")
    batch.write.parquet(src)

    w = {r.bucket: r.wgt for r in CL.hash_weights_table(spark).collect()}
    score = lambda df: df.select(
        "url", CL.classifier_score_expr(F.col("text"), w, bias=-0.25)
        .alias("logit"))

    stream = stream_pages_from_directory(spark, src, batch.schema)
    q = (score(stream).writeStream.format("memory")
         .queryName("t_clf").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r.url: r.logit for r in spark.table("t_clf").collect()}
    finally:
        q.stop()
    want = {r.url: r.logit
            for r in score(spark.read.parquet(src)).collect()}
    assert got == want and len(got) == 100
