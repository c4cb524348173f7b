"""Audit/lineage table semantics."""

from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.plans.audit import append_audit, bucket_lineage
from social_media_pii_scrubber_spark.plans.pipeline import filter_scrub_pipeline
from social_media_pii_scrubber_spark.sources.webpages import webpages_from_documents


def test_bucket_lineage_sums(spark, sf_dir):
    pages = webpages_from_documents(spark, sf_dir)
    scored = filter_scrub_pipeline(pages, ScrubConfig()).df
    lineage = bucket_lineage(scored, run_id="r1", n_buckets=8)
    rows = lineage.collect()
    assert all(r.rows_in == r.rows_kept + r.rows_dropped for r in rows)
    total = sum(r.rows_in for r in rows)
    assert total == scored.count()
    assert all(r.run_id == "r1" for r in rows)


def test_append_audit_idempotent_key(spark, sf_dir, tmp_path):
    pages = webpages_from_documents(spark, sf_dir)
    scored = filter_scrub_pipeline(pages, ScrubConfig()).df
    path = str(tmp_path / "audit")
    append_audit(scored, path, run_id="r1", n_buckets=4)
    append_audit(scored, path, run_id="r2", n_buckets=4)
    audit = spark.read.parquet(path)
    assert audit.select("run_id").distinct().count() == 2
    per_run = audit.groupBy("run_id").agg(F.sum("rows_in").alias("n")).collect()
    assert len({r.n for r in per_run}) == 1  # same corpus → same totals
