"""Flagship pipeline + checkpoint/resume + partitioning end-to-end."""

import re

import pytest
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.plans.checkpoint import (
    CheckpointManifest, write_with_checkpoints,
)
from social_media_pii_scrubber_spark.plans.partitioning import (
    repartition_by_url, salt_expr, url_bucket_expr,
)
from social_media_pii_scrubber_spark.plans.pipeline import filter_scrub_pipeline
from social_media_pii_scrubber_spark.sources.webpages import (
    generate_webpages, webpages_from_documents,
)

CFG = ScrubConfig()

PII_PATTERNS = [
    re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"),  # email
    re.compile(r"\b555-\d{3}-\d{4}\b"),                                  # planted phones
    re.compile(r"https?://"),
]


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return webpages_from_documents(spark, sf_dir)


class TestPipeline:
    def test_schema_and_rows(self, pages):
        res = filter_scrub_pipeline(pages, CFG, with_observe=True)
        rows = res.df.collect()
        assert len(rows) > 0
        assert set(res.df.columns) >= {
            "url", "warc_ts", "lang", "pred_lang", "n_words", "keep",
            "scrubbed_text",
        }
        m = res.observation.get
        assert m["rows_in_window"] == len(rows)
        assert m["rows_kept"] + m["rows_dropped"] == m["rows_in_window"]

    def test_both_decision_classes(self, pages):
        df = filter_scrub_pipeline(pages, CFG).df
        kept = df.filter("keep").count()
        dropped = df.filter("not keep").count()
        assert kept > 0 and dropped > 0

    def test_no_planted_pii_survives(self, pages):
        df = filter_scrub_pipeline(pages, CFG).df
        for r in df.select("scrubbed_text").collect():
            for pat in PII_PATTERNS:
                assert not pat.search(r.scrubbed_text), (pat.pattern, r.scrubbed_text[:200])

    def test_model_udf_variant_runs(self, pages):
        df = filter_scrub_pipeline(pages, CFG, use_model_udfs=True).df
        row = df.select(F.min("perplexity"), F.max("perplexity")).collect()[0]
        assert row[0] is not None and row[0] > 0

    def test_date_filter_pushed_to_scan(self, spark, sf_dir):
        # the window predicate must reach the parquet scan (PushedFilters)
        pages = spark.read.parquet(f"{sf_dir}/documents.parquet")
        df = pages.filter(
            F.col("doc_id").between(10, 20)
        ).select("doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "doc_id" in plan


class TestGenerator:
    def test_deterministic(self, spark):
        a = generate_webpages(spark, 100).collect()
        b = generate_webpages(spark, 100).collect()
        assert a == b

    def test_skewed_hosts(self, spark):
        df = generate_webpages(spark, 2000)
        host0 = df.filter(F.col("url").startswith("https://host0.example")).count()
        assert 0.2 < host0 / 2000 < 0.45  # ~30% on the hot host


class TestPartitioning:
    def test_bucket_stable_and_bounded(self, spark, pages):
        buckets = pages.select(url_bucket_expr(F.col("url"), 16).alias("b"))
        vals = {r.b for r in buckets.distinct().collect()}
        assert vals <= set(range(16))

    def test_salt_splits_hot_host(self, spark):
        df = generate_webpages(spark, 2000).filter(
            F.col("url").startswith("https://host0.example")
        )
        salts = df.select(salt_expr(F.col("url")).alias("s")).distinct().count()
        assert salts > 8  # hot host spread over most of the 16 salt slots

    def test_repartition_runs(self, spark):
        df = generate_webpages(spark, 500)
        assert repartition_by_url(df, n_partitions=8).rdd.getNumPartitions() == 8


class TestSaltedDistinct:
    def test_exact_vs_direct(self, spark):
        from social_media_pii_scrubber_spark.plans.partitioning import (
            salted_distinct_count, url_host_expr,
        )
        df = generate_webpages(spark, 3000).select(
            url_host_expr(F.col("url")).alias("host"), "url"
        )
        direct = {
            r.host: r.n for r in
            df.groupBy("host").agg(F.count_distinct("url").alias("n")).collect()
        }
        salted = {
            r.host: r.distinct_count for r in
            salted_distinct_count(df, "host", "url").collect()
        }
        assert salted == direct  # exact, not approximate


class TestCheckpointResume:
    def test_resume_after_injected_failure(self, spark, pages, tmp_path):
        out = str(tmp_path / "out")
        df = filter_scrub_pipeline(pages, CFG).df.drop("warc_ts")
        total = df.count()

        with pytest.raises(RuntimeError, match="injected failure"):
            write_with_checkpoints(df, out, n_buckets=8, buckets_per_batch=2,
                                   fail_after=2)
        manifest = CheckpointManifest(out)
        done_first = manifest.done_buckets()
        assert 0 < len(done_first) < 8

        # resume: only pending buckets are recomputed
        res = write_with_checkpoints(df, out, n_buckets=8, buckets_per_batch=2)
        assert sorted(res["skipped_buckets"]) == sorted(done_first)
        assert set(res["written_buckets"]) == set(range(8)) - done_first

        got = spark.read.parquet(f"{out}/data").count()
        assert got == total  # no loss, no duplication


class TestCorpusStats:
    def test_approx_percentiles_close_to_exact(self, spark, sf_dir):
        """approx=True (the 100-TB rendering: percentile_approx sketch)
        must agree with the exact oracle rendering to within the
        documented rank-error bound — at 500 docs/5 langs, exactly."""
        from social_media_pii_scrubber_spark.plans.stats import corpus_stats

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = {r.lang: r for r in
                 corpus_stats(docs, "text", "lang").collect()}
        approx = {r.lang: r for r in
                  corpus_stats(docs, "text", "lang", approx=True).collect()}
        assert set(exact) == set(approx)
        for lang, e in exact.items():
            a = approx[lang]
            assert (a.n_docs, a.total_tokens, a.total_chars) == \
                (e.n_docs, e.total_tokens, e.total_chars)
            for col in ("len_p50", "len_p90", "len_p99"):
                # sketch returns a real sample value; exact interpolates
                # between neighbours — at 100 docs/group the neighbour
                # gap dominates, so tolerate a few percent of the value
                assert abs(getattr(a, col) - getattr(e, col)) <= \
                    max(2.0, 0.05 * getattr(e, col))
