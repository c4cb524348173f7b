"""Host/domain reputation rollup + filter-back (operators/hosts.py)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators import hosts as H

GOOD = ("the people of the water said they would come down to see "
        "the other side of the great wide land and the long day")
SPAM = "$$$ @@@ ###"


def _pages(spark):
    rows = (
        [(f"https://good.example/p/{i}", GOOD + f" number {i}")
         for i in range(8)]
        + [(f"https://spamfarm.example/p/{i}", SPAM) for i in range(6)]
        + [(f"https://mixed.example/p/{i}",
            (GOOD + f" extra words {i}") if i < 3 else SPAM)
           for i in range(6)]
    )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"]),
        "url string, text string")


class TestHostStats:
    def test_rollup_values(self, spark):
        stats = {r.host: r for r in H.host_stats(_pages(spark)).collect()}
        assert set(stats) == {"good.example", "spamfarm.example",
                              "mixed.example"}
        g = stats["good.example"]
        assert g.n_pages == 8 and g.dup_frac == 0.0 and g.keep_frac == 1.0
        s = stats["spamfarm.example"]
        assert s.n_pages == 6 and s.keep_frac == 0.0
        assert s.dup_frac == pytest.approx(5 / 6)  # 6 copies, 1 distinct
        m = stats["mixed.example"]
        assert m.keep_frac == pytest.approx(3 / 6)
        # 3 identical spam pages -> 4 distinct contents among 6
        assert m.dup_frac == pytest.approx(2 / 6)

    def test_approx_profile_counts_pages_exactly(self, spark):
        stats = {r.host: r for r in
                 H.host_stats(_pages(spark), approx=True).collect()}
        assert stats["good.example"].n_pages == 8
        # HLL is approximate on distincts but exact at tiny cardinality
        assert stats["spamfarm.example"].dup_frac == pytest.approx(5 / 6)

    def test_matches_duckdb_twin(self, spark):
        got = {r.host: (r.n_pages, r.dup_frac, r.avg_words, r.keep_frac)
               for r in H.host_stats(_pages(spark)).collect()}
        con = duckdb.connect()
        con.register("pages", _pages(spark).toPandas())
        want = {r.host: (r.n_pages, r.dup_frac, r.avg_words, r.keep_frac)
                for r in con.sql(
                    H.host_stats_sql("pages")).df().itertuples()}
        assert got == want  # bit-identical: ratios are single divisions


class TestFilter:
    def test_drops_bad_hosts_only(self, spark):
        pages = _pages(spark)
        out = H.host_reputation_filter(pages, H.host_stats(pages))
        urls = {r.url for r in out.collect()}
        # spamfarm fails keep_frac; mixed passes (0.5 keep, 0.33 dup)
        assert len(urls) == 14
        assert all("spamfarm" not in u for u in urls)
        assert any("mixed" in u for u in urls)

    def test_thresholds_configurable(self, spark):
        pages = _pages(spark)
        out = H.host_reputation_filter(
            pages, H.host_stats(pages), min_keep_frac=0.75)
        assert {u.split("/")[2] for u in
                (r.url for r in out.collect())} == {"good.example"}

    def test_matches_duckdb_twin(self, spark):
        pages = _pages(spark)
        got = sorted(r.url for r in H.host_reputation_filter(
            pages, H.host_stats(pages)).collect())
        con = duckdb.connect()
        con.register("pages", pages.toPandas())
        want = sorted(con.sql(
            H.host_reputation_filter_sql("pages")).df().url)
        assert got == want

    def test_anti_join_not_forced_broadcast(self, spark):
        """The bad-host side grows with the corpus: with AQE's
        broadcast disabled the join must degrade to a shuffle
        (SortMergeJoin LeftAnti), proving no broadcast hint is forced
        on it (no-forced-broadcast-on-growing-sides invariant)."""
        pages = _pages(spark)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = H.host_reputation_filter(pages, H.host_stats(pages))
            df.collect()  # AQE finalizes
            p = df._jdf.queryExecution().executedPlan().toString()
            assert "LeftAnti" in p
            assert "BroadcastHashJoin" not in p, p[:2000]
            assert "CartesianProduct" not in p
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_stats_partial_aggregation(self, spark):
        p = H.host_stats(_pages(spark))._jdf.queryExecution() \
            .executedPlan().toString()
        assert p.count("HashAggregate") >= 2  # map-side combine
