"""Deterministic sampling/splitting/capping semantics (operators/sampling.py)."""

import math

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators import sampling as SA

SF = "/root/testdata/sf0.01"


def test_sample_is_layout_independent(spark):
    """The kept set must not change with partitioning (unlike df.sample)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = {r.doc_id for r in SA.sample_by_hash(d, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in
         SA.sample_by_hash(d.repartition(17), "doc_id", 0.3).collect()}
    assert a == b
    assert abs(len(a) / 500 - 0.3) < 0.08  # rate lands near target


def test_sample_seed_changes_set(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = {r.doc_id for r in SA.sample_by_hash(d, "doc_id", 0.3, seed=1).collect()}
    b = {r.doc_id for r in SA.sample_by_hash(d, "doc_id", 0.3, seed=2).collect()}
    assert a != b


def test_sample_rate_one_keeps_all(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    assert SA.sample_by_hash(d, "doc_id", 1.0).count() == 500


def test_split_disjoint_exhaustive_stable(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = SA.split_by_hash(d, "doc_id", w).collect()
    assert len(out) == 500  # exhaustive, one row each
    by = {}
    for r in out:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert set(by) <= set(w)
    assert sum(len(v) for v in by.values()) == 500
    assert len(by["train"]) > len(by["val"])
    # stability: same assignment under different layout
    out2 = {r.doc_id: r.split for r in
            SA.split_by_hash(d.repartition(13), "doc_id", w).collect()}
    assert all(out2[r.doc_id] == r.split for r in out)


def test_stratified_rates_per_group(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    out = SA.stratified_sample_by_hash(
        d, "doc_id", "lang", {"en": 0.8, "de": 0.2}, default_rate=0.0
    ).collect()
    by = {}
    for r in out:
        by[r.lang] = by.get(r.lang, 0) + 1
    totals = {r.lang: c for r, c in
              [(x, x["count"]) for x in
               d.groupBy("lang").count().collect()]}
    assert abs(by.get("en", 0) / totals["en"] - 0.8) < 0.12
    assert abs(by.get("de", 0) / totals["de"] - 0.2) < 0.12
    assert set(by) <= {"en", "de"}  # default 0 drops all other strata
    # kept set is a subset relation across rates: en@0.2 ⊂ en@0.8
    small = {r.doc_id for r in SA.stratified_sample_by_hash(
        d, "doc_id", "lang", {"en": 0.2}).collect()}
    big = {r.doc_id for r in SA.stratified_sample_by_hash(
        d, "doc_id", "lang", {"en": 0.8}).collect()}
    assert small <= big


def test_cap_per_key(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 5 + ["b"] * 2, "o": [5, 4, 3, 2, 1, 9, 8]})
    )
    got = SA.cap_per_key(df, "k", 3, "o").collect()
    per = {}
    for r in got:
        per.setdefault(r.k, []).append(r.o)
    assert sorted(per["a"]) == [1, 2, 3]  # keeps the FIRST by order
    assert sorted(per["b"]) == [8, 9]


def test_train_char_lm_is_a_distribution(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    rows = SA.train_char_lm(d, "text").collect()
    assert 0 < len(rows) <= 256
    assert all(r.logprob < 0 for r in rows)
    # smoothed probs of SEEN chars sum to < 1 (mass reserved for unseen)
    total = sum(math.exp(r.logprob) for r in rows)
    assert 0.9 < total <= 1.0


class TestTokenBudgetMix:
    def _df(self, spark):
        return spark.createDataFrame(pd.DataFrame({
            "doc_id": list(range(12)),
            "lang": ["en"] * 8 + ["de"] * 2 + ["fr"] * 2,
            "n_tok": [100] * 12,
        }))

    def test_budget_bites_and_cum_is_inclusive(self, spark):
        got = SA.take_by_token_budget(
            self._df(spark), "doc_id", "lang", "n_tok",
            {"en": 350, "de": 1000}).collect()
        by = {}
        for r in got:
            by.setdefault(r.lang, []).append(r)
        # en: 8 docs x 100 tok against a 350 budget → exactly 3 kept
        # (cum is inclusive: the 4th would reach 400 > 350)
        assert sum(r.keep_mix for r in by["en"]) == 3
        # de fits entirely
        assert all(r.keep_mix for r in by["de"])
        # fr has no budget → keeps nothing
        assert not any(r.keep_mix for r in by["fr"])
        # cum_tokens within a stratum is a permutation of 100..800
        assert sorted(r.cum_tokens for r in by["en"]) == [
            100 * i for i in range(1, 9)]

    def test_layout_independent(self, spark):
        base = self._df(spark)
        a = {(r.doc_id, r.keep_mix) for r in SA.take_by_token_budget(
            base, "doc_id", "lang", "n_tok", {"en": 350}).collect()}
        b = {(r.doc_id, r.keep_mix) for r in SA.take_by_token_budget(
            base.repartition(7).sortWithinPartitions("n_tok"),
            "doc_id", "lang", "n_tok", {"en": 350}).collect()}
        assert a == b

    def test_oversized_first_row_dropped(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1], "lang": ["en"], "n_tok": [500]}))
        got = SA.take_by_token_budget(
            df, "doc_id", "lang", "n_tok", {"en": 400}).collect()
        assert not got[0].keep_mix


class TestScoreBuckets:
    """CCNet-style head/middle/tail (sampling.score_buckets)."""

    def _df(self, spark):
        import pandas as pd
        rows = [(i, "en" if i < 9 else "de", float(i)) for i in range(12)]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "lang", "ppl"]),
            "doc_id long, lang string, ppl double")

    def test_equal_count_terciles_per_stratum(self, spark):
        from social_media_pii_scrubber_spark.operators.sampling import (
            score_buckets,
        )
        out = {(r.doc_id): r.bucket for r in score_buckets(
            self._df(spark), "ppl", "doc_id", strata_col="lang").collect()}
        # en: 9 docs → 3/3/3 by ascending ppl; low ppl = head
        assert [out[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
        # de: 3 docs → one per bucket
        assert [out[i] for i in (9, 10, 11)] == ["head", "middle", "tail"]

    def test_tie_break_is_deterministic(self, spark):
        import pandas as pd
        from social_media_pii_scrubber_spark.operators.sampling import (
            score_buckets,
        )
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [3, 1, 2], "ppl": [1.0, 1.0, 1.0]}),
            "doc_id long, ppl double")
        out = {r.doc_id: r.bucket for r in score_buckets(
            df, "ppl", "doc_id").collect()}
        assert out == {1: "head", 2: "middle", 3: "tail"}

    def test_thresholds_variant_matches_exact_on_clean_cuts(self, spark):
        """Where the sample quantiles are exact, comparison tagging must
        reproduce the rank-based buckets."""
        from social_media_pii_scrubber_spark.operators.sampling import (
            bucket_by_thresholds, score_buckets,
        )
        df = self._df(spark).filter("lang = 'en'")
        exact = {r.doc_id: r.bucket for r in score_buckets(
            df, "ppl", "doc_id").collect()}
        approx = {r.doc_id: r.bucket for r in bucket_by_thresholds(
            df, "ppl", [2.0, 5.0]).collect()}
        assert exact == approx

    def test_null_scores_rank_last_not_head(self, spark):
        """Null score = unknown quality → 'tail'; also the cross-engine
        trap: Spark's bare asc is NULLS FIRST, DuckDB's is NULLS LAST —
        both twins pin NULLS LAST explicitly."""
        import duckdb
        import pandas as pd
        from social_media_pii_scrubber_spark.operators.sampling import (
            score_buckets, score_buckets_sql,
        )
        pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6],
                            "ppl": [3.0, None, 1.0, 2.0, None, 4.0]})
        df = spark.createDataFrame(pdf, "doc_id long, ppl double")
        got = {r.doc_id: r.bucket for r in score_buckets(
            df, "ppl", "doc_id").collect()}
        assert got == {3: "head", 4: "head", 1: "middle", 6: "middle",
                       2: "tail", 5: "tail"}
        con = duckdb.connect()
        con.register("t", pdf)
        want = {r[0]: r[-1] for r in con.sql(
            score_buckets_sql("t", "ppl", "doc_id")).fetchall()}
        assert got == want


class TestGlobalShuffle:
    def _d(self, spark):
        return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")

    def test_layout_independent_and_dense(self, spark):
        d = self._d(spark)
        a = {(r.doc_id, r.shard, r.pos) for r in
             SA.global_shuffle(d, "doc_id", 8).collect()}
        b = {(r.doc_id, r.shard, r.pos) for r in
             SA.global_shuffle(d.repartition(23), "doc_id", 8).collect()}
        assert a == b and len(a) == 500
        # pos is dense 1..|shard| within each shard
        by_shard = {}
        for _, s, p in a:
            by_shard.setdefault(s, []).append(p)
        assert set(by_shard) == set(range(8))
        for ps in by_shard.values():
            assert sorted(ps) == list(range(1, len(ps) + 1))

    def test_shards_balance_and_decorrelate_input_order(self, spark):
        d = self._d(spark)
        rows = SA.global_shuffle(d, "doc_id", 4).collect()
        sizes = {}
        for r in rows:
            sizes[r.shard] = sizes.get(r.shard, 0) + 1
        assert max(sizes.values()) < 2 * min(sizes.values())
        # within a shard, hash order must decorrelate doc_id order:
        # the head of shard 0 is not the head of the corpus
        head = [r.doc_id for r in rows if r.shard == 0 and r.pos <= 20]
        assert head != sorted(head)

    def test_duckdb_twin_matches(self, spark):
        import duckdb

        d = self._d(spark)
        got = {(r.doc_id, r.shard, r.pos) for r in
               SA.global_shuffle(d, "doc_id", 8).collect()}
        con = duckdb.connect()
        twin = con.sql(SA.global_shuffle_sql(
            f"'{SF}/documents.parquet'", "doc_id", 8)).df()
        exp = set(zip(twin["doc_id"], twin["shard"], twin["pos"]))
        assert got == exp
