"""Bloom-accelerated incremental dedup: exact-equivalence + pruning."""

import random

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators.bloom import (
    _positions, bloom_build, bloom_incremental_dedup, bloom_might_contain_udf,
)


def _snapshots(spark, seed=7, n_prev=400, n_new=300, dup_every=5):
    rng = random.Random(seed)
    prev = pd.DataFrame({
        "fp": [f"prev-{rng.randrange(10**9)}" for _ in range(n_prev)],
    })
    new_fps = []
    for i in range(n_new):
        if i % dup_every == 0:           # planted cross-snapshot dup
            new_fps.append(prev["fp"].iloc[rng.randrange(n_prev)])
        else:
            new_fps.append(f"new-{rng.randrange(10**9)}")
    new = pd.DataFrame({"doc_id": range(n_new), "fp": new_fps})
    return spark.createDataFrame(new), spark.createDataFrame(prev)


class TestBloomDedup:
    def test_identical_to_plain_anti_join(self, spark):
        """The contract: bloom path == plain left_anti, row for row."""
        new, prev = _snapshots(spark)
        got = sorted(
            (r.doc_id, r.fp)
            for r in bloom_incremental_dedup(new, prev, "fp").collect())
        want = sorted(
            (r.doc_id, r.fp)
            for r in new.join(prev.select("fp").distinct(),
                              on="fp", how="left_anti").collect())
        assert got == want and len(got) > 0

    def test_seeds_vary_across_configs(self, spark):
        """Different (n_bits, n_hashes) still give the exact answer."""
        new, prev = _snapshots(spark, seed=11)
        want = new.join(prev.select("fp").distinct(),
                        on="fp", how="left_anti").count()
        for n_bits, k in ((1 << 16, 3), (1 << 20, 7)):
            assert bloom_incremental_dedup(
                new, prev, "fp", n_bits=n_bits, n_hashes=k).count() == want

    def test_null_fp_rows_kept(self, spark):
        """left_anti keeps null-key rows; the bloom routing must too
        (xxhash64 SKIPS nulls, so an unguarded probe would hash null to
        a fixed — possibly set — position)."""
        new = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1, 2], "fp": ["a", None, "b"]}))
        prev = spark.createDataFrame(pd.DataFrame({"fp": ["a", None]}))
        got = {r.doc_id for r in
               bloom_incremental_dedup(new, prev, "fp").collect()}
        assert got == {1, 2}

    def test_bloom_prunes_the_join_side(self, spark):
        """The point of the operator: bloom-positive rows ≈ true dups
        (+ fpp·|new|), so the exact join sees a small fraction of the
        snapshot. At these sizes fpp < 1e-4, so positives should be
        exactly the planted dups with overwhelming probability."""
        new, prev = _snapshots(spark, seed=23, n_prev=500, n_new=500,
                               dup_every=10)
        bc = bloom_build(prev, "fp")
        probed = new.withColumn(
            "maybe", bloom_might_contain_udf(bc)(
                _positions(F.col("fp"), 1 << 22, 5)))
        n_maybe = probed.filter("maybe").count()
        true_dups = new.join(prev.select("fp").distinct(), "fp",
                             "left_semi").count()
        assert true_dups <= n_maybe <= true_dups + 3
        assert n_maybe < new.count() // 2  # the join side really shrank

    def test_bitmap_is_construction_bounded(self, spark):
        """Driver materialization is n_bits/64 words no matter the
        corpus — the broadcast is model-sized, never corpus-sized."""
        _, prev = _snapshots(spark, seed=3)
        bc = bloom_build(prev, "fp", n_bits=1 << 16)
        assert bc.value.nbytes == (1 << 16) // 8
