"""Physical-plan shape assertions — the scale contract.

Correct results with a wrong plan is a failure mode at 100 TB: these
tests pin the plan properties the engine's performance depends on
(broadcast joins stay broadcast, UDFs stay fused, filters reach the
scan, self-joins reuse exchanges, aggregations stay partial).
"""

from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.operators.dedup import (
    exact_dedup, lsh_candidate_pairs,
)
from social_media_pii_scrubber_spark.operators.joins import anti_join, semi_flag_join
from social_media_pii_scrubber_spark.plans.pipeline import filter_scrub_pipeline
from social_media_pii_scrubber_spark.sources.webpages import webpages_from_documents

CFG = ScrubConfig()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_single_python_barrier(spark, sf_dir):
    """langid + perplexity must fuse into ONE ArrowEvalPython node —
    two nodes means an extra JVM↔Python round-trip for every row."""
    pages = webpages_from_documents(spark, sf_dir)
    df = filter_scrub_pipeline(pages, CFG, use_model_udfs=True).df
    p = plan_of(df)
    assert p.count("ArrowEvalPython") == 1, p[:2000]


def test_flagship_scrub_evaluated_once_in_codegen(spark, sf_dir):
    """The regex scrub bank must be evaluated exactly once, inside a
    WholeStageCodegen projection (Catalyst may legally hoist it above
    the Python barrier — fine, as long as it stays codegen'd and isn't
    duplicated)."""
    pages = webpages_from_documents(spark, sf_dir)
    df = filter_scrub_pipeline(pages, CFG, use_model_udfs=True).df
    p = plan_of(df)
    assert p.count("{{TIMESTAMP}}") == 1, "scrub chain duplicated in plan"
    scrub_line = [l for l in p.split("\n") if "{{TIMESTAMP}}" in l][0]
    assert scrub_line.lstrip().startswith("*"), (
        "scrub projection fell out of whole-stage codegen: " + scrub_line[:120]
    )


def test_date_filter_pushed_to_parquet(spark, sf_dir):
    """P1 on a stored timestamp column must reach PushedFilters."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = ev.filter(F.col("ts").between("2024-01-05", "2024-01-10")).select("event_id")
    p = plan_of(df)
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(ts" in p and "LessThanOrEqual(ts" in p, p


def test_semi_flag_join_is_broadcast(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    keys = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey")
    )
    p = plan_of(semi_flag_join(o, keys, "o_custkey", "flag"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_anti_join_is_broadcast(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    p = plan_of(anti_join(c, o, "c_custkey"))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_lsh_self_join_reuses_exchange(spark, sf_dir):
    """The expensive minhash subtree must be computed once, not once
    per self-join side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = lsh_candidate_pairs(docs, "text", "doc_id")
    df.collect()  # AQE finalizes the plan
    p = plan_of(df)
    assert "ReusedExchange" in p, p[:3000]


def test_amplified_lsh_self_join_reuses_exchange(spark, sf_dir):
    """The amplified embedding LSH's (tbl, bucket) self-join must reuse
    one exchange: the bucket computation (matmul UDF) runs once total,
    and the join key is n_tables·2^n_planes-way parallel."""
    from social_media_pii_scrubber_spark.operators.similarity import (
        embedding_dup_pairs_amplified,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = embedding_dup_pairs_amplified(
        emb, "embedding", "vec_id", n_planes=8, n_tables=4, dim=64
    )
    df.collect()  # AQE finalizes the plan
    p = plan_of(df)
    assert "ReusedExchange" in p, p[:3000]
    assert "CartesianProduct" not in p
    # the matmul bucket UDF must appear ONCE in the FINAL plan (reuse
    # covers both join sides) — a second ArrowEvalPython means the
    # buckets recompute. (toString also prints AQE's Initial Plan,
    # where both sides legitimately still carry the UDF — cut it off.)
    final = p.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1, final[:3000]


def test_simhash64_partial_agg_pure_codegen(spark, sf_dir):
    """q5b scale contract: the 64 bit-vote sums must partial-aggregate
    map-side (two HashAggregates around one id-hash exchange — at
    corpus scale the map-side combine IS the operator: tokens collapse
    to one 64-column row per doc per task before the shuffle), the
    token hash must be computed once (single xxhash64 in the plan, not
    per-vote), and the whole operator stays in codegen — zero Python."""
    from social_media_pii_scrubber_spark.operators.dedup import (
        simhash_signature_fast,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(simhash_signature_fast(docs, "text", "doc_id"))
    assert p.count("HashAggregate") >= 2, p[:3000]
    assert "Exchange hashpartitioning(doc_id" in p, p[:3000]
    assert p.lower().count("xxhash64") == 1, p[:3000]
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    """groupBy(fingerprint) must map-side combine (two HashAggregates
    around the exchange) — at 100 TB the partial agg IS the operator."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(exact_dedup(docs, "text", "doc_id"))
    assert p.count("HashAggregate") >= 2
    exchange_pos = p.find("Exchange hashpartitioning(fp")
    assert exchange_pos > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key must join WITHOUT any
    Exchange — the co-located-join contract write_bucketed exists for."""
    from social_media_pii_scrubber_spark.sources.tables import (
        load_bucketed, write_bucketed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_bucketed(docs.select("doc_id", "text"), "t_bkt_a", "doc_id", 8)
    write_bucketed(docs.select("doc_id", "lang"), "t_bkt_b", "doc_id", 8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = load_bucketed(spark, "t_bkt_a").join(
                load_bucketed(spark, "t_bkt_b"), on="doc_id"
            )
            p = plan_of(j)
            assert "Exchange" not in p, p[:2000]
            assert "SortMergeJoin" in p
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("drop table if exists t_bkt_a")
        spark.sql("drop table if exists t_bkt_b")


def test_toxic_flagship_scrub_once_no_python(spark, sf_dir):
    """The {{TOXIC}} scrub must be evaluated once with zero Python in
    the plan. (The score's transform+aggregate HOF is interpreted —
    higher-order functions never codegen — so unlike the PII-only
    flagship this projection is legitimately outside WholeStageCodegen;
    the model-UDF scoring path exists for when that matters.)"""
    pages = webpages_from_documents(spark, sf_dir)
    df = filter_scrub_pipeline(pages, CFG, use_toxicity=True).df
    p = plan_of(df)
    assert p.count("{{TOXIC}}") == 1
    assert "EvalPython" not in p


def test_column_only_pipeline_no_python(spark, sf_dir):
    """use_model_udfs=False must have ZERO Python in the plan."""
    pages = webpages_from_documents(spark, sf_dir)
    df = filter_scrub_pipeline(pages, CFG, use_model_udfs=False).df
    p = plan_of(df)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_line_dedup_partial_agg_no_cartesian(spark, sf_dir):
    """line_dedup's first-occurrence aggregate must partial-combine
    map-side (partial_min before the line exchange — a line repeated
    10^6 times sends one candidate per task, not 10^6 rows), and the
    join back must never degenerate to a cartesian product."""
    from social_media_pii_scrubber_spark.operators.lines import line_dedup
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.regexp_replace("text", r" the ", "\nthe ").alias("t"))
    # pin the AT-SCALE topology: at web scale the first-occurrence side
    # is corpus-sized and can never broadcast, so assert the reuse shape
    # with broadcast disabled (at small scale AQE broadcasting it
    # instead is fine and covered by the oracle entry)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = line_dedup(docs, "t", "doc_id")
        df.collect()  # AQE finalizes
        p = plan_of(df)
        assert "partial_min" in p, p[:3000]
        # the single line-key exchange must be REUSED by the join probe
        # side (same topology as the LSH self-join), not built twice
        assert "ReusedExchange" in p, p[:3000]
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_substring_remove_reuses_window_exchange(spark, sf_dir):
    """substring_remove pins line_dedup's topology: the 128-bit
    window-fingerprint exchange is computed ONCE and reused by the
    first-occurrence aggregate and the join probe (keying on the md5
    string instead measurably broke AQE stage reuse — the corpus would
    be exploded and hashed twice), with map-side partial_min and no
    cartesian degeneration."""
    from social_media_pii_scrubber_spark.operators.dedup import (
        substring_remove,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = substring_remove(docs, "text", "doc_id")
        df.collect()  # AQE finalizes
        p = plan_of(df)
        assert "partial_min" in p, p[:3000]
        assert "ReusedExchange" in p, p[:3000]
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_dsir_ratio_join_broadcast_and_partial_sum(spark, sf_dir):
    """DSIR's per-doc scoring join must broadcast the bounded
    16^prefix-row ratio dimension (static stats mis-estimate it through
    the bucket-space join and would shuffle the whole exploded corpus
    into a SortMergeJoin), and the Σ logr per doc must partial-combine
    map-side."""
    from social_media_pii_scrubber_spark.operators import dsir as DS

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sdist = DS.bucket_distribution(d, "text")
    tdist = DS.bucket_distribution(d.filter(F.col("lang") == "en"), "text")
    w = DS.dsir_weights(d, "text", "doc_id", DS.log_ratio(tdist, sdist))
    p = plan_of(w)
    ratio_joins = [l for l in p.split("\n")
                   if "Join" in l and "bucket" in l and "LeftOuter" in l]
    assert ratio_joins and all("BroadcastHashJoin" in l for l in ratio_joins), (
        ratio_joins or p[:3000])
    assert "partial_sum" in p, p[:3000]


def test_classifier_score_broadcast_and_partial_sum(spark, sf_dir):
    """quality classifier inference shares DSIR's scale topology: the
    bounded weight dimension must broadcast into the scoring join and
    the per-doc logit sum must partial-combine map-side."""
    from social_media_pii_scrubber_spark.operators import classifier as CL

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = CL.classifier_score(d, "text", "doc_id",
                              CL.hash_weights_table(spark), bias=-0.25)
    p = plan_of(out)
    joins = [l for l in p.split("\n")
             if "Join" in l and "bucket" in l and "LeftOuter" in l]
    assert joins and all("BroadcastHashJoin" in l for l in joins), (
        joins or p[:3000])
    assert "partial_sum" in p, p[:3000]


def test_global_shuffle_one_exchange_no_global_sort(spark, sf_dir):
    """The shuffled-order materialization must cost exactly ONE
    exchange (hashpartitioning on shard) + a per-shard window sort —
    a rangepartitioning exchange would mean a global sort (sampling
    pass + skew exposure), and a second hash exchange would mean the
    shard projection ran after the shuffle instead of before it."""
    from social_media_pii_scrubber_spark.operators.sampling import global_shuffle

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    df = global_shuffle(d, "doc_id", 8)
    df.collect()  # finalize AQE
    p = plan_of(df)
    final = p.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final[:2000]
    assert "rangepartitioning" not in final, final[:2000]
    assert "ArrowEvalPython" not in final


def test_fix_mojibake_pure_codegen_projection(spark, sf_dir):
    """The 123-pair repair chain must stay a single codegen projection
    over the scan: no exchange, no Python barrier — clean rows pay the
    six-contains marker guard only."""
    from social_media_pii_scrubber_spark.functions.encoding import (
        fix_mojibake_expr,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = d.select(F.sum(F.length(
        fix_mojibake_expr(F.col("text")))).alias("s"))
    p = plan_of(df)
    scan_to_agg = p.split("FileScan")[0]
    assert "ArrowEvalPython" not in p
    assert "Exchange hashpartitioning" not in scan_to_agg.replace(
        "Exchange SinglePartition", "")  # only the final agg gather
