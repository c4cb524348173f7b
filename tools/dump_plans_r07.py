"""Dump .explain('formatted') for every query touched in round 7 to
plans/r07/<name>_{before|after}.txt.

    python tools/dump_plans_r07.py before   # on round-start code
    python tools/dump_plans_r07.py after    # on optimized code

Uses the bench-shaped inputs (generated web corpus at a reduced row
count — plan shape is row-count independent) plus the sf testdata
tables, mirroring bench.py's query construction so the committed plans
are the ones the frozen bench actually runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.session import get_spark
from social_media_pii_scrubber_spark.sources.webpages import generate_webpages

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r07")
CFG = ScrubConfig()


def dump(name: str, suffix: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"dumped {name}_{suffix}")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    spark = get_spark(app_name=f"plans_r07_{suffix}", master="local[4]",
                      shuffle_partitions=8)
    pages = generate_webpages(spark, 10_000)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from social_media_pii_scrubber_spark.operators import dedup as DD
    from social_media_pii_scrubber_spark.operators import similarity as SIM
    from social_media_pii_scrubber_spark.operators import hosts as HST
    from social_media_pii_scrubber_spark.operators import classifier as CLF
    from social_media_pii_scrubber_spark.operators import dsir as DSR
    from social_media_pii_scrubber_spark.operators.components import near_dup_dedup
    from social_media_pii_scrubber_spark.operators.lines import (
        c4_line_filter_expr, line_dedup,
    )
    from social_media_pii_scrubber_spark.plans.pipeline import filter_scrub_pipeline

    dump("q1_flagship", suffix,
         filter_scrub_pipeline(pages, CFG, use_model_udfs=True).df.filter("keep"))
    dump("q2_column_only", suffix,
         filter_scrub_pipeline(pages, CFG, use_model_udfs=False).df.filter("keep"))
    lined = pages.select(
        "url", F.regexp_replace("text", r" the ", "\nthe ").alias("lined"))
    dump("q8_c4_line_filter", suffix,
         lined.select(c4_line_filter_expr(F.col("lined")).alias("c")).filter("c != ''"))
    dump("q8b_line_dedup", suffix, line_dedup(lined, "lined", "url"))
    dump("q4c_near_dup_dedup", suffix,
         near_dup_dedup(docs, "text", "doc_id").filter("keep_dedup"))
    dump("q12_semdedup_pairs", suffix,
         SIM.semdedup_pairs(emb, "embedding", "vec_id",
                            SIM.make_centroids(8, 64), threshold=0.95))
    stats = HST.host_stats(pages, "url", "text")
    dump("q15_host_reputation", suffix,
         HST.host_reputation_filter(pages, stats, "url"))
    wmap = {b: ((b * 2654435761) % 1000) / 1000.0 - 0.5 for b in range(4096)}
    dump("q11_classifier", suffix,
         CLF.score_with_model(pages, "text", "url", (wmap, -0.1), n_buckets=4096))
    tgt = pages.filter(F.pmod(F.xxhash64("url"), F.lit(100)) < 1)
    src_fit = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) < 1)
    ratio = DSR.log_ratio(DSR.bucket_distribution_fast(tgt, "text"),
                          DSR.bucket_distribution_fast(src_fit, "text"))
    dump("q10_dsir_weights", suffix,
         DSR.dsir_weights_fast(pages, "text", "url", ratio))
    dump("q6c_ivf_topk", suffix,
         SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), "vec_id",
                      "embedding", k=10, n_cells=8, probe=2))

    # q16: the composed job. NOTE: after the optimization the build is
    # stage-materialized (localCheckpoint), so the 'after' dump shows
    # the FINAL stage's plan over checkpointed inputs; the per-stage
    # plans are what the stage boundaries executed.
    from jobs.build_corpus import build_corpus
    bpages = pages.limit(2000).withColumn(
        "page_id", F.regexp_extract("url", "/p/([0-9]+)$", 1).cast("bigint"))
    dump("q16_build_corpus", suffix,
         build_corpus(bpages, id_col="page_id",
                      classifier_model=(wmap, -0.1), classifier_buckets=4096,
                      budgets={"en": 2_000_000, "de": 600_000,
                               "fr": 600_000, "es": 600_000}))
    spark.stop()


if __name__ == "__main__":
    main()
