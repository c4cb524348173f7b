"""Benchmark-contamination detection: train docs overlapping an eval set.

Training corpora must not contain the benchmarks they're evaluated on.
The standard check (GPT-3 appendix C / PaLM style) flags a training
document when it shares at least ``min_shared`` distinct k-gram
shingles with any eval document.

Shape for 100 TB: the EVAL side is small (benchmarks are thousands of
rows) — its distinct shingle bank broadcasts; the train side explodes
shingles once and inner-joins the broadcast bank, so the corpus scan is
one pass, no shuffle on the corpus side except the per-doc count
aggregation (partial-agg'd). Reuses dedup.shingles_expr so the n-gram
definition matches the near-dup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import SHINGLE_K, shingles_expr, shingles_sql


def contaminated_docs(train: DataFrame, eval_set: DataFrame, text_col: str,
                      id_col: str, k: int = SHINGLE_K,
                      min_shared: int = 2) -> DataFrame:
    """(id, n_shared): train docs sharing ≥ min_shared distinct shingles
    with the eval bank."""
    tsh = train.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), k)).alias("sh"),
    )
    bank = eval_set.select(
        F.explode(shingles_expr(F.col(text_col), k)).alias("sh")
    ).distinct()
    # count DISTINCT shared shingles (the GPT-3/PaLM contract): a bank
    # shingle repeated min_shared times inside ONE train doc must not
    # flag it. Dedup happens AFTER the broadcast join, not on the full
    # exploded corpus — the join keeps only bank hits (a tiny fraction),
    # so the distinct-aggregate shuffles almost nothing at scale.
    return (
        tsh.join(F.broadcast(bank), on="sh")
        .groupBy(id_col)
        .agg(F.countDistinct("sh").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(F.col(id_col).alias("id"), "n_shared")
    )


def contaminated_docs_sql(train_sql: str, eval_sql: str, text_col: str,
                          id_col: str, k: int = SHINGLE_K,
                          min_shared: int = 2) -> str:
    sh = shingles_sql(text_col, k)
    return (
        f"with tsh as (select {id_col}, unnest({sh}) as sh from {train_sql}), "
        f"bank as (select distinct unnest({sh}) as sh from {eval_sql}) "
        f"select {id_col} as id, "
        f"cast(count(distinct sh) as bigint) as n_shared "
        f"from tsh join bank using (sh) "
        f"group by {id_col} having count(distinct sh) >= {min_shared}"
    )


def decontaminate(train: DataFrame, eval_set: DataFrame, text_col: str,
                  id_col: str, k: int = SHINGLE_K,
                  min_shared: int = 2) -> DataFrame:
    """Train rows with a keep_decontam flag (broadcast drop-list join —
    the corpus side stays shuffle-free)."""
    bad = contaminated_docs(train, eval_set, text_col, id_col, k, min_shared) \
        .select(F.col("id").alias(id_col)).withColumn("_c", F.lit(True))
    return (
        train.join(F.broadcast(bad), on=id_col, how="left")
        .withColumn("keep_decontam", F.col("_c").isNull())
        .drop("_c")
    )
