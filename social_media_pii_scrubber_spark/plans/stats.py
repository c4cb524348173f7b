"""Corpus statistics: the dataset-card / dashboard aggregation.

Per-group (typically language) doc counts, token totals, and EXACT
length percentiles in one shuffle: a single groupBy whose count/sum
aggregates partial-combine map-side; ``percentile`` is the only
memory-heavy aggregate (it buffers each group's values on the reducer)
— acceptable because groups are languages, and the 100-TB variant swaps
it for ``percentile_approx`` with a documented accuracy trade.

Only drift-free aggregates on purpose: counts and integer sums are
exact, and Spark's ``percentile`` matches DuckDB's ``quantile_cont``
bit-for-bit (linear interpolation; verified empirically) — a float
``avg`` would accumulate in engine-dependent order and break the
value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_token_count_expr, ws_token_count_sql

PCTS = (0.5, 0.9, 0.99)


def corpus_stats(df: DataFrame, text_col: str, group_col: str,
                 approx: bool = False,
                 approx_accuracy: int = 10_000) -> DataFrame:
    """``approx=False`` (default, the ORACLE rendering): exact
    ``percentile`` — buffers each group's values on its reducer, fine
    while groups are languages. ``approx=True`` (the 100-TB rendering):
    ``percentile_approx`` (Greenwald-Khanna sketch, constant memory per
    group, partial-aggregable map-side) — rank error bounded by
    1/approx_accuracy (default 10^-4), so p50/p90/p99 of doc length are
    exact to ~0.01% of rank at any corpus size."""
    t = F.col(text_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count_expr(t)).alias("total_tokens"),
        F.sum(F.length(t)).alias("total_chars"),
    ]
    for p in PCTS:
        if approx:
            pct = F.expr(
                f"percentile_approx(length({text_col}), {p}, {approx_accuracy})"
            ).cast("double")
        else:
            pct = F.expr(f"percentile(length({text_col}), {p})")
        aggs.append(F.round(pct, 4).alias(f"len_p{int(p * 100)}"))
    return df.groupBy(group_col).agg(*aggs)


def corpus_stats_sql(table_sql: str, text_col: str, group_col: str) -> str:
    cols = [
        "count(*) as n_docs",
        # cast: DuckDB sum(BIGINT) returns HUGEINT; Spark returns BIGINT
        # and the driver's value hash is type-sensitive.
        f"cast(sum({ws_token_count_sql(text_col)}) as bigint) as total_tokens",
        f"cast(sum(length({text_col})) as bigint) as total_chars",
    ]
    for p in PCTS:
        cols.append(
            f"round(quantile_cont(length({text_col}), {p}), 4) "
            f"as len_p{int(p * 100)}"
        )
    return (
        f"select {group_col}, {', '.join(cols)} "
        f"from {table_sql} group by {group_col}"
    )
