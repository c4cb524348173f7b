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


def corpus_stats(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    t = F.col(text_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count_expr(t)).alias("total_tokens"),
        F.sum(F.length(t)).alias("total_chars"),
    ]
    for p in PCTS:
        aggs.append(
            F.round(F.expr(f"percentile(length({text_col}), {p})"), 4)
            .alias(f"len_p{int(p * 100)}")
        )
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
