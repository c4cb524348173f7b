"""Keep/drop decision evaluation — the north-rule acceptance metric.

The rule requires the engine's keep/drop decision to match the
reference labels at F1 ≥ 0.99. This module is the evaluation harness:
a one-row confusion matrix + precision/recall/F1 between any predicted
boolean keep column and a reference label column, as a single partial
aggregation (one shuffle of four longs, regardless of corpus size —
the evaluation never becomes the bottleneck at 100 TB).

Used two ways:
- tests/test_keep_f1.py scores the quality gate against the synthetic
  corpus's planted ground truth (sources/webpages.py generate_webpages
  plants junk classes on known id residues; ``with_labels=True``
  exposes them as ``ref_keep``) — the F1 ≥ 0.99 evidence;
- the ``keep_f1`` gate entry scores the cheap heuristic gate against
  the full gate (heuristics ∧ repetition ∧ toxicity ∧ lang-confidence)
  cross-engine, value-checking the metric math itself.

Ratios are rounded HALF_UP to 6 dp on both engines (Spark round() is
HALF_UP; DuckDB round() on doubles is HALF_EVEN on ties, but 2*tp /
counts ties don't survive 6 dp in practice — the twin still renders
via the same floor(x*1e6+0.5) form to make ties a non-issue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keep_confusion(df: DataFrame, pred_col: str, label_col: str) -> DataFrame:
    """(tp, fp, fn, tn, precision, recall, f1) in ONE row.

    Null predictions/labels count as drop (false) — a row the pipeline
    failed to score must read as a decision, not vanish from the
    denominator."""
    p = F.coalesce(F.col(pred_col), F.lit(False)).cast("long")
    y = F.coalesce(F.col(label_col), F.lit(False)).cast("long")
    agg = df.agg(
        F.sum(p * y).alias("tp"),
        F.sum(p * (1 - y)).alias("fp"),
        F.sum((1 - p) * y).alias("fn"),
        F.sum((1 - p) * (1 - y)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")

    def r6(x):
        return F.floor(x * 1e6 + F.lit(0.5)) / 1e6

    precision = r6(tp / F.greatest(tp + fp, F.lit(1)))
    recall = r6(tp / F.greatest(tp + fn, F.lit(1)))
    f1 = r6(2 * tp / F.greatest(2 * tp + fp + fn, F.lit(1)))
    return agg.select(
        "tp", "fp", "fn", "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def keep_confusion_sql(rows: str, pred: str, label: str) -> str:
    """DuckDB twin: ``rows`` is a FROM-able relation (table or subquery),
    ``pred``/``label`` boolean expressions over it."""
    p = f"cast(coalesce({pred}, false) as bigint)"
    y = f"cast(coalesce({label}, false) as bigint)"

    def r6(x: str) -> str:
        return f"floor(({x}) * 1e6 + 0.5) / 1e6"

    return (
        f"select tp, fp, fn, tn, "
        f"{r6('tp / greatest(tp + fp, 1)')} as precision, "
        f"{r6('tp / greatest(tp + fn, 1)')} as recall, "
        f"{r6('2 * tp / greatest(2 * tp + fp + fn, 1)')} as f1 "
        f"from (select "
        f"cast(sum({p} * {y}) as bigint) as tp, "
        f"cast(sum({p} * (1 - {y})) as bigint) as fp, "
        f"cast(sum((1 - {p}) * {y}) as bigint) as fn, "
        f"cast(sum((1 - {p}) * (1 - {y})) as bigint) as tn "
        f"from {rows})"
    )
