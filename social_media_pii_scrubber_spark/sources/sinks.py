"""Sinks: reference-semantics CSV + scrubbed-table writers (S5/S6).

``gen_csv`` reproduces genCSV
(/root/reference/SMParser/smparserbase.py:173-182): a FIXED declared
header; record fields not in the header are silently dropped
(``extrasaction='ignore'``), header fields missing from the data emit
empty string; utf-8; one logical file per dataset named
``{candidate_id}-{name}``.

At scale the primary sink is the partitioned parquet/Iceberg writer in
plans/checkpoint.py; CSV remains for the reference's report outputs
(small aggregates), so ``coalesce(1)`` is acceptable there — do NOT use
it for the page-scale table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gen_csv_frame(df: DataFrame, header: list[str]) -> DataFrame:
    """Project to the declared header: extras dropped, missing → ''."""
    cols = []
    for name in header:
        if name in df.columns:
            cols.append(F.coalesce(F.col(name).cast("string"), F.lit("")).alias(name))
        else:
            cols.append(F.lit("").alias(name))
    return df.select(*cols)


def gen_csv(df: DataFrame, header: list[str], out_dir: str,
            candidate_id: str, name: str) -> str:
    """Write `{candidate_id}-{name}` CSV with genCSV semantics."""
    path = f"{out_dir}/{candidate_id}-{name}"
    (
        gen_csv_frame(df, header)
        .coalesce(1)  # report-sized outputs only
        .write.mode("overwrite")
        .option("header", True)
        .option("encoding", "UTF-8")
        .csv(path)
    )
    return path
