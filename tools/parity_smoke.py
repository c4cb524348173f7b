"""Quick Spark↔DuckDB parity smoke for the paired expr/sql renderers."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

from social_media_pii_scrubber_spark.session import get_spark
from social_media_pii_scrubber_spark.functions import quality as Q
from social_media_pii_scrubber_spark.functions import langid as L
from social_media_pii_scrubber_spark.functions import text as T
from social_media_pii_scrubber_spark.functions import timeparse as TP
from social_media_pii_scrubber_spark.functions import scrub as S

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

spark = get_spark(master="local[4]", shuffle_partitions=4)
docs = spark.read.parquet(f"{SF}/documents.parquet")

spark_df = docs.select(
    "doc_id",
    Q.n_words_expr(F.col("text")).alias("n_words"),
    Q.mean_word_len_expr(F.col("text")).alias("mwl"),
    Q.symbol_ratio_expr(F.col("text")).alias("symr"),
    Q.distinct_ratio_expr(F.col("text")).alias("dr"),
    Q.stopword_fraction_expr(F.col("text")).alias("swf"),
    Q.keep_expr(F.col("text")).alias("keep"),
    L.langid_expr(F.col("text")).alias("pred_lang"),
    T.ws_token_count_expr(F.col("text")).alias("wtok"),
    T.bpe_ish_token_count_expr(F.col("text")).alias("btok"),
    T.fingerprint_expr(F.col("text")).alias("fp"),
    S.scrub_bank_expr(F.col("text")).alias("scrubbed"),
).orderBy("doc_id").toPandas()

con = duckdb.connect()
duck_df = con.sql(f"""
select doc_id,
  {Q.n_words_sql('text')} as n_words,
  {Q.mean_word_len_sql('text')} as mwl,
  {Q.symbol_ratio_sql('text')} as symr,
  {Q.distinct_ratio_sql('text')} as dr,
  {Q.stopword_fraction_sql('text')} as swf,
  {Q.keep_sql('text')} as keep,
  {L.langid_sql('text')} as pred_lang,
  {T.ws_token_count_sql('text')} as wtok,
  {T.bpe_ish_token_count_sql('text')} as btok,
  {T.fingerprint_sql('text')} as fp,
  {S.scrub_bank_sql('text')} as scrubbed
from '{SF}/documents.parquet' order by doc_id
""").df()

bad = 0
for col in spark_df.columns:
    a, b = spark_df[col], duck_df[col]
    try:
        pd.testing.assert_series_equal(a, b, check_dtype=False, check_names=False)
        print(f"OK   {col}")
    except AssertionError as e:
        bad += 1
        print(f"FAIL {col}: {str(e)[:300]}")
        mism = (a.astype(str) != b.astype(str))
        idx = mism[mism].index[:3]
        for i in idx:
            print("   spark:", repr(a[i])[:120])
            print("   duck :", repr(b[i])[:120])

# timeparse parity on constructed strings
tp = spark.createDataFrame(
    pd.DataFrame({"when": ["1600000000", "2021-05-04T10:11:12+05:00",
                            "2021-05-04 10:11:12", "garbage", None]})
)
sp = tp.select(TP.parse_when_expr(F.col("when")).alias("ts")).toPandas()
du = con.sql(
    "select " + TP.parse_when_sql("w") + " as ts from (values ('1600000000'), "
    "('2021-05-04T10:11:12+05:00'), ('2021-05-04 10:11:12'), ('garbage'), (NULL)) t(w)"
).df()
print("timeparse spark:", list(sp.ts))
print("timeparse duck :", list(du.ts))

print("MISMATCHED COLS:", bad)
spark.stop()
