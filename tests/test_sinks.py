"""CSV sink: genCSV header semantics (S5)."""

import glob

import pandas as pd

from social_media_pii_scrubber_spark.sources.sinks import gen_csv, gen_csv_frame


def test_header_projection_semantics(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": ["1", None], "extra": ["x", "y"],
    }))
    out = gen_csv_frame(df, ["a", "missing"])
    rows = sorted((r.a, r.missing) for r in out.collect())
    assert rows == [("", ""), ("1", "")]   # extras dropped, missing/null → ''
    assert out.columns == ["a", "missing"]


def test_write_and_read_back(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"Total Friends": [7], "junk": [1]}))
    path = gen_csv(df, ["Total Friends", "Removed Friends"],
                   str(tmp_path), "011", "FB_friends")
    assert path.endswith("011-FB_friends")
    csv_file = glob.glob(f"{path}/*.csv")[0]
    got = pd.read_csv(csv_file, keep_default_na=False)
    assert list(got.columns) == ["Total Friends", "Removed Friends"]
    assert got.iloc[0]["Total Friends"] == 7
    assert got.iloc[0]["Removed Friends"] == ""
