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


def test_write_shuffled_shards_order_matches_global_shuffle(spark, tmp_path):
    """The order-only writer must put each row's shard AND on-disk
    order exactly where global_shuffle's oracle-checked (shard, pos)
    says — same hash, same tiebreak, no window."""
    import glob

    import pyarrow.parquet as pq

    from social_media_pii_scrubber_spark.operators.sampling import (
        global_shuffle,
    )
    from social_media_pii_scrubber_spark.sources.sinks import (
        write_shuffled_shards,
    )

    d = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select("doc_id")
    out = str(tmp_path / "shards")
    res = write_shuffled_shards(d, "doc_id", out, n_shards=4)
    assert res["rows"] == 500

    want = {}  # shard -> [doc_id in pos order]
    for r in global_shuffle(d, "doc_id", 4).collect():
        want.setdefault(r.shard, []).append((r.pos, r.doc_id))
    want = {s: [i for _, i in sorted(v)] for s, v in want.items()}

    got = {}
    for s in range(4):
        files = sorted(glob.glob(f"{out}/shard={s}/*.parquet"))
        assert len(files) == 1  # one task per shard
        got[s] = [i for f in files
                  for i in pq.read_table(f)["doc_id"].to_pylist()]
    assert got == want
