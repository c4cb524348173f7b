"""Archive (zip) ingestion: the reference's front door, end to end.

The reference opens platform export zips directly and streams members
out of them (smparserbase.py:34-35, get_json/get_txt :114-127). These
tests build REAL FB-shaped zips on disk and drive them through
scan_zip_members → S2/S3 parsing → plans.social dataflows, proving a
user holding an actual export archive can run the engine on it.
"""

import json
import zipfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.plans import social as S
from social_media_pii_scrubber_spark.sources import archives as AR

CFG = ScrubConfig(
    candidate_id="011", first_name="Maggie", last_name="Nail",
    username="Maggie Nail", person_alias="megs, mags",
    months_back=24, last_date=datetime(2022, 3, 24),
)
IN_TS = 1640000000

POSTS = [
    {
        "timestamp": IN_TS,
        "title": "Maggie posted",
        "data": [{"post": "hello from megs"}],
        "attachments": [{"data": [
            {"media": {
                "uri": "photos/a.jpg", "title": "pic title",
                "description": "with Maggie Nail",
                "comments": [
                    {"author": "Maggie Nail", "comment": "mine"},
                    {"author": "Friend X", "comment": "nice pic"},
                ]}},
            {"media": {"uri": "photos/b.xyz", "title": "bad ext"}},
            {"external_context": {"uri": "https://ex.example/link"}},
        ]}],
    },
    {"timestamp": 1500000000, "title": "too old"},  # outside window
]

POSTS_DDL = (
    "array<struct<timestamp bigint, title string, "
    "data array<struct<post string>>, "
    "attachments array<struct<data array<struct<"
    "media struct<uri string, title string, description string, "
    "comments array<struct<author string, comment string>>>, "
    "external_context struct<uri string>>>>>>>"
)


def _write_zip(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, payload in members.items():
            zf.writestr(name, payload)
    return str(path)


@pytest.fixture()
def fb_zip(tmp_path):
    return _write_zip(tmp_path / "facebook-maggie.zip", {
        "posts/your_posts_1.json": json.dumps(POSTS),
        "profile/profile_kv.txt":
            "Name: Maggie\nCity: Omaha\n\nName: Other\nCity: Lincoln",
        "media/ignore.jpg": b"\xff\xd8fake",
    })


def test_fb_zip_through_fb_posts_payload(spark, fb_zip):
    """The full front door: zip on disk → binaryFile scan → member
    extraction → JSON parse → fb_posts dataflow, with the same
    expectations the direct-DataFrame tests pin (scrub, photo path,
    per-comment routing)."""
    mem = AR.scan_zip_members(spark, fb_zip, member_pattern="posts/*.json")
    posts = AR.json_members(mem, POSTS_DDL)
    frame = posts.select(
        F.posexplode(F.col("parsed")).alias("id", "p")
    ).select("id", "p.timestamp", "p.title", "p.data", "p.attachments")
    rows = S.fb_posts_payload(frame, CFG).collect()
    kinds = sorted(r.row_kind for r in rows)
    assert kinds == ["attachment", "attachment", "post"]
    post = [r for r in rows if r.row_kind == "post"][0]
    assert post.Caption == "hello from {{ALIAS}}; {{FIRSTNAME}} posted"
    media = [r for r in rows if r.Location == "photos/a.jpg"][0]
    assert media.Post == "media/FB/Post0/Photo_0_0A.jpg"
    assert media["Subject Comments"] == '"mine"'
    assert media["Friend Comments"] == '"nice pic"'
    ext = [r for r in rows if r.Location == "External"][0]
    assert ext.Caption == ": https://ex.example/link"


def test_member_pattern_prunes_inside_extractor(spark, fb_zip):
    all_members = AR.scan_zip_members(spark, fb_zip)
    only_json = AR.scan_zip_members(spark, fb_zip,
                                    member_pattern="posts/*.json")
    assert all_members.count() == 3
    got = only_json.select("member").collect()
    assert [r.member for r in got] == ["posts/your_posts_1.json"]


def test_txt_members_s3_shape(spark, fb_zip):
    recs = AR.txt_members(
        AR.scan_zip_members(spark, fb_zip, member_pattern="profile/*.txt")
    ).select(F.col("rec")["Name"].alias("n"), F.col("rec")["City"].alias("c"))
    assert sorted((r.n, r.c) for r in recs.collect()) == [
        ("Maggie", "Omaha"), ("Other", "Lincoln")]


def test_corrupt_zip_logs_and_continues(spark, tmp_path, fb_zip):
    bad = tmp_path / "corrupt.zip"
    bad.write_bytes(b"this is not a zip archive at all")
    mem = AR.scan_zip_members(spark, str(tmp_path / "*.zip"))
    errs = AR.member_errors(mem).collect()
    assert len(errs) == 1 and "corrupt.zip" in errs[0].archive
    assert errs[0].member is None and errs[0].error
    # the good archive's members all still arrive
    ok = mem.filter(F.col("error").isNull())
    assert ok.count() == 3


def test_ingest_zip_members_lands_parquet(spark, tmp_path, fb_zip):
    out = str(tmp_path / "landed")
    AR.ingest_zip_members(spark, fb_zip, out, member_pattern="posts/*.json")
    landed = spark.read.parquet(out)
    assert landed.count() == 1
    row = landed.collect()[0]
    assert row.member == "posts/your_posts_1.json"
    assert json.loads(bytes(row.content))[0]["title"] == "Maggie posted"
