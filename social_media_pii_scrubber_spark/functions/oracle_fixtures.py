"""Fixture tables that promote UDF stages into the value-level oracle gate.

The driver's correctness gate value-checks a query only if DuckDB can
compute the same result. Model-shaped UDF stages can't be rendered as
SQL — but their INDEPENDENT plain-Python implementations (the same ones
pytest parity-locks) can be materialized as parquet fixture tables that
the oracle SQL reads back with read_parquet (VERDICT r1 item 7):

- ``perplexity``: ``perplexity_python`` (per-char scalar loop) vs the
  np.add.reduceat-vectorized pandas UDF;
- ``clean_text``: driver-side scalar ``clean_text_python`` over the
  DuckDB-rendered webpages text vs the Arrow-batched UDF over the
  Spark-rendered webpages text — so the check also covers the page
  synthesis twins end-to-end.

Fixtures are keyed by a content fingerprint of the source parquet, so a
regenerated testdata set invalidates them automatically. Generation is
pure Python + DuckDB (no Spark) and idempotent.
"""

from __future__ import annotations

import hashlib
import os

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)


def _source_key(sf_dir: str) -> str:
    """Cheap content fingerprint of the documents table: size + head."""
    path = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.md5()
    h.update(str(os.path.getsize(path)).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
    return h.hexdigest()[:12]


def _atomic_write_parquet(df, path: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)


def ensure_perplexity_fixture(sf_dir: str) -> str:
    """(doc_id, perplexity) via the scalar reference implementation."""
    import duckdb

    from .perplexity import perplexity_python

    path = os.path.join(FIXTURE_DIR, f"perplexity_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        docs = con.sql(
            f"select doc_id, text from '{sf_dir}/documents.parquet'"
        ).df()
        docs["perplexity"] = docs.text.map(perplexity_python)
        _atomic_write_parquet(docs[["doc_id", "perplexity"]], path)
    return path


def ensure_media_scrub_fixture(sf_dir: str) -> str:
    """(url, scrubbed_hex, width, height, status) via the deterministic
    decoder applied driver-side to the DuckDB-rendered html blobs —
    cross-checks the mapInPandas plumbing AND the html synthesis twins."""
    import duckdb

    from ..operators.media import _FakeDecoder
    from ..sources.webpages import webpages_from_documents_sql

    path = os.path.join(FIXTURE_DIR, f"media_scrub_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        con.sql(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        pages = con.sql(
            "select url, html from (" + webpages_from_documents_sql() + ")"
        ).df()
        dec = _FakeDecoder()

        def row(blob):
            blob = bytes(blob)
            w, h = dec.decode_meta(blob)
            return dec.blur(blob).hex().upper(), w, h

        cols = pages.html.map(row)
        pages["scrubbed_hex"] = cols.map(lambda t: t[0])
        pages["width"] = cols.map(lambda t: t[1]).astype("int64")
        pages["height"] = cols.map(lambda t: t[2]).astype("int64")
        pages["status"] = "ok"
        _atomic_write_parquet(
            pages[["url", "scrubbed_hex", "width", "height", "status"]], path
        )
    return path


def ensure_clean_text_fixture(sf_dir: str) -> str:
    """(url, cleaned) via driver-side clean_text over the DuckDB-rendered
    webpages CTE (independent of the Spark page synthesis)."""
    import duckdb

    from ..config import FIXTURE_CONFIG
    from ..sources.webpages import webpages_from_documents_sql
    from .scrub import clean_text_python

    path = os.path.join(FIXTURE_DIR, f"clean_text_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        con.sql(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        pages = con.sql(
            "select url, text from (" + webpages_from_documents_sql() + ")"
        ).df()
        pages["cleaned"] = pages.text.map(
            lambda t: clean_text_python(t, FIXTURE_CONFIG)
        )
        _atomic_write_parquet(pages[["url", "cleaned"]], path)
    return path
