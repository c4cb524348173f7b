"""Fixture tables that promote UDF stages into the value-level oracle gate.

The driver's correctness gate value-checks a query only if DuckDB can
compute the same result. Model-shaped UDF stages can't be rendered as
SQL — but driver-side Python implementations can be materialized as
parquet fixture tables that the oracle SQL reads back with read_parquet
(VERDICT r1 item 7). What each fixture actually proves:

- ``perplexity``: a genuinely INDEPENDENT scalar reference
  (``perplexity_python``, per-char loop) vs the
  np.add.reduceat-vectorized pandas UDF — independent algorithm, so
  this value-checks the math;
- ``clean_text``: ``clean_text_python`` SHARES ``_CompiledCleanText``
  with the pandas UDF, so this fixture validates Arrow plumbing and the
  DuckDB-vs-Spark page-synthesis twins end-to-end, NOT the scrub
  semantics (those are independently locked by hand-written goldens in
  tests/test_scrub.py);
- ``media_scrub``: same plumbing-level scope (shared _DefaultDecoder).

Fixtures are keyed by a content fingerprint of the source parquet, so a
regenerated testdata set invalidates them automatically. Generation is
pure Python + DuckDB (no Spark) and idempotent. Because the driver's
oracle contract is a dict of SQL STRINGS, generation must run when the
dict is built; ``fixture_sql`` makes that non-fatal — if the source
parquet is absent, the affected entries degrade to a SQL that errors
with a clear message at query time instead of failing the whole dict.
"""

from __future__ import annotations

import hashlib
import os

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)


# Bump when the semantics of any fixture-backed function change (e.g.
# the NER lexicon/rules): the key below includes it, so stale fixtures
# from older code can never be read back as oracle truth.
# v5: html synthesis gained head/script/style/comment chrome + entity
# escaping (functions/html.py) — media fixtures hash the html bytes.
# v6: the shared media decoder dispatches BM-magic blobs to the real
# BMP kernel (operators/media.py round 5) and the media_bmp fixture
# family exists — any fixture generated against pre-dispatch or
# mid-iteration kernel code must be invalidated.
FIXTURE_SEMANTICS_VERSION = 7  # r06: detector-shaped BMP blur box


def _source_key(sf_dir: str, table: str = "documents.parquet") -> str:
    """Cheap content fingerprint of the fixture's ACTUAL source table
    (size + head), salted with the code-semantics version. Pass the
    table the fixture reads — keying a fixture on a table it doesn't
    read lets a regenerated source silently serve stale oracle truth."""
    path = os.path.join(sf_dir, table)
    h = hashlib.md5()
    h.update(str(FIXTURE_SEMANTICS_VERSION).encode())
    h.update(str(os.path.getsize(path)).encode())
    with open(path, "rb") as f:
        h.update(f.read(65536))
    return h.hexdigest()[:12]


def _atomic_write_parquet(df, path: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)


def fixture_sql(ensure_fn, sf_dir: str, select_cols: str) -> str:
    """SQL reading a fixture back, degrading gracefully: a missing /
    unreadable source parquet yields a query-time error() with a clear
    message rather than an exception while building oracle_sql()."""
    try:
        path = ensure_fn(sf_dir)
    except OSError as e:
        msg = f"fixture source unavailable under {sf_dir}: {e}".replace("'", "''")
        return f"select error('{msg}')"
    return f"select {select_cols} from read_parquet('{path}')"


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

    from ..operators.media import _DefaultDecoder
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
        dec = _DefaultDecoder()

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


def _detect_box_python(arr) -> tuple[int, int, int, int]:
    """Independent naive replication of _BmpKernel.detect_region: pure-
    Python loops over Python ints (no numpy vectorization, no integral
    image) — max-edge-energy (h//2)×(w//2) window, first in row-major
    order on ties. All-integer, so agreement with the kernel's
    cumsum/argmax form is exact by construction."""
    h, w = arr.shape[:2]
    gray = [[int(arr[y][x][0]) + int(arr[y][x][1]) + int(arr[y][x][2])
             for x in range(w)] for y in range(h)]
    e = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            v = 0
            if x + 1 < w:
                v += abs(gray[y][x + 1] - gray[y][x])
            if y + 1 < h:
                v += abs(gray[y + 1][x] - gray[y][x])
            e[y][x] = v
    bh, bw = max(h // 2, 1), max(w // 2, 1)
    best, by, bx = -1, 0, 0
    for y0 in range(h - bh + 1):
        for x0 in range(w - bw + 1):
            s = sum(e[y][x]
                    for y in range(y0, y0 + bh) for x in range(x0, x0 + bw))
            if s > best:
                best, by, bx = s, y0, x0
    return by, by + bh, bx, bx + bw


def _bmp_scrub_python(blob: bytes, k: int) -> tuple[str, int, int]:
    """Independent replication of the BMP scrub: own header parse +
    naive box detection (_detect_box_python) + naive O(k²) edge-clamped
    box blur in float64 + own re-encode — shares NO code with
    operators/media._BmpKernel (whose blur is separable float32 over an
    integral-image argmax box). Exact agreement is guaranteed, not
    hoped for: the detector is all-integer with identical first-max
    tie-breaking, and blur values are rationals n/k² whose distance to
    any .5 rounding boundary is ≥ 1/(2k²) ≈ 0.0102 at k=7, while the
    separable-float32 error is ~1e-4 — rint() lands identically."""
    import numpy as np

    off = int.from_bytes(blob[10:14], "little")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    bottom_up = h > 0
    height = abs(h)
    row = (w * 3 + 3) // 4 * 4
    arr = (np.frombuffer(blob, np.uint8, count=row * height, offset=off)
           .reshape(height, row)[:, : w * 3].reshape(height, w, 3))
    if bottom_up:
        arr = arr[::-1]
    arr = arr.copy()
    y0, y1, x0, x1 = _detect_box_python(arr)
    sub = arr[y0:y1, x0:x1]
    if sub.size:
        hh, ww = sub.shape[:2]
        pad = k // 2
        acc = np.zeros(sub.shape, np.float64)
        for dy in range(-pad, pad + 1):
            for dx in range(-pad, pad + 1):
                ys = np.clip(np.arange(hh) + dy, 0, hh - 1)
                xs = np.clip(np.arange(ww) + dx, 0, ww - 1)
                acc += sub[ys][:, xs]
        arr[y0:y1, x0:x1] = np.rint(acc / (k * k)).clip(0, 255).astype(np.uint8)
    out = np.zeros((height, row), np.uint8)
    a = arr[::-1] if bottom_up else arr
    out[:, : w * 3] = a.reshape(height, w * 3)
    return (blob[:off] + out.tobytes()).hex().upper(), w, height


def ensure_media_bmp_fixture(sf_dir: str) -> str:
    """(url, scrubbed_hex, width, height, status) for the REAL numpy
    BMP kernel: synthetic_bmp inputs per doc_id, scrub replicated by
    _bmp_scrub_python (naive-blur, code-independent)."""
    import duckdb

    from ..operators.media import _BmpKernel, synthetic_bmp

    path = os.path.join(
        FIXTURE_DIR, f"media_bmp_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        ids = con.sql(
            f"select doc_id from '{sf_dir}/documents.parquet'"
        ).df()
        rows = [(_bmp_scrub_python(synthetic_bmp(int(i)), _BmpKernel.K))
                for i in ids.doc_id]
        ids["url"] = ids.doc_id.astype(str)
        ids["scrubbed_hex"] = [r[0] for r in rows]
        ids["width"] = [r[1] for r in rows]
        ids["height"] = [r[2] for r in rows]
        ids = ids.astype({"width": "int64", "height": "int64"})
        ids["status"] = "ok"
        _atomic_write_parquet(
            ids[["url", "scrubbed_hex", "width", "height", "status"]], path)
    return path


def ensure_media_features_fixture(sf_dir: str) -> str:
    """(url, features as a comma-joined micro-unit string) via the same
    byte-histogram kernel applied driver-side to the DuckDB-rendered
    html blobs — like media_scrub: validates the mapInPandas plumbing
    and the html synthesis twins (plumbing-level scope, kernel shared by
    design). Each fraction is rendered as round(x * 1e6) — integers, so
    the driver's value hash is type- and format-stable (the raw
    array<double> projection crashed the driver's canonicalizer,
    VERDICT r03 item 1)."""
    import duckdb
    import numpy as np

    from ..operators.media import FEATURE_DIM
    from ..sources.webpages import webpages_from_documents_sql

    path = os.path.join(FIXTURE_DIR,
                        f"media_features_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        con.sql(
            f"create view documents as select * from '{sf_dir}/documents.parquet'"
        )
        pages = con.sql(
            "select url, html from (" + webpages_from_documents_sql() + ")"
        ).df()

        import math

        def feats(blob):
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
            total = max(int(hist.sum()), 1)
            # HALF_UP of (float32 fraction promoted to float64) * 1e6 —
            # the exact op sequence of the Spark-side projection
            # round(cast(x as double) * 1e6, 0)
            return ",".join(
                str(math.floor(float(x) * 1e6 + 0.5))
                for x in (hist / total).astype("float32")
            )

        pages["features"] = pages.html.map(feats)
        _atomic_write_parquet(pages[["url", "features"]], path)
    return path


def ensure_kmeans_fixture(sf_dir: str, n_cells: int = 4, dim: int = 64,
                          iters: int = 3, seed: int = 977) -> str:
    """(cell, centroid — full float64, unrounded) via an INDEPENDENT
    numpy replication of kmeans_train's Lloyd loop (same deterministic
    init + argmax-dot assignment + mean update + empty-cell carry) —
    value-checks the iterative DataFrame training, which has no SQL
    rendering. The dot-product assignment replicates F.aggregate's
    LEFT-TO-RIGHT fold order exactly (column-sequential accumulation,
    not np.matmul's pairwise/SIMD summation), so iteration-1 assignment
    is bit-identical to Spark's; the per-cell mean is the one reduction
    whose order Spark doesn't pin, so consumers compare centroids with
    an epsilon (1e-6) rather than bit-exactly."""
    import duckdb
    import numpy as np

    from ..operators.similarity import make_centroids

    path = os.path.join(
        FIXTURE_DIR,
        f"kmeans_{n_cells}_{iters}_{_source_key(sf_dir, 'embeddings.parquet')}"
        ".parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        emb = con.sql(
            f"select embedding from '{sf_dir}/embeddings.parquet'"
        ).df()
        E = np.array([list(map(float, v)) for v in emb.embedding],
                     dtype=np.float64)
        C = np.array(make_centroids(n_cells, dim, seed), dtype=np.float64)
        for _ in range(iters):
            # sequential fold over dims: ((0 + p0) + p1) + ... — the
            # exact FP-op order of F.aggregate(zip_with(v, c, *), 0.0, +)
            dots = np.zeros((len(E), n_cells), dtype=np.float64)
            for j in range(dim):
                dots += E[:, j:j + 1] * C[:, j]
            assign = np.argmax(dots, axis=1)  # first max, like Spark
            for c in range(n_cells):
                members = E[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    # NOTE: replicate kmeans_train's scalar norm exactly
                    norm = float(sum(x * x for x in m)) ** 0.5
                    if norm > 0:
                        C[c] = m / norm
        import pandas as pd
        out = pd.DataFrame({
            "cell": list(range(1, n_cells + 1)),
            "centroid": [[float(x) for x in row] for row in C],
        })
        _atomic_write_parquet(out, path)
    return path


def ensure_export_zip_fixture(sf_dir: str) -> str:
    """Deterministic platform-export-shaped zips synthesized from the
    documents table, for the archive-ingestion gate entry (S1 zip seam).

    Two archives (doc parity split, so the scan proves multi-archive
    fan-out), each holding:
    - ``posts/your_posts_1.json`` — FB your_posts shape (top-level
      array of {timestamp, title, data:[{post}]}), docs 0-39;
    - ``profile/profile_kv.txt`` — the '\\n\\n' / ': ' TXT record
      shape (get_txt, smparserbase.py:121-127), docs 40-59.

    Every field derives from doc_id/text/lang, so the DuckDB oracle
    re-derives the expected parse output straight from the documents
    view — no zip reading in DuckDB required. Byte-determinism:
    ZIP_STORED, fixed DOS timestamp, doc_id-sorted member rows.
    """
    import json

    import duckdb

    zdir = os.path.join(FIXTURE_DIR, f"export_zips_{_source_key(sf_dir)}")
    done = os.path.join(zdir, ".complete")
    if not os.path.exists(done):
        import shutil
        import zipfile

        shutil.rmtree(zdir, ignore_errors=True)
        os.makedirs(zdir, exist_ok=True)
        con = duckdb.connect()
        docs = con.sql(
            "select doc_id, text, lang from "
            f"'{sf_dir}/documents.parquet' where doc_id < 60 order by doc_id"
        ).fetchall()
        for parity in (0, 1):
            posts = [
                {"timestamp": 1704067200 + did * 3600,
                 "title": f"Post {did}",
                 "data": [{"post": text}]}
                for did, text, _lang in docs
                if did < 40 and did % 2 == parity
            ]
            recs = "\n\n".join(
                f"Name: doc{did}\nLang: {lang}"
                for did, _text, lang in docs
                if 40 <= did < 60 and did % 2 == parity
            )
            zpath = os.path.join(zdir, f"fbexport_{parity}.zip")
            with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
                for name, payload in (
                    ("posts/your_posts_1.json",
                     json.dumps(posts, ensure_ascii=False)),
                    ("profile/profile_kv.txt", recs),
                ):
                    info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                    zf.writestr(info, payload.encode("utf-8"))
        with open(done, "w") as f:
            f.write("ok")
    return zdir


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


BPE_FIXTURE_MERGES = 20


def ensure_bpe_fixture(sf_dir: str) -> str:
    """(merge_idx, left, right) via the independent scalar BPE trainer
    (operators/bpe.py train_bpe_python) over the documents table — the
    fixture oracle for the iterative, non-SQL-expressible Spark
    trainer. Exact-integer counts + lexicographic tie-break make the
    merge list fully deterministic, so the gate compares exact rows."""
    import duckdb
    import pandas as pd

    from ..operators.bpe import train_bpe_python

    path = os.path.join(
        FIXTURE_DIR, f"bpe_{BPE_FIXTURE_MERGES}_{_source_key(sf_dir)}.parquet")
    if not os.path.exists(path):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        con = duckdb.connect()
        texts = [
            r[0] for r in con.sql(
                f"select text from '{sf_dir}/documents.parquet'"
            ).fetchall()
        ]
        merges = train_bpe_python(texts, BPE_FIXTURE_MERGES)
        _atomic_write_parquet(
            pd.DataFrame({
                "merge_idx": range(len(merges)),
                "left": [a for a, _ in merges],
                "right": [b for _, b in merges],
            }),
            path,
        )
    return path
