"""The real pure-numpy BMP kernel (operators/media.py _BmpKernel).

Unlike the deterministic fake (which stands in for absent PIL), the
BMP path does GENUINE image work: header parse, padded-row pixel
array, separable box blur, spec-valid re-encode. These tests build
BMP files with their OWN writer (independent of _BmpKernel.encode)
and check the blur against an independent naive O(k²) reference."""

import numpy as np
import pandas as pd
import pytest

from social_media_pii_scrubber_spark.operators.media import (
    _BmpKernel, _DefaultDecoder, _scrub_batches, scrub_media,
)


def make_bmp(arr: np.ndarray, bottom_up: bool = True) -> bytes:
    """Independent BMP writer: (H, W, 3) uint8 top-down array → bytes.
    54-byte BITMAPINFOHEADER file, 24-bit BI_RGB, 4-byte row padding.
    """
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    size = 54 + row_bytes * h
    hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
    hdr += (54).to_bytes(4, "little")
    hdr += (40).to_bytes(4, "little")
    hdr += w.to_bytes(4, "little", signed=True)
    hdr += (h if bottom_up else -h).to_bytes(4, "little", signed=True)
    hdr += (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    hdr += (0).to_bytes(4, "little")  # BI_RGB
    hdr += (row_bytes * h).to_bytes(4, "little")
    hdr += b"\x00" * 16
    rows = np.zeros((h, row_bytes), np.uint8)
    a = arr[::-1] if bottom_up else arr
    rows[:, : w * 3] = a.reshape(h, w * 3)
    return hdr + rows.tobytes()


def naive_box_blur(sub: np.ndarray, k: int) -> np.ndarray:
    """O(k²) edge-clamped box blur — independent of the separable
    implementation under test."""
    h, w = sub.shape[:2]
    pad = k // 2
    out = np.zeros_like(sub, dtype=np.float64)
    for dy in range(-pad, pad + 1):
        for dx in range(-pad, pad + 1):
            ys = np.clip(np.arange(h) + dy, 0, h - 1)
            xs = np.clip(np.arange(w) + dx, 0, w - 1)
            out += sub[ys][:, xs].astype(np.float64)
    return np.rint(out / (k * k)).clip(0, 255).astype(np.uint8)


def pattern(h: int, w: int, seed: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestDecodeEncode:
    @pytest.mark.parametrize("bottom_up", [True, False])
    @pytest.mark.parametrize("w", [13, 16])  # odd width exercises padding
    def test_roundtrip_exact(self, bottom_up, w):
        src = pattern(11, w)
        blob = make_bmp(src, bottom_up=bottom_up)
        arr, meta = _BmpKernel.decode(blob)
        assert arr.shape == (11, w, 3)
        assert np.array_equal(arr, src)  # top-down regardless of storage
        assert meta["bottom_up"] is bottom_up
        assert _BmpKernel.encode(arr, meta) == blob  # byte-exact

    def test_truncated_and_unsupported_raise_valueerror(self):
        good = make_bmp(pattern(8, 8))
        with pytest.raises(ValueError):
            _BmpKernel.decode(good[:40])          # truncated header
        with pytest.raises(ValueError):
            _BmpKernel.decode(good[:-10])         # truncated pixels
        bad_bpp = bytearray(good)
        bad_bpp[28:30] = (8).to_bytes(2, "little")
        with pytest.raises(ValueError):
            _BmpKernel.decode(bytes(bad_bpp))     # 8-bit unsupported


class TestBlur:
    def test_detected_blur_matches_naive_reference_outside_untouched(self):
        src = pattern(24, 21, seed=9)
        blob = make_bmp(src)
        out = _BmpKernel.scrub(blob)
        got, meta = _BmpKernel.decode(out)
        y0, y1, x0, x1 = _BmpKernel.detect_region(src)
        assert (y1 - y0, x1 - x0) == (12, 10)  # (h//2, w//2) window
        want = src.copy()
        want[y0:y1, x0:x1] = naive_box_blur(src[y0:y1, x0:x1], _BmpKernel.K)
        assert np.array_equal(got, want)
        # outside the detected box: byte-identical to the input
        mask = np.ones(src.shape[:2], bool)
        mask[y0:y1, x0:x1] = False
        assert np.array_equal(got[mask], src[mask])
        # inside: actually changed (random pattern can't survive a 7x7 mean)
        assert not np.array_equal(got[y0:y1, x0:x1], src[y0:y1, x0:x1])

    def test_detect_region_is_edge_energy_argmax(self):
        # a single high-contrast block in the bottom-right quadrant must
        # pull the proposal onto itself; a flat image ties everywhere and
        # the FIRST row-major window wins (the documented tie-break)
        src = np.full((20, 20, 3), 10, np.uint8)
        src[14:19, 13:19] = 250
        y0, y1, x0, x1 = _BmpKernel.detect_region(src)
        assert y0 >= 8 and x0 >= 7  # window covers the contrast block
        assert (y1 - y0, x1 - x0) == (10, 10)
        assert _BmpKernel.detect_region(
            np.full((16, 12, 3), 40, np.uint8)) == (0, 8, 0, 6)

    def test_output_is_valid_bmp_same_dims(self):
        blob = make_bmp(pattern(10, 10))
        out = _BmpKernel.scrub(blob)
        assert _BmpKernel.is_bmp(out) and len(out) == len(blob)
        _, meta = _BmpKernel.decode(out)
        assert (meta["w"], meta["h"]) == (10, 10)

    def test_uniform_region_is_blur_invariant(self):
        src = np.full((16, 16, 3), 77, np.uint8)
        assert _BmpKernel.scrub(make_bmp(src)) == make_bmp(src)


class TestFixtureReplicationParity:
    def test_kernel_matches_independent_naive_replication(self):
        """The gate fixture's _bmp_scrub_python (naive float64 blur,
        own parser/encoder) must agree byte-for-byte with the separable
        float32 kernel across the whole synthetic_bmp input family —
        the rounding-boundary argument in its docstring, exercised."""
        from social_media_pii_scrubber_spark.functions.oracle_fixtures import (
            _bmp_scrub_python,
        )
        from social_media_pii_scrubber_spark.operators.media import (
            synthetic_bmp,
        )

        for doc_id in range(0, 96):  # covers all 24 (w, h, order) combos
            blob = synthetic_bmp(doc_id)
            want_hex, w, h = _bmp_scrub_python(blob, _BmpKernel.K)
            got = _BmpKernel.scrub(blob)
            assert got.hex().upper() == want_hex, doc_id
            _, meta = _BmpKernel.decode(blob)
            assert (meta["w"], meta["h"]) == (w, h)


class TestDispatchAndSpark:
    def test_default_decoder_dispatches_on_magic(self):
        dec = _DefaultDecoder()
        bmp = make_bmp(pattern(9, 9))
        assert dec.decode_meta(bmp) == (9, 9)          # real header dims
        assert _BmpKernel.is_bmp(dec.blur(bmp))
        fake = dec.blur(b"0123456789" * 3)             # non-BMP: fake mask
        assert fake[10:20] == b"\x00" * 10

    def test_scrub_batches_mixed_formats_per_record_isolation(self):
        bmp = make_bmp(pattern(12, 12))
        pdf = pd.DataFrame({
            "url": ["bmp", "html", "trunc", "null"],
            "html": [bmp, b"<html>x</html>" * 5, bmp[:30], None],
        })
        out = pd.concat(_scrub_batches(iter([pdf]), "url", "html"))
        by = {r.url: r for r in out.itertuples()}
        assert by["bmp"].status == "ok" and by["bmp"].width == 12
        assert bytes(by["bmp"].scrubbed_bytes)[:2] == b"BM"
        assert by["html"].status == "ok"
        assert by["trunc"].status == "error:ValueError"
        assert by["null"].status == "error:ValueError"

    def test_spark_end_to_end_bmp_blur(self, spark):
        src = pattern(20, 17, seed=4)
        df = spark.createDataFrame(
            pd.DataFrame({"url": ["u1"], "html": [make_bmp(src)]}),
            "url string, html binary")
        [r] = scrub_media(df).collect()
        assert r.status == "ok" and (r.width, r.height) == (17, 20)
        got, _ = _BmpKernel.decode(bytes(r.scrubbed_bytes))
        y0, y1, x0, x1 = _BmpKernel.detect_region(src)
        want = src.copy()
        want[y0:y1, x0:x1] = naive_box_blur(src[y0:y1, x0:x1], _BmpKernel.K)
        assert np.array_equal(got, want)
