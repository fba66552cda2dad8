"""I-frame round-trip tests on synthetic screen content (numpy spec)."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.spec.classify import classify_i, reconstruct_i
from screenpressor_tpu.spec.iframe import decode_i, encode_i
from screenpressor_tpu.spec.tables import TableSet


def synth_desktop(h, w, seed=0):
    """Screen-like frame: flat background, window rectangles, text-ish noise."""
    rng = np.random.default_rng(seed)
    f = np.full((h, w, 3), (32, 64, 96), np.uint8)
    for _ in range(4):
        y0, x0 = int(rng.integers(0, max(2, h // 2))), int(rng.integers(0, max(2, w // 2)))
        hh, ww = int(rng.integers(4, max(5, h // 2))), int(rng.integers(4, max(5, w // 2)))
        color = rng.integers(0, 256, 3)
        f[y0 : y0 + hh, x0 : x0 + ww] = color
    # text-like rows: sparse dark pixels on light band
    f[h // 3 : h // 3 + 8, :] = (240, 240, 240)
    mask = rng.random((8, w)) < 0.2
    band = f[h // 3 : h // 3 + 8]
    band[mask] = (10, 10, 10)
    # a smooth gradient region (exercises ptype 4)
    if h >= 18:
        gw = min(w, 64)
        gy = np.arange(16)[:, None] + np.arange(gw)[None, :]
        f[h - 17 : h - 1, :gw, 0] = (gy % 256).astype(np.uint8)
    return f


def _roundtrip_frame(frame):
    h, w, _ = frame.shape
    cfg = CodecConfig(width=w, height=h)
    enc_t, dec_t = TableSet(), TableSet()
    data = encode_i(frame, enc_t, cfg)
    out = decode_i(data, 1, dec_t, cfg)
    np.testing.assert_array_equal(out, frame)
    return data


def test_classify_reconstruct_identity():
    f = synth_desktop(48, 64)
    records, literals = classify_i(f)
    out = reconstruct_i(records, literals, 48, 64)
    np.testing.assert_array_equal(out, f)


def test_classify_reconstruct_random():
    rng = np.random.default_rng(3)
    f = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    records, literals = classify_i(f)
    out = reconstruct_i(records, literals, 24, 31)
    np.testing.assert_array_equal(out, f)


def test_iframe_roundtrip_desktop():
    f = synth_desktop(64, 96)
    data = _roundtrip_frame(f)
    # screen content compresses well below raw
    assert len(data) < 64 * 96 * 3 * 0.35


def test_iframe_roundtrip_tiny():
    f = np.zeros((2, 3, 3), np.uint8)
    f[1, 2] = (1, 2, 3)
    _roundtrip_frame(f)


def test_iframe_roundtrip_single_pixel():
    f = np.full((1, 1, 3), 77, np.uint8)
    _roundtrip_frame(f)


def test_iframe_roundtrip_flat_like():
    # all one color (the session layer would shortcut this; codec must still
    # handle it as a coded I-frame)
    f = np.full((16, 16, 3), 200, np.uint8)
    data = _roundtrip_frame(f)
    assert len(data) < 120


def test_iframe_roundtrip_random_noise():
    rng = np.random.default_rng(9)
    f = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = _roundtrip_frame(f)
    # worst case bounded: ~raw bytes + per-record and per-lane overhead
    # (escalating backoff prices pure noise through the global row at a
    # slightly higher margin than uniform rows did; the session-level raw
    # escape bounds actual codec output at raw + 1 byte)
    assert len(data) < 32 * 32 * 3 * 1.55


def test_long_runs_cap_255():
    f = np.full((8, 200, 3), 5, np.uint8)  # 1600 pixels, runs must split at 255
    records, literals = classify_i(f)
    assert max(n for _, n in records) <= 255
    assert sum(n for _, n in records) == 1600
    _roundtrip_frame(f)
