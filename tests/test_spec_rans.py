"""Unit tests for the scalar rANS oracle (reference semantics rans_byte.h)."""

import numpy as np
import pytest

from screenpressor_tpu.config import PROB_SCALE, RANS_L
from screenpressor_tpu.spec.rans import RansEncoder, RansDecoder


def _roundtrip(intervals):
    enc = RansEncoder()
    for cum, freq in reversed(intervals):
        enc.put(cum, freq)
    blob = enc.bytes_out()
    dec = RansDecoder(blob)
    for cum, freq in intervals:
        sf = dec.get()
        assert cum <= sf < cum + freq, (sf, cum, freq)
        dec.advance(cum, freq)
    assert dec.pos == len(blob)
    return blob


def test_empty_stream():
    enc = RansEncoder()
    blob = enc.bytes_out()
    assert len(blob) == 4
    assert int.from_bytes(blob, "little") == RANS_L


def test_single_symbol():
    _roundtrip([(100, 50)])


def test_uniform_symbols():
    f = PROB_SCALE // 256
    intervals = [(int(c) * f, f) for c in np.random.default_rng(0).integers(0, 256, 5000)]
    blob = _roundtrip(intervals)
    # uniform 256-ary symbols cost ~1 byte each
    assert len(blob) <= 5000 * 1.01 + 16


def test_skewed_symbols():
    # p(0) = (PROB_SCALE-63)/PROB_SCALE, others 1/PROB_SCALE over 64 symbols
    rng = np.random.default_rng(1)
    f0 = PROB_SCALE - 63
    syms = rng.choice(64, 20000, p=[f0 / PROB_SCALE] + [1 / PROB_SCALE] * 63)
    intervals = []
    for s in syms:
        s = int(s)
        if s == 0:
            intervals.append((0, f0))
        else:
            intervals.append((f0 + s - 1, 1))
    blob = _roundtrip(intervals)
    # near-zero entropy for the dominant symbol; skewed coding works
    assert len(blob) < 600


def test_min_freq_worst_case():
    # freq=1 symbols cost PROB_BITS bits each; 2-byte renorm path exercised
    from screenpressor_tpu.config import PROB_BITS

    intervals = [(i % PROB_SCALE, 1) for i in range(1000)]
    blob = _roundtrip(intervals)
    assert len(blob) <= 4 + (1000 * PROB_BITS + 7) // 8 + 4


def test_interleaved_lanes_share_nothing():
    rng = np.random.default_rng(2)
    f = PROB_SCALE // 16
    iv1 = [(int(c) * f, f) for c in rng.integers(0, 16, 777)]
    iv2 = [(int(c) * f, f) for c in rng.integers(0, 16, 778)]
    b1, b2 = _roundtrip(iv1), _roundtrip(iv2)
    # independent lanes decode independently from their own blobs
    d1, d2 = RansDecoder(b1), RansDecoder(b2)
    for i in range(778):
        if i < 777:
            cum, freq = iv1[i]
            assert cum <= d1.get() < cum + freq
            d1.advance(cum, freq)
        cum, freq = iv2[i]
        assert cum <= d2.get() < cum + freq
        d2.advance(cum, freq)
