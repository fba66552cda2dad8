"""SCPR v2 legacy interop: round-trips through the reference bitstream format."""

import numpy as np
import pytest

from screenpressor_tpu.native.legacy import (
    LegacyV2Decoder,
    LegacyV2Encoder,
    infer_frame_type_v2,
)
from tests.test_spec_iframe import synth_desktop
from tests.test_spec_pframe import scrolling_sequence, typing_sequence


def _roundtrip(frames, h, w):
    enc = LegacyV2Encoder(w, h)
    dec = LegacyV2Decoder(w, h)
    sizes = []
    for i, f in enumerate(frames):
        data, ftype = enc.encode(f)
        assert infer_frame_type_v2(data) == ftype
        out = dec.decode(data)
        np.testing.assert_array_equal(out, f, err_msg=f"frame {i}")
        sizes.append((len(data), ftype))
    return sizes


def test_v2_iframe_roundtrip():
    f = synth_desktop(48, 64, seed=1)
    sizes = _roundtrip([f], 48, 64)
    assert sizes[0][1] == 0
    assert sizes[0][0] < 48 * 64 * 3


def test_v2_typing_sequence():
    sizes = _roundtrip(typing_sequence(32, 48, 5), 32, 48)
    assert all(ft == 1 for _, ft in sizes[1:])


def test_v2_scroll_sequence_motion():
    sizes = _roundtrip(scrolling_sequence(64, 96, 5), 64, 96)
    # vertical scroll must engage motion compensation: small P-frames
    for s, ft in sizes[1:]:
        assert ft == 1
        assert s < sizes[0][0]


def test_v2_idle_frames():
    f = synth_desktop(32, 32, seed=3)
    sizes = _roundtrip([f, f, f], 32, 32)
    assert sizes[1] == (1, 1) and sizes[2] == (1, 1)  # 1-byte no-change frames


def test_v2_flat_frames():
    flat = np.full((32, 32, 3), 55, np.uint8)
    sizes = _roundtrip([flat, flat], 32, 32)
    assert sizes[0] == (4, 0)


def test_v2_noise_roundtrip():
    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, (24, 40, 3), dtype=np.uint8),
        rng.integers(0, 256, (24, 40, 3), dtype=np.uint8),
    ]
    _roundtrip(frames, 24, 40)


def test_v2_odd_width_stride():
    # widths not divisible by 4 exercise the stride-padding byte semantics
    f1 = synth_desktop(33, 47, seed=7)
    f2 = f1.copy()
    f2[10:20, 10:30] = (9, 8, 7)
    _roundtrip([f1, f2], 33, 47)


def test_v2_keyframe_interval():
    enc = LegacyV2Encoder(48, 32, kf_interval=3)
    dec = LegacyV2Decoder(48, 32)
    frames = typing_sequence(32, 48, 7)
    for i, f in enumerate(frames):
        data, ftype = enc.encode(f)
        assert ftype == (0 if i % 3 == 0 else 1)
        np.testing.assert_array_equal(dec.decode(data), f)
