"""P-frame and session round-trip tests on synthetic screencast sequences."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder, apply_loss
from tests.test_spec_iframe import synth_desktop


def _roundtrip_seq(frames, cfg=None, loss=0):
    h, w, _ = frames[0].shape
    cfg = cfg or CodecConfig(width=w, height=h, loss=loss)
    enc, dec = SpecEncoder(cfg), SpecDecoder(cfg)
    sizes = []
    for f in frames:
        data, ftype = enc.encode(f)
        out = dec.decode(data)
        expect = apply_loss(f, cfg.loss)
        np.testing.assert_array_equal(out, expect)
        sizes.append((len(data), ftype))
    return sizes


def scrolling_sequence(h=64, w=96, n=6):
    base = synth_desktop(h + 8 * n, w, seed=5)
    return [base[8 * i : 8 * i + h].copy() for i in range(n)]


def typing_sequence(h=48, w=80, n=5):
    rng = np.random.default_rng(11)
    f = synth_desktop(h, w, seed=2)
    out = [f.copy()]
    for i in range(1, n):
        f = f.copy()
        # "type" a few characters: small local changes
        y = 10 + 3 * i
        x = 5 * i
        f[y : y + 4, x : x + 3] = rng.integers(0, 256, 3)
        out.append(f)
    return out


def test_identical_frame_is_two_bytes():
    f = synth_desktop(32, 48)
    sizes = _roundtrip_seq([f, f, f])
    assert sizes[1] == (2, 1) and sizes[2] == (2, 1)


def test_flat_frames():
    flat1 = np.full((32, 32, 3), 17, np.uint8)
    flat2 = np.full((32, 32, 3), 99, np.uint8)
    sizes = _roundtrip_seq([flat1, flat1, flat2])
    assert all(s == 4 for s, _ in sizes)


def test_typing_sequence_roundtrip():
    sizes = _roundtrip_seq(typing_sequence())
    # P-frames with small deltas must be far smaller than the I-frame
    assert sizes[0][1] == 0
    for s, ft in sizes[1:]:
        assert ft == 1
        assert s < sizes[0][0] / 3


def test_scrolling_sequence_roundtrip_motion():
    frames = scrolling_sequence()
    sizes = _roundtrip_seq(frames)
    # vertical scroll should be captured by motion vectors; the revealed
    # bottom band is genuinely new content, so P-frames stay below the
    # (fast-adapting, small) I-frame
    for s, ft in sizes[1:]:
        assert ft == 1
        assert s < sizes[0][0]


def test_full_noise_change_roundtrip():
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    f2 = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    _roundtrip_seq([f1, f2])


def test_partial_block_edges():
    # single-pixel change in the middle and at frame corners
    f1 = synth_desktop(33, 47, seed=7)  # non-multiple-of-16 dims
    for y, x in [(0, 0), (0, 46), (32, 0), (32, 46), (16, 20)]:
        f2 = f1.copy()
        f2[y, x] = (f2[y, x].astype(int) + 1).astype(np.uint8)
        sizes = _roundtrip_seq([f1, f2])
        assert sizes[1][0] < 200


def test_keyframe_interval():
    cfg = CodecConfig(width=48, height=32, kf_interval=3)
    frames = typing_sequence(32, 48, 7)
    enc, dec = SpecEncoder(cfg), SpecDecoder(cfg)
    ftypes = []
    for f in frames:
        data, ftype = enc.encode(f)
        np.testing.assert_array_equal(dec.decode(data), f)
        ftypes.append(ftype)
    assert ftypes[0] == 0 and ftypes[3] == 0 and ftypes[6] == 0
    assert ftypes[1] == ftypes[2] == ftypes[4] == ftypes[5] == 1


def test_loss_mode():
    frames = typing_sequence(32, 48, 4)
    for loss in (1, 2, 4):
        sizes = _roundtrip_seq(frames, loss=loss)
    # losing bits must not grow the stream
    lossless = _roundtrip_seq(frames, loss=0)
    lossy = _roundtrip_seq(frames, loss=4)
    assert sum(s for s, _ in lossy) <= sum(s for s, _ in lossless)


def test_p_frame_before_i_rejected():
    cfg = CodecConfig(width=16, height=16)
    enc = SpecEncoder(cfg)
    f = synth_desktop(16, 16)
    enc.encode(f)
    data, ftype = enc.encode(np.roll(f, 1, axis=0))
    assert ftype == 1
    dec = SpecDecoder(cfg)
    with pytest.raises(Exception):
        dec.decode(data)
