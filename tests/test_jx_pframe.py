"""JAX P-frame pipeline: byte-identical streams and lossless round-trips."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.api import Decoder, Encoder
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder
from tests.test_spec_iframe import synth_desktop
from tests.test_spec_pframe import scrolling_sequence, typing_sequence

# small motion ranges keep CPU test time sane; policy must match on both sides
CFG_KW = dict(msr_x=12, msr_y=12)


def _compare_sessions(frames, h, w):
    cfg = CodecConfig(width=w, height=h, **CFG_KW)
    spec_enc = SpecEncoder(cfg)
    jax_enc = Encoder(cfg, backend="jax")._session
    jax_dec = Decoder(cfg, backend="jax")._session
    for i, f in enumerate(frames):
        sd, sft = spec_enc.encode(f)
        jd, jft = jax_enc.encode(f)
        assert jft == sft, f"frame {i} type"
        assert jd == sd, f"frame {i}: jax stream differs from spec"
        out = jax_dec.decode(jd)
        np.testing.assert_array_equal(np.asarray(out), f)


@pytest.mark.slow
def test_typing_session_matches_spec():
    _compare_sessions(typing_sequence(32, 48, 4), 32, 48)


@pytest.mark.slow
def test_scroll_session_matches_spec():
    _compare_sessions(scrolling_sequence(48, 64, 4), 48, 64)


@pytest.mark.slow
def test_corner_changes_match_spec():
    f1 = synth_desktop(33, 47, seed=7)
    frames = [f1]
    for y, x in [(0, 0), (0, 46), (32, 0), (32, 46), (16, 20)]:
        f2 = frames[-1].copy()
        f2[y, x] = (f2[y, x].astype(int) + 1 + x + y).astype(np.uint8)
        frames.append(f2)
    _compare_sessions(frames, 33, 47)


@pytest.mark.slow
def test_identical_and_flat_frames():
    flat = np.full((32, 32, 3), 9, np.uint8)
    f = synth_desktop(32, 32, seed=1)
    _compare_sessions([flat, flat, f, f, np.roll(f, 5, axis=0)], 32, 32)


@pytest.mark.slow
def test_noise_full_change():
    rng = np.random.default_rng(5)
    f1 = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    f2 = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    _compare_sessions([f1, f2], 24, 40)


def test_motion_adjacent_data_block_predictors():
    """A data block whose left neighbor is a motion block: the decoder's
    out-of-sub-rect predictor reads (left edge, PT_PREVFRAME, aboveleft)
    must come from the TRUE previous frame, not the motion-applied
    intermediate (regression: rebuild_frame_device leaked shifted pixels
    into reconstruct_blocks' prev window)."""
    from screenpressor_tpu.config import CodecConfig
    from screenpressor_tpu.jx.codec import JaxDecoder
    from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder

    rng = np.random.default_rng(11)
    h, w = 32, 48
    cfg = CodecConfig(width=w, height=h, msr_x=6, msr_y=6, kf_interval=10)
    prev = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    frame = prev.copy()
    # block (0,0): exact motion match at mv (0, 2)
    frame[0:16, 0:16] = prev[2:18, 0:16]
    # block (0,1): left column copies the prev frame's left edge (PT_LEFT at
    # rx=0), rest is fresh content (literals)
    frame[0:16, 16] = prev[0:16, 15]
    frame[0:16, 17:32] = rng.integers(0, 256, (16, 15, 3), dtype=np.uint8)

    se = SpecEncoder(cfg)
    d0, _ = se.encode(prev)
    d1, _ = se.encode(frame)
    sd, jd = SpecDecoder(cfg), JaxDecoder(cfg)
    np.testing.assert_array_equal(sd.decode(d0), prev)
    np.testing.assert_array_equal(sd.decode(d1), frame)
    np.testing.assert_array_equal(np.asarray(jd.decode(d0)), prev)
    np.testing.assert_array_equal(np.asarray(jd.decode(d1)), frame)
