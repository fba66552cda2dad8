"""Native C++ codec: byte-identical streams and lossless round-trips."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.native import NativeDecoder, NativeEncoder, is_available
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder
from tests.test_spec_iframe import synth_desktop
from tests.test_spec_pframe import scrolling_sequence, typing_sequence

pytestmark = pytest.mark.skipif(not is_available(), reason="no native toolchain")


def _compare(frames, h, w, **kw):
    cfg = CodecConfig(width=w, height=h, **kw)
    se, ne = SpecEncoder(cfg), NativeEncoder(cfg)
    nd = NativeDecoder(cfg)
    for i, f in enumerate(frames):
        sd, sft = se.encode(f)
        ndt, nft = ne.encode(f)
        assert nft == sft, f"frame {i} type"
        assert ndt == sd, f"frame {i}: native stream differs from spec"
        out = nd.decode(ndt)
        np.testing.assert_array_equal(out, f)


def test_native_typing_matches_spec():
    _compare(typing_sequence(32, 48, 4), 32, 48, msr_x=12, msr_y=12)


def test_native_scroll_matches_spec():
    _compare(scrolling_sequence(48, 64, 4), 48, 64, msr_x=12, msr_y=12)


def test_native_flat_and_idle():
    flat = np.full((32, 32, 3), 7, np.uint8)
    f = synth_desktop(32, 32, seed=2)
    _compare([flat, flat, f, f], 32, 32, msr_x=12, msr_y=12)


def test_native_noise():
    rng = np.random.default_rng(4)
    f1 = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    f2 = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    _compare([f1, f2], 24, 40, msr_x=12, msr_y=12)


def test_native_loss():
    cfg = CodecConfig(width=48, height=32, loss=2, msr_x=12, msr_y=12)
    ne, nd = NativeEncoder(cfg), NativeDecoder(cfg)
    se = SpecEncoder(cfg)
    for f in typing_sequence(32, 48, 3):
        ndt, _ = ne.encode(f)
        sd, _ = se.encode(f)
        assert ndt == sd
        out = nd.decode(ndt)
        from screenpressor_tpu.spec.codec import apply_loss
        np.testing.assert_array_equal(out, apply_loss(f, 2))


def test_native_cross_decode():
    # native encodes, spec decodes — and vice versa
    cfg = CodecConfig(width=48, height=32, msr_x=12, msr_y=12)
    ne = NativeEncoder(cfg)
    sd = SpecDecoder(cfg)
    for f in typing_sequence(32, 48, 3):
        data, _ = ne.encode(f)
        np.testing.assert_array_equal(sd.decode(data), f)
    se = SpecEncoder(cfg)
    nd = NativeDecoder(cfg)
    for f in scrolling_sequence(32, 48, 3):
        data, _ = se.encode(f)
        np.testing.assert_array_equal(nd.decode(data), f)
