"""Raw-frame escape: worst-case bound and cross-backend consistency."""

import numpy as np

from screenpressor_tpu.config import ALG_RAW, CodecConfig
from screenpressor_tpu.api import infer_frame_type, max_compressed_size
from screenpressor_tpu.native import NativeDecoder, NativeEncoder, is_available
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder
from tests.test_spec_iframe import synth_desktop


def test_noise_frames_hit_raw_bound():
    rng = np.random.default_rng(0)
    h, w = 40, 56
    cfg = CodecConfig(width=w, height=h, msr_x=8, msr_y=8)
    enc, dec = SpecEncoder(cfg), SpecDecoder(cfg)
    frames = [
        synth_desktop(h, w, seed=1),
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),  # noise P -> raw
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),  # noise P -> raw
        synth_desktop(h, w, seed=2),  # back to compressible (P after raw)
    ]
    sizes = []
    for f in frames:
        data, ftype = enc.encode(f)
        assert len(data) <= max_compressed_size(w, h)
        assert infer_frame_type(data) == ftype
        np.testing.assert_array_equal(dec.decode(data), f)
        sizes.append((len(data), data[0] & 0x0F))
    # both noise frames must be exactly raw + 1 header byte
    raw = 1 + h * w * 3
    assert sizes[1] == (raw, ALG_RAW)
    assert sizes[2] == (raw, ALG_RAW)


def test_raw_escape_native_matches_spec():
    if not is_available():
        return
    rng = np.random.default_rng(3)
    h, w = 32, 48
    cfg = CodecConfig(width=w, height=h, msr_x=8, msr_y=8)
    se, ne = SpecEncoder(cfg), NativeEncoder(cfg)
    nd = NativeDecoder(cfg)
    frames = [
        synth_desktop(h, w, seed=4),
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        synth_desktop(h, w, seed=5),
    ]
    for f in frames:
        a, _ = se.encode(f)
        b, _ = ne.encode(f)
        assert a == b
        np.testing.assert_array_equal(nd.decode(b), f)
