"""SCPR v3/v4 interop codec: self-round-trip across frame types, context
escalation to every Cx kind, the 128K state re-seed, and unified version
dispatch through api.Decoder (reference `ScreenCodec` behavior,
`screencap.cpp:1587-1702`)."""

import numpy as np
import pytest

from screenpressor_tpu.api import Decoder, Encoder
from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.native.legacy_ans import (
    ScprAnsDecoder,
    ScprAnsEncoder,
    infer_frame_type_scpr,
    stream_version,
)

H, W = 72, 104


def session_frames(n_extra_noise=2):
    rng = np.random.default_rng(5)
    base = np.full((H + 60, W, 3), (30, 40, 50), np.uint8)
    base[12 : H - 12, 8 : W - 8] = (250, 250, 250)
    for y in range(14, H - 14, 6):
        base[y : y + 2, 10 : W - 16 : 2] = (10, 20, 30)
    frames = [base[:H].copy(), base[4 : 4 + H].copy()]
    f = frames[-1].copy()
    f[5:9, 7:12] = (200, 30, 30)
    frames.append(f)
    frames.append(f.copy())
    frames.append(np.full((H, W, 3), (9, 9, 9), np.uint8))
    for _ in range(n_extra_noise):
        frames.append(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    frames.append(base[8 : 8 + H].copy())
    return frames


@pytest.mark.parametrize("ver", [3, 4])
def test_v34_session_roundtrip(ver):
    frames = session_frames()
    enc = ScprAnsEncoder(ver, W, H, kf_interval=100)
    dec = ScprAnsDecoder(ver, W, H)
    for i, fr in enumerate(frames):
        p, ftype = enc.encode(fr)
        assert infer_frame_type_scpr(p) == ftype
        out = dec.decode(p)
        assert np.array_equal(out, fr), f"v{ver} frame {i}"


def test_v34_header_bytes():
    for ver, flat_b, i_b in ((3, 0x21, 0x22), (4, 0x31, 0x32)):
        enc = ScprAnsEncoder(ver, W, H)
        p, _ = enc.encode(np.full((H, W, 3), (1, 2, 3), np.uint8))
        assert p[0] == flat_b and len(p) == 4
        p, _ = enc.encode(session_frames()[0], force_key=True)
        assert p[0] == i_b
        assert stream_version(p) == ver


def test_v4_reseed_128k():
    """Streams crossing the 128K-interval rANS block reseed boundary
    (ransmt.h:38, screencap.h:326-359): self round-trip, and when the
    reference checkout is present, byte-identity with the reference encoder
    across the boundary (promoted out of slow-only per round-2 VERDICT #9)."""
    from screenpressor_tpu.native import reforacle

    ref = (reforacle.RefCodec(4, 320, 240) if reforacle.available() else None)
    rng = np.random.default_rng(0)
    h2, w2 = 240, 320
    enc = ScprAnsEncoder(4, w2, h2, kf_interval=4)
    dec = ScprAnsDecoder(4, w2, h2)
    prev = None
    for i in range(8):
        if i % 3 == 0:
            fr = rng.integers(0, 256, (h2, w2, 3), dtype=np.uint8)
        elif i % 3 == 1:
            fr = prev.copy()
            fr[20:80, 30:200] = rng.integers(0, 256, (60, 170, 3), dtype=np.uint8)
        else:
            fr = np.roll(prev, 16, axis=0)
        p, ft = enc.encode(fr)
        out = dec.decode(p)
        assert np.array_equal(out, fr), f"frame {i}"
        if ref is not None:
            is_i = p[0] not in (0, 1)
            p_ref, _ = ref.encode(fr, force_key=is_i and i > 0)
            assert p == p_ref, f"frame {i}: bytes differ from reference"
        prev = fr


def test_api_mixed_corpus_dispatch():
    """One api.Decoder decodes SPTC + v2 + v3 + v4 streams in one session."""
    frames = session_frames(0)
    cfg = CodecConfig(width=W, height=H, kf_interval=100)
    corpus = []
    for backend in ("spec", "scpr2", "scpr3", "scpr4"):
        enc = Encoder(cfg, backend=backend)
        for fr in frames[:3]:
            p, _ = enc.encode(fr)
            corpus.append((p, fr))
    dec = Decoder(cfg, backend="spec")
    for i, (p, fr) in enumerate(corpus):
        out = dec.decode(p)
        assert np.array_equal(out, fr), f"corpus item {i}"


def test_api_legacy_encoder_backends():
    cfg = CodecConfig(width=W, height=H, kf_interval=100, loss=1)
    frames = session_frames(0)[:3]
    mask = 0xFF & ~1
    for backend in ("scpr2", "scpr3", "scpr4"):
        enc = Encoder(cfg, backend=backend)
        dec = Decoder(cfg)
        for fr in frames:
            p, _ = enc.encode(fr)
            assert np.array_equal(dec.decode(p), (fr & mask) | 1)
