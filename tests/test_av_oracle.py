"""Independent-oracle conformance: decode our SCPR v2/v3 interop streams
through FFmpeg's clean-room scpr decoder (libavcodec) and require lossless
equality.

This is the only check that can catch mirror-image bugs in the frame-walk
reimplementation (`native/scpr_legacy.cpp`, `native/scpr_ans.cpp` vs the
reference `screencap.cpp:319-498,1091-1432`): our own encoder/decoder pair
round-trips by construction.  FFmpeg supports stream versions 1-3; v4
(which differs from v3 only by the Cx6 initial frequency f0=32 vs 64,
`screencap.cpp:1611-1615`) is rejected by libavcodec and is covered by the
v3 oracle run plus the f0-parameter round-trip tests in test_legacy_v34.
"""

import json
import os

import numpy as np
import pytest

from screenpressor_tpu.native import avoracle

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(
    not avoracle.available(), reason="libavcodec scpr oracle unavailable"
)


def _golden(name):
    with open(os.path.join(DATA, "golden_manifest.json")) as f:
        info = json.load(f)[name]
    with open(os.path.join(DATA, name), "rb") as f:
        data = f.read()
    frames = np.load(
        os.path.join(DATA, f"golden_frames_{info['h']}x{info['w']}.npy"))
    return data, info, frames


@pytest.mark.parametrize("ver", [2, 3])
@pytest.mark.parametrize("size", ["48x64", "49x67"])
def test_golden_streams_decode_losslessly_via_libavcodec(ver, size):
    data, info, frames = _golden(f"golden_scpr{ver}_{size}.bin")
    dec = avoracle.AvScprDecoder(info["w"], info["h"])
    off = 0
    for i, n in enumerate(info["sizes"]):
        got = dec.decode(data[off:off + n])
        off += n
        assert (got == frames[i]).all(), (
            f"v{ver} {size} frame {i}: libavcodec decode diverges "
            f"({(got != frames[i]).any(axis=2).sum()} px)")


@pytest.mark.parametrize("ver", [2, 3])
def test_live_session_decodes_via_libavcodec(ver):
    """Fresh encode (I, P-with-motion, no-change, flat, raw-ish) -> oracle."""
    if ver == 2:
        from screenpressor_tpu.native.legacy import LegacyV2Encoder as Enc
        enc = Enc(80, 48, kf_interval=4)
    else:
        from screenpressor_tpu.native.legacy_ans import ScprAnsEncoder as Enc
        enc = Enc(ver, 80, 48, kf_interval=4)
    rng = np.random.default_rng(7)
    base = np.full((48, 80, 3), (30, 40, 50), np.uint8)
    base[10:30, 8:60] = (250, 250, 250)
    base[12:14, 11:51:2] = (10, 20, 30)
    scrolled = np.roll(base, 5, axis=0)
    typed = base.copy()
    typed[20:26, 30:34] = (200, 30, 30)
    frames = [base, scrolled, typed, typed.copy(),
              np.full((48, 80, 3), (9, 9, 9), np.uint8),
              rng.integers(0, 256, (48, 80, 3), dtype=np.uint8), base]
    oracle = avoracle.AvScprDecoder(80, 48)
    for i, fr in enumerate(frames):
        payload, _ = enc.encode(fr)
        got = oracle.decode(payload)
        assert (got == fr).all(), f"v{ver} live frame {i} diverges"
