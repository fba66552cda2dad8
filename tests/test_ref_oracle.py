"""Bidirectional conformance against the compiled reference codec.

The definitive interop check: our v2/v3/v4 streams must decode losslessly in
the reference (`screencap.cpp`, compiled from the read-only checkout by
reforacle.build), and reference-encoded streams must decode losslessly in
our native interop decoders.  Covers I, P (motion / partial / full-change),
no-change, flat transitions (incl. the P-after-new-flat case FFmpeg's scpr
decoder cannot handle), and random content.
"""

import numpy as np
import pytest

from screenpressor_tpu.native import reforacle

pytestmark = pytest.mark.skipif(
    not reforacle.available(), reason="reference checkout unavailable"
)

W, H = 80, 48


def _session_frames():
    rng = np.random.default_rng(11)
    base = np.full((H, W, 3), (30, 40, 50), np.uint8)
    base[10:30, 8:60] = (250, 250, 250)
    base[12:14, 11:51:2] = (10, 20, 30)
    scrolled = np.roll(base, 5, axis=0)
    typed = base.copy()
    typed[20:26, 30:34] = (200, 30, 30)
    return [
        (base, True),                 # I
        (scrolled, False),            # P with motion
        (typed, False),               # P partial blocks
        (typed.copy(), False),        # no-change P (1 byte)
        (np.full((H, W, 3), (9, 9, 9), np.uint8), False),   # flat, new color
        (base, False),                # after-flat frame
        (rng.integers(0, 256, (H, W, 3), dtype=np.uint8), False),  # full-change P
        (base, False),                # P back
    ]


def _our_codec(ver, encoder):
    if ver == 2:
        from screenpressor_tpu.native.legacy import (LegacyV2Decoder,
                                                     LegacyV2Encoder)
        return (LegacyV2Encoder(W, H, kf_interval=100) if encoder
                else LegacyV2Decoder(W, H))
    from screenpressor_tpu.native.legacy_ans import (ScprAnsDecoder,
                                                     ScprAnsEncoder)
    return (ScprAnsEncoder(ver, W, H, kf_interval=100) if encoder
            else ScprAnsDecoder(ver, W, H))


@pytest.mark.parametrize("ver", [2, 3, 4])
def test_our_streams_decode_in_reference(ver):
    enc = _our_codec(ver, encoder=True)
    ref = reforacle.RefCodec(ver, W, H)
    for i, (fr, key) in enumerate(_session_frames()):
        payload, ftype = enc.encode(fr, force_key=key)
        got = ref.decode(payload, ftype)
        assert (got == fr).all(), f"v{ver} frame {i}: reference decode diverges"


@pytest.mark.parametrize("ver", [2, 3, 4])
def test_byte_identical_to_reference_encoder(ver):
    """Our interop encoders emit the reference encoder's exact bytes.

    The shim pins the reference to one worker (single-band classify, one
    MV chain), which is the deterministic variant our encoders mirror.
    The only deliberate asymmetry: after a new-color flat frame our
    encoders force an I-frame (FFmpeg compatibility), so the reference is
    asked for a keyframe whenever our stream is one.
    """
    enc = _our_codec(ver, encoder=True)
    ref = reforacle.RefCodec(ver, W, H)
    for i, (fr, key) in enumerate(_session_frames()):
        p_our, _ = enc.encode(fr, force_key=key)
        our_is_i = len(p_our) > 0 and p_our[0] not in (0, 1)
        p_ref, _ = ref.encode(fr, force_key=key or (our_is_i and i > 0))
        assert p_our == p_ref, (
            f"v{ver} frame {i}: stream bytes differ "
            f"({len(p_our)} vs {len(p_ref)})")


@pytest.mark.parametrize("ver", [2, 3, 4])
def test_reference_streams_decode_in_ours(ver):
    ref = reforacle.RefCodec(ver, W, H)
    dec = _our_codec(ver, encoder=False)
    for i, (fr, key) in enumerate(_session_frames()):
        payload, ftype = ref.encode(fr, force_key=key)
        got = dec.decode(payload, ftype=ftype)
        assert (got == fr).all(), f"v{ver} frame {i}: our decode diverges"
