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


# ---------------------------------------------------------------------------
# Round-4 conformance-envelope widening (VERDICT r3 #5): >=720p frames
# crossing the 128K-interval rANS block reseed (`screencap.h:326-331`),
# loss>0 sessions, kf_interval rollover, and oracle-checking the pinned
# reseed golden instead of only self-pinning it.
# ---------------------------------------------------------------------------


def _hd_frames(w=1280, h=720):
    """720p session whose I-frame emits far more than 128K intervals (the
    noise band alone is ~920K pixel records), so every v3/v4 stream crosses
    multiple 128K block reseeds."""
    rng = np.random.default_rng(17)
    base = np.full((h, w, 3), (40, 44, 52), np.uint8)
    base[40 : h - 40, 60 : w - 60] = (250, 250, 250)
    for y in range(48, h - 48, 14):
        base[y : y + 8, 70 : w - 140 : 2] = (20, 20, 24)
    base[h // 2 :, : w // 2] = rng.integers(0, 256, (h - h // 2, w // 2, 3),
                                            dtype=np.uint8)
    scrolled = np.roll(base, 16, axis=0)
    typed = scrolled.copy()
    typed[100:140, 200:260] = (200, 30, 30)
    return [(base, True), (scrolled, False), (typed, False),
            (typed.copy(), False)]


@pytest.mark.slow
@pytest.mark.parametrize("ver", [2, 3, 4])
def test_hd_720p_reseed_byte_identical(ver):
    """Bidirectional 720p conformance: byte-identity with the reference
    encoder across multiple 128K-block reseeds, and reference streams decode
    losslessly in our codecs at the same size."""
    w, h = 1280, 720
    if ver == 2:
        from screenpressor_tpu.native.legacy import (LegacyV2Decoder,
                                                     LegacyV2Encoder)
        enc, dec = LegacyV2Encoder(w, h, kf_interval=100), LegacyV2Decoder(w, h)
    else:
        from screenpressor_tpu.native.legacy_ans import (ScprAnsDecoder,
                                                         ScprAnsEncoder)
        enc = ScprAnsEncoder(ver, w, h, kf_interval=100)
        dec = ScprAnsDecoder(ver, w, h)
    ref_dec = reforacle.RefCodec(ver, w, h)
    ref_enc = reforacle.RefCodec(ver, w, h)
    for i, (fr, key) in enumerate(_hd_frames(w, h)):
        p_our, ftype = enc.encode(fr, force_key=key)
        p_ref, _ = ref_enc.encode(fr, force_key=key)
        assert p_our == p_ref, f"v{ver} 720p frame {i}: bytes differ"
        assert (ref_dec.decode(p_our, ftype) == fr).all(), (
            f"v{ver} 720p frame {i}: reference decode diverges")
        assert (dec.decode(p_ref, ftype=ftype) == fr).all(), (
            f"v{ver} 720p frame {i}: our decode diverges")


@pytest.mark.slow
@pytest.mark.parametrize("ver", [2, 3, 4])
@pytest.mark.parametrize("loss", [1, 2])
def test_lossy_session_byte_identical(ver, loss):
    """loss>0 conformance: the reference applies DoLoss internally
    (p.loss via Init -> SetupLossMask, screencap.cpp:119,127-139); our
    interop encoders receive host-side apply_loss'd frames. Streams must be
    byte-identical and both decoders must return the loss-quantized frames."""
    from screenpressor_tpu.spec.codec import apply_loss

    enc = _our_codec(ver, encoder=True)
    dec = _our_codec(ver, encoder=False)
    ref = reforacle.RefCodec(ver, W, H, loss=loss)
    for i, (fr, key) in enumerate(_session_frames()):
        # flat frames bypass loss (reference: IsFlat short-circuits before
        # DoLoss, screencap.cpp:1489-1501)
        is_flat = bool((fr == fr.reshape(-1, 3)[0]).all())
        lossy = fr if is_flat else apply_loss(fr, loss)
        p_our, ftype = enc.encode(lossy, force_key=key)
        our_is_i = len(p_our) > 0 and p_our[0] not in (0, 1)
        p_ref, _ = ref.encode(fr, force_key=key or (our_is_i and i > 0))
        assert p_our == p_ref, f"v{ver} loss={loss} frame {i}: bytes differ"
        got = dec.decode(p_ref, ftype=ftype)
        assert (got == lossy).all(), (
            f"v{ver} loss={loss} frame {i}: decode != loss-quantized source")


@pytest.mark.slow
@pytest.mark.parametrize("ver", [2, 3, 4])
def test_kf_interval_rollover_byte_identical(ver):
    """Automatic keyframes from the interval policy (reference: VfW layer
    keyframe decision, screenpressor.cpp:402-406): drive 2.5 intervals with
    no host force flags; our auto-keyed frames must byte-match a reference
    asked for keyframes at exactly those frames, and decode in the
    reference."""
    kf = 3
    if ver == 2:
        from screenpressor_tpu.native.legacy import LegacyV2Encoder
        enc = LegacyV2Encoder(W, H, kf_interval=kf)
    else:
        from screenpressor_tpu.native.legacy_ans import ScprAnsEncoder
        enc = ScprAnsEncoder(ver, W, H, kf_interval=kf)
    ref_enc = reforacle.RefCodec(ver, W, H)
    ref_dec = reforacle.RefCodec(ver, W, H)
    frames = [fr for fr, _ in _session_frames()]
    key_frames = []
    for i, fr in enumerate(frames):
        p_our, ftype = enc.encode(fr)
        if ftype == 0:
            key_frames.append(i)
        p_ref, _ = ref_enc.encode(fr, force_key=(ftype == 0))
        assert p_our == p_ref, f"v{ver} rollover frame {i}: bytes differ"
        assert (ref_dec.decode(p_our, ftype) == fr).all(), (
            f"v{ver} rollover frame {i}: reference decode diverges")
    # the interval policy actually rolled over (not just frame 0), modulo
    # content-forced keys (flat transitions force I in our encoders)
    assert 0 in key_frames and len(key_frames) >= 3, key_frames


@pytest.mark.slow
def test_reseed_golden_is_oracle_backed():
    """The pinned `procedural_scpr4_reseed` golden decodes losslessly in the
    compiled reference decoder (it was previously only self-pinned)."""
    import os
    import sys
    import zlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    import json

    from screenpressor_tpu.native.legacy_ans import ScprAnsEncoder
    from tools.make_goldens import reseed_session_frames

    w, h = 320, 240
    enc = ScprAnsEncoder(4, w, h, kf_interval=4)
    ref = reforacle.RefCodec(4, w, h)
    payloads = []
    for i, fr in enumerate(reseed_session_frames()):
        p, ftype = enc.encode(fr)
        payloads.append(p)
        assert (ref.decode(p, ftype) == fr).all(), (
            f"reseed golden frame {i}: reference decode diverges")
    manifest = json.load(open(os.path.join(root, "tests", "data",
                                           "golden_manifest.json")))
    meta = manifest["procedural_scpr4_reseed"]
    assert [len(p) for p in payloads] == meta["sizes"]
    assert zlib.crc32(b"".join(payloads)) == meta["crc32"]
