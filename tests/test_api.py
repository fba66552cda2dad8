"""End-to-end API tests across pixel formats and session policies."""

import numpy as np
import pytest

from screenpressor_tpu import CodecConfig, Decoder, Encoder, PixelFormat
from screenpressor_tpu.api import FormatParams, quality_to_loss
from tests.test_spec_iframe import synth_desktop
from tests.test_spec_pframe import typing_sequence


def test_rgb24_session():
    frames = typing_sequence(32, 48, 4)
    cfg = CodecConfig(width=48, height=32)
    enc, dec = Encoder(cfg), Decoder(cfg)
    for f in frames:
        data, _ = enc.encode(f)
        np.testing.assert_array_equal(dec.decode(data), f)
    assert enc.stats["ratio"] > 3


def test_rgb32_session():
    cfg = CodecConfig(width=48, height=32)
    fmt = FormatParams(pixel_format=PixelFormat.RGB32)
    enc, dec = Encoder(cfg, fmt), Decoder(cfg, fmt)
    rng = np.random.default_rng(0)
    for f24 in typing_sequence(32, 48, 3):
        f32 = np.dstack([f24, rng.integers(0, 256, (32, 48), dtype=np.uint8)])
        data, _ = enc.encode(f32)
        out = dec.decode(data)
        np.testing.assert_array_equal(out[..., :3], f24)
        assert (out[..., 3] == 255).all()


@pytest.mark.parametrize("masks", [(0xF800, 0x07E0, 0x001F), (0x7C00, 0x03E0, 0x001F)])
def test_rgb16_session(masks):
    cfg = CodecConfig(width=40, height=24)
    fmt = FormatParams(pixel_format=PixelFormat.RGB16, rmask=masks[0], gmask=masks[1], bmask=masks[2])
    enc, dec = Encoder(cfg, fmt), Decoder(cfg, fmt)
    rng = np.random.default_rng(1)
    limit = 1 << 15 if masks[0] == 0x7C00 else 1 << 16
    f = rng.integers(0, limit, (24, 40), dtype=np.uint16)
    # mostly-flat screen with a noisy window
    flat = np.full((24, 40), 0x1234, np.uint16)
    flat[5:15, 5:25] = f[5:15, 5:25]
    for frame in (flat, flat, np.roll(flat, 3, axis=0)):
        data, _ = enc.encode(frame)
        np.testing.assert_array_equal(dec.decode(data), frame)


def test_quality_mapping():
    assert quality_to_loss(10000) == 0
    assert quality_to_loss(9000) == 0
    assert quality_to_loss(8000) == 1
    assert quality_to_loss(0) == 4


def test_crash_latch():
    cfg = CodecConfig(width=32, height=32)
    enc, dec = Encoder(cfg), Decoder(cfg)
    f = synth_desktop(32, 32)
    data, _ = enc.encode(f)
    dec.decode(data)
    p, _ = enc.encode(np.roll(f, 1, axis=1))
    corrupt = p[:8] + bytes([p[8] ^ 0xFF]) + p[9:] if len(p) > 9 else p
    try:
        dec.decode(corrupt)
        crashed = False
    except Exception:
        crashed = True
    if crashed:
        # subsequent P-frames rejected until a keyframe arrives
        with pytest.raises(Exception):
            dec.decode(p)
        data2, ftype = enc.encode(f, force_key=True)
        assert ftype == 0
        np.testing.assert_array_equal(dec.decode(data2), f)
