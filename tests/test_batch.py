"""Pipelined batch session API (jx.codec encode_batch/decode_batch):
byte-identity with the sequential spec backend, frame-type parity, raw-escape
and flat handling, and deferred-validity decode."""

import numpy as np
import pytest

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.jx.codec import JaxDecoder, JaxEncoder
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder

H, W = 48, 64


def session_frames(n=10):
    """Scroll/typing/idle/flat/noise mix exercising I, P, no-change, flat,
    and the raw escape."""
    rng = np.random.default_rng(3)
    base = np.full((H + 8 * n, W, 3), (30, 40, 50), np.uint8)
    base[10 : H - 10, 8 : W - 8] = (250, 250, 250)
    for y in range(12, H - 12, 5):
        base[y : y + 2, 10 : W - 14 : 2] = (10, 20, 30)
    frames = [base[:H].copy()]
    for i in range(1, n):
        k = i % 5
        if k == 1:
            frames.append(base[4 * i : 4 * i + H].copy())
        elif k == 2:
            f = frames[-1].copy()
            f[5:9, 7:12] = (200, 30, 30)
            frames.append(f)
        elif k == 3:
            frames.append(frames[-1].copy())
        elif k == 4:
            frames.append(np.full((H, W, 3), ((i * 13) % 256, 7, 99), np.uint8))
        else:
            frames.append(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))
    frames.append(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))  # raw escape
    return frames


def test_batch_matches_spec_bytes():
    frames = session_frames()
    cfg = CodecConfig(width=W, height=H, kf_interval=4)
    se = SpecEncoder(cfg)
    expected = [se.encode(f) for f in frames]
    got = JaxEncoder(cfg).encode_batch(frames)
    saw_raw = any((eb[0] & 0x0F) == 4 for eb, _ in expected)
    assert saw_raw, "fixture should exercise the raw escape"
    for i, ((eb, et), (gb, gt)) in enumerate(zip(expected, got)):
        assert gt == et, f"frame {i} ftype"
        assert gb == eb, f"frame {i} bytes differ"


@pytest.mark.slow
def test_batch_matches_single_frame_calls():
    frames = session_frames(6)
    cfg = CodecConfig(width=W, height=H, kf_interval=3)
    je1 = JaxEncoder(cfg)
    seq = [je1.encode(f) for f in frames]
    je2 = JaxEncoder(cfg)
    bat = je2.encode_batch(frames)
    assert [b for b, _ in seq] == [b for b, _ in bat]


def test_batch_decode_roundtrip_and_spec_crosscheck():
    frames = session_frames()
    cfg = CodecConfig(width=W, height=H, kf_interval=4)
    payloads = [p for p, _ in JaxEncoder(cfg).encode_batch(frames)]
    outs = JaxDecoder(cfg).decode_batch(payloads)
    sd = SpecDecoder(cfg)
    for i, (f, o, p) in enumerate(zip(frames, outs, payloads)):
        assert np.array_equal(o, f), f"frame {i} jax decode"
        assert np.array_equal(sd.decode(p), f), f"frame {i} spec decode"


def test_batch_decode_device_out_and_split_batches():
    frames = session_frames(8)
    cfg = CodecConfig(width=W, height=H, kf_interval=4)
    payloads = [p for p, _ in JaxEncoder(cfg).encode_batch(frames)]
    dec = JaxDecoder(cfg)
    # split into two batches: session state must chain across batches
    outs = dec.decode_batch(payloads[:3], device_out=True)
    outs += dec.decode_batch(payloads[3:], device_out=True)
    for i, (f, o) in enumerate(zip(frames, outs)):
        assert np.array_equal(np.asarray(o), f), f"frame {i}"


@pytest.mark.slow
def test_batch_loss_mode_matches_spec():
    frames = session_frames(5)
    cfg = CodecConfig(width=W, height=H, kf_interval=3, loss=2)
    se = SpecEncoder(cfg)
    expected = [se.encode(f) for f in frames]
    got = JaxEncoder(cfg).encode_batch(frames)
    for i, ((eb, _), (gb, _)) in enumerate(zip(expected, got)):
        assert gb == eb, f"frame {i} loss-mode bytes differ"
    outs = JaxDecoder(cfg).decode_batch([p for p, _ in got])
    mask = 0xFF & ~3
    for i, (f, o) in enumerate(zip(frames, outs)):
        assert np.array_equal(o, (f & mask) | 2), f"frame {i} loss decode"


def test_batch_decode_corrupt_p_frame_raises():
    frames = session_frames(4)
    cfg = CodecConfig(width=W, height=H, kf_interval=100)
    payloads = [p for p, _ in JaxEncoder(cfg).encode_batch(frames)]
    # find a coded P frame and corrupt its payload tail
    for i, p in enumerate(payloads):
        if (p[0] & 0x0F) == 3 and len(p) > 30:
            bad = bytearray(p)
            for j in range(len(bad) - 8, len(bad)):
                bad[j] ^= 0xA5
            dec = JaxDecoder(cfg)
            with pytest.raises(bs.CorruptStreamError):
                dec.decode_batch(payloads[:i] + [bytes(bad)])
            return
    pytest.fail("no coded P frame found to corrupt")
