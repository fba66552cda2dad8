"""Window-scan serving (serve_scan) must match the sequential BatchedEncoder
byte for byte within its static capacities, and fall back to the lossless
raw escape beyond them."""

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """The window programs are the suite's largest XLA CPU executables;
    keeping several alive pushes the process past the order-dependent
    XLA-CPU segfault threshold (see conftest). Dropping caches per TEST in
    this module keeps the live-executable volume bounded; the persistent
    disk cache makes the recompiles cheap."""
    yield
    jax.clear_caches()

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.parallel.serving import BatchedDecoder, BatchedEncoder
from screenpressor_tpu.parallel.serve_scan import (
    WindowConfig,
    encode_window,
    plan_windows,
    serve_windowed,
)
from tests.test_serving import staggered_session_batches

S, H, W = 4, 32, 48


def _cfg(**kw):
    kw.setdefault("kf_interval", 5)
    kw.setdefault("k_fixed", 8)
    kw.setdefault("msr_x", 8)
    kw.setdefault("msr_y", 8)
    return CodecConfig(width=W, height=H, **kw)


def _wcfg(cfg, **kw):
    kw.setdefault("f", 4)
    kw.setdefault("c", 2)
    kw.setdefault("rec_cap", 1024)
    kw.setdefault("col_cap", 1024)
    kw.setdefault("irec_cap", 2048)
    kw.setdefault("icol_cap", 2048)
    kw.setdefault("pack_cap", 8192)
    return WindowConfig(cfg, S, **kw)


@pytest.mark.slow
def test_window_matches_sequential_bytes():
    cfg = _cfg()
    offsets = [0, 1, 2, 3]
    batches = staggered_session_batches(S, H, W, steps=7)
    seq = BatchedEncoder(S, cfg, kf_offsets=offsets)
    win = BatchedEncoder(S, cfg, kf_offsets=offsets)
    want = [seq.encode(b) for b in batches]
    # step 0 keyframes all S streams -> per-step path; window the rest
    got = [win.encode(batches[0])]
    wcfg = _wcfg(cfg)
    got += encode_window(win, batches[1:4], wcfg)
    got += encode_window(win, batches[4:7], wcfg)
    for t, (wt, gt) in enumerate(zip(want, got)):
        for i, ((pw, fw), (pg, fg)) in enumerate(zip(wt, gt)):
            assert fw == fg, (t, i)
            assert pw == pg, (t, i, len(pw), len(pg))


@pytest.mark.slow
def test_window_covers_staggered_keyframes():
    """Keyframes inside the window (per-stream staggered) must still match."""
    cfg = _cfg(kf_interval=3)
    offsets = [0, 1, 2, 0]
    batches = staggered_session_batches(S, H, W, steps=7, seed=11)
    seq = BatchedEncoder(S, cfg, kf_offsets=offsets)
    win = BatchedEncoder(S, cfg, kf_offsets=offsets)
    want = [seq.encode(b) for b in batches]
    got = [win.encode(batches[0])]
    got += encode_window(win, batches[1:7], _wcfg(cfg, f=6))
    for t, (wt, gt) in enumerate(zip(want, got)):
        for i, ((pw, fw), (pg, fg)) in enumerate(zip(wt, gt)):
            assert (fw, pw) == (fg, pg), (t, i)


@pytest.mark.slow
def test_serve_windowed_decodes_lossless():
    cfg = _cfg()
    offsets = [0, 1, 2, 3]
    batches = staggered_session_batches(S, H, W, steps=7)
    enc = BatchedEncoder(S, cfg, kf_offsets=offsets)
    dec = BatchedDecoder(S, cfg)
    outs_all = []
    for t, (outs, decoded) in enumerate(
        serve_windowed(enc, batches, dec, _wcfg(cfg))
    ):
        assert np.array_equal(np.asarray(decoded), batches[t]), t
        outs_all.append(outs)
    dec.validate()
    assert len(outs_all) == len(batches)


@pytest.mark.slow
def test_window_overflow_raw_escape():
    """A stream-step exceeding the record capacity is emitted as a raw frame
    (lossless, tables renewed) instead of corrupting the stream."""
    cfg = _cfg(kf_interval=50)
    rng = np.random.default_rng(5)
    base = np.stack([
        np.full((H, W, 3), 40, np.uint8) for _ in range(S)
    ])
    b1 = base.copy()
    # stream 2: full-frame noise change -> far beyond rec_cap=64
    b1[2] = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    b1[0, 4:8, 4:8] = 200  # small typing edit stays in caps
    b2 = b1.copy()
    b2[1, 10:12, :] = 77
    enc = BatchedEncoder(S, cfg)
    dec = BatchedDecoder(S, cfg)
    dec.decode([p for p, _ in enc.encode(base)])
    wcfg = _wcfg(cfg, rec_cap=64, col_cap=64, pack_cap=4096)
    steps = encode_window(enc, [b1, b2], wcfg)
    for t, (outs, frames) in enumerate(zip(steps, [b1, b2])):
        decoded = dec.decode([p for p, _ in outs])
        assert np.array_equal(np.asarray(decoded), frames), t
    # the noisy stream actually took the escape
    assert steps[0][2][0][0] >> 4 == 0xA
    assert (steps[0][2][0][0] & 0x0F) == 4  # ALG_RAW


def test_plan_windows_shapes():
    cfg = _cfg(kf_interval=3)
    enc = BatchedEncoder(S, cfg, kf_offsets=[0, 1, 2, 0])
    wcfg = _wcfg(cfg, c=1)
    plan = plan_windows(enc, 6, wcfg)
    # step 0 keyframes everyone -> fallback; offsets 0&3 collide -> 2 keys
    # on fn%3==0 steps -> those steps are ineligible at c=1
    assert plan[0] == ("step", 1)
    total = sum(n for _, n in plan)
    assert total == 6


@pytest.mark.slow
def test_decode_window_matches_sequential():
    """decode_window must produce the sequential BatchedDecoder's frames and
    leave identical session state (tables chained through mixed kinds)."""
    import jax

    cfg = _cfg(kf_interval=3)
    offsets = [0, 1, 2, 0]
    batches = staggered_session_batches(S, H, W, steps=7, seed=23)
    enc = BatchedEncoder(S, cfg, kf_offsets=offsets)
    payloads = [[p for p, _ in enc.encode(b)] for b in batches]
    from screenpressor_tpu.parallel.serve_scan import decode_window

    d_seq = BatchedDecoder(S, cfg)
    d_win = BatchedDecoder(S, cfg)
    want = [d_seq.decode(ps) for ps in payloads]
    got0 = d_win.decode(payloads[0])
    frames_fs = decode_window(d_win, payloads[1:])
    d_win.validate()
    assert np.array_equal(np.asarray(got0), want[0])
    got = np.asarray(frames_fs)
    for t in range(1, len(batches)):
        assert np.array_equal(got[t - 1], want[t]), t
        assert np.array_equal(want[t], batches[t]), t
    # continue sequentially after the window: state must have advanced right
    extra = batches[-1].copy()
    extra[:, 5:9, 5:9] = 123
    pe = [p for p, _ in enc.encode(extra)]
    assert np.array_equal(np.asarray(d_win.decode(pe)), np.asarray(d_seq.decode(pe)))


@pytest.mark.slow
def test_decode_window_raw_and_flat():
    cfg = _cfg(kf_interval=50)
    from screenpressor_tpu.parallel.serve_scan import decode_window

    rng = np.random.default_rng(9)
    base = np.stack([np.full((H, W, 3), 20 + i, np.uint8) for i in range(S)])
    b1 = base.copy()
    b1[0] = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)  # raw escape
    b1[1] = 77  # flat transition
    b2 = b1.copy()
    b2[2, 3:6, 3:6] = 250
    enc = BatchedEncoder(S, cfg)
    payloads = [[p for p, _ in enc.encode(b)] for b in (base, b1, b2)]
    dec = BatchedDecoder(S, cfg)
    dec.decode(payloads[0])
    frames_fs = np.asarray(decode_window(dec, payloads[1:]))
    dec.validate()
    assert np.array_equal(frames_fs[0], b1)
    assert np.array_equal(frames_fs[1], b2)


@pytest.mark.slow
def test_decode_window_corrupt_defers_error():
    import pytest as _pytest

    from screenpressor_tpu import bitstream as _bs
    from screenpressor_tpu.parallel.serve_scan import decode_window

    cfg = _cfg(kf_interval=50)
    base = np.stack([synth_desktop_local(i) for i in range(S)])
    b1 = base.copy()
    b1[:, 4:8, 4:12] = 200
    enc = BatchedEncoder(S, cfg)
    payloads = [[p for p, _ in enc.encode(b)] for b in (base, b1)]
    dec = BatchedDecoder(S, cfg)
    dec.decode(payloads[0])
    bad = bytearray(payloads[1][0])
    bad[3] ^= 0xFF  # corrupt a P container body
    payloads[1][0] = bytes(bad)
    try:
        decode_window(dec, [payloads[1]])
        with _pytest.raises(_bs.CorruptStreamError):
            dec.validate()
    except _bs.CorruptStreamError:
        pass  # parse-level rejection is equally acceptable


def synth_desktop_local(i):
    from tests.test_spec_iframe import synth_desktop

    return synth_desktop(H, W, seed=40 + i)


@pytest.mark.slow
def test_single_stream_window_matches_sequential():
    """S=1 windows (the windowed main-bench profile): one stream's frame
    chain through encode_window/decode_window must match the sequential
    batched paths byte-for-byte and decode losslessly."""
    from screenpressor_tpu.parallel.serve_scan import decode_window

    cfg = CodecConfig(width=W, height=H, kf_interval=100, k_fixed=8,
                      msr_x=8, msr_y=8)
    batches = [b[:1] for b in staggered_session_batches(4, H, W, steps=7)]
    seq = BatchedEncoder(1, cfg)
    win = BatchedEncoder(1, cfg)
    want = [seq.encode(b) for b in batches]
    got = [win.encode(batches[0])]
    wcfg = _wcfg(cfg, f=6, c=1)
    got += encode_window(win, batches[1:7], wcfg)
    for t, (wt, gt) in enumerate(zip(want, got)):
        assert (wt[0][0], wt[0][1]) == (gt[0][0], gt[0][1]), t
    dec = BatchedDecoder(1, cfg)
    dec.decode([got[0][0][0]])
    frames_fs = np.asarray(decode_window(dec, [[g[0][0]] for g in got[1:]]))
    dec.validate()
    for t in range(1, len(batches)):
        assert np.array_equal(frames_fs[t - 1, 0], batches[t][0]), t
