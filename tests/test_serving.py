"""Batched multi-stream encoding: byte-equality with per-stream sessions."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.parallel.serving import BatchedEncoder
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder
from tests.test_spec_iframe import synth_desktop


def test_batched_iframes_match_per_stream():
    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, k_fixed=8)
    frames = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    frames[2] = 77  # one flat stream in the batch

    batched = BatchedEncoder(s, cfg)
    outs = batched.encode(frames)

    for i in range(s):
        enc = SpecEncoder(cfg)
        dec = SpecDecoder(cfg)
        want, ftype = enc.encode(frames[i])
        got, got_ft = outs[i]
        assert got_ft == ftype
        assert got == want, f"stream {i} batched bytes differ"
        np.testing.assert_array_equal(dec.decode(got), frames[i])


def test_batched_pframes_match_per_stream():
    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, k_fixed=8, msr_x=8, msr_y=8)
    f0 = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    f1 = f0.copy()
    f1[0] = np.roll(f0[0], 4, axis=0)        # scroll -> motion
    f1[1, 10:14, 10:20] = (200, 9, 9)        # local edit -> data blocks
    # stream 2: unchanged -> 2-byte frame; stream 3: goes flat
    f1[3] = 123

    batched = BatchedEncoder(s, cfg)
    outs0 = batched.encode(f0)
    outs1 = batched.encode(f1)

    for i in range(s):
        enc = SpecEncoder(cfg)
        dec = SpecDecoder(cfg)
        a, fta = enc.encode(f0[i])
        b, ftb = enc.encode(f1[i])
        assert outs0[i] == (a, fta), f"stream {i} keyframe differs"
        assert outs1[i] == (b, ftb), f"stream {i} P-frame differs"
        np.testing.assert_array_equal(dec.decode(a), f0[i])
        np.testing.assert_array_equal(dec.decode(b), f1[i])


def staggered_session_batches(s, h, w, seed=40, steps=7):
    """Deterministic mixed-kind session: typing edits everywhere, one motion
    stream, one flat transition (t=3), one no-change stream (t=5). Shared by
    the staggered/pipelined tests so their per-step section shapes (and thus
    compiled programs) are identical — the suite compiles each program once."""
    assert s >= 4, "mixed-kind session needs streams 1..3 for motion/flat/no-change"
    frames = np.stack([synth_desktop(h, w, seed=seed + i) for i in range(s)])
    batches = []
    for t in range(steps):
        f = frames.copy()
        if t > 0:
            f[:, (t * 5) % (h - 4) : (t * 5) % (h - 4) + 3,
              (t * 7) % (w - 6) : (t * 7) % (w - 6) + 4] = (t * 30 % 255, 80, 10)
            f[1] = np.roll(frames[1], 4, axis=0)  # motion stream
        if t == 3:
            f[2] = 9          # flat stream mid-session
        if t == 5:
            f[3] = batches[-1][3]  # no-change stream
        frames = f
        batches.append(f)
    return batches


def test_batched_second_keyframe_keeps_table_lockstep():
    # two rounds of keyframes: flat streams must not perturb their tables
    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, kf_interval=1, k_fixed=8)
    f0 = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    f1 = np.stack([np.roll(synth_desktop(h, w, seed=i), 3, axis=1) for i in range(s)])
    batched = BatchedEncoder(s, cfg)
    outs0 = batched.encode(f0)
    outs1 = batched.encode(f1)
    for i in range(s):
        enc = SpecEncoder(cfg)
        a, _ = enc.encode(f0[i])
        b, _ = enc.encode(f1[i])
        assert outs0[i][0] == a
        assert outs1[i][0] == b


@pytest.mark.slow
def test_batched_decoder_roundtrip():
    """BatchedDecoder must losslessly decode BatchedEncoder streams across
    I, P, flat, and no-change frames with device-resident state."""
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, kf_interval=3, k_fixed=8,
                      msr_x=8, msr_y=8)
    enc = BatchedEncoder(s, cfg)
    dec = BatchedDecoder(s, cfg)
    rng = np.random.default_rng(9)
    prev = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    for step in range(6):
        frames = prev.copy()
        if step == 1:
            for i in range(s):
                frames[i] = np.roll(frames[i], 4, axis=0)
        elif step == 2:
            frames[0, 5:9, 7:12] = (200, 30, 30)  # typing on stream 0 only
        elif step == 3:
            frames[1] = (7, 8, 9)  # flat stream amid P streams
        elif step == 4:
            frames[2] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = dec.decode([p for p, _ in enc.encode(frames)])
        assert out.shape == (s, h, w, 3)
        for i in range(s):
            np.testing.assert_array_equal(out[i], frames[i], err_msg=f"step {step} stream {i}")
        prev = frames


@pytest.mark.slow
def test_batched_decoder_matches_single_stream():
    """Batched streams decode identically through the per-stream jax backend."""
    from screenpressor_tpu.jx.codec import JaxDecoder
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, kf_interval=4, k_fixed=8,
                      msr_x=8, msr_y=8)
    enc = BatchedEncoder(s, cfg)
    dec_b = BatchedDecoder(s, cfg)
    dec_1 = [JaxDecoder(cfg) for _ in range(s)]
    prev = np.stack([synth_desktop(h, w, seed=10 + i) for i in range(s)])
    for step in range(5):
        frames = prev.copy()
        if step % 2 == 1:
            for i in range(s):
                frames[i] = np.roll(frames[i], 3 + i, axis=1)
        payloads = [p for p, _ in enc.encode(frames)]
        out_b = dec_b.decode(payloads)
        for i in range(s):
            np.testing.assert_array_equal(out_b[i], dec_1[i].decode(payloads[i]))
        prev = frames


@pytest.mark.slow
def test_staggered_keyframes_match_per_stream_sessions():
    """Per-stream kf offsets: every stream's bytes must equal an independent
    session configured with the same keyframe phase (mixed I/P batches)."""
    s, h, w = 4, 32, 48
    kf = 3
    offsets = [0, 1, 2, 0]
    cfg = CodecConfig(width=w, height=h, kf_interval=kf, k_fixed=8,
                      msr_x=8, msr_y=8)
    # phase expressed purely via force_key on the singles (kf_interval=0
    # disables their own schedule)
    cfg_single = CodecConfig(width=w, height=h, kf_interval=0, k_fixed=8,
                             msr_x=8, msr_y=8)
    batched = BatchedEncoder(s, cfg, kf_offsets=offsets)
    singles = [SpecEncoder(cfg_single) for _ in range(s)]
    decs = [SpecDecoder(cfg_single) for _ in range(s)]

    for t, f in enumerate(staggered_session_batches(s, h, w)):
        outs = batched.encode(f)
        for i in range(s):
            # single-stream sessions express the phase via force_key
            force = t > 0 and (t + offsets[i]) % kf == 0
            want, want_ft = singles[i].encode(f[i], force_key=force)
            got, got_ft = outs[i]
            assert (got, got_ft) == (want, want_ft), (t, i)
            np.testing.assert_array_equal(decs[i].decode(got), f[i])


@pytest.mark.slow
def test_staggered_keyframes_batched_decoder_roundtrip():
    """Mixed I/P batches through BatchedDecoder: the compacted I decode
    (only the keyframing streams run the record scan) must stay lossless
    and keep per-stream table state identical to the full-batch path."""
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, kf_interval=3, k_fixed=8,
                      msr_x=8, msr_y=8)
    offsets = [0, 1, 2, 0]
    enc = BatchedEncoder(s, cfg, kf_offsets=offsets)
    dec = BatchedDecoder(s, cfg)
    for t, f in enumerate(staggered_session_batches(s, h, w)):
        outs = enc.encode(f)
        got = dec.decode([p for p, _ in outs])
        np.testing.assert_array_equal(got, f, err_msg=f"step {t}")


def test_deferred_error_check_device_out():
    """device_out decode defers the corrupt-stream raise to the next
    decode()/validate() call (the serving mode skips the blocking error
    pull; see BatchedDecoder.validate)."""
    from screenpressor_tpu import bitstream as bs
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    s, h, w = 2, 32, 48
    cfg = CodecConfig(width=w, height=h, kf_interval=0, k_fixed=4,
                      msr_x=8, msr_y=8)
    enc = BatchedEncoder(s, cfg)
    dec = BatchedDecoder(s, cfg)
    base = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    payloads = [p for p, _ in enc.encode(base)]
    dec.decode(payloads, device_out=True)
    dec.validate()  # clean step: no deferred error
    # tamper stream 1's keyframe: decrementing n_rec shifts the lane deal,
    # so the decoded records no longer tile the frame — a deterministic
    # device-side error (host parse cannot see it)
    (n_rec, n_lit), pos = bs.read_varint(payloads[1], 1, 2)
    assert n_rec - 1 >= n_lit > 0
    bad = payloads[1][:1] + bs.pack_varint(n_rec - 1, n_lit) + payloads[1][pos:]
    dec2 = BatchedDecoder(s, cfg)
    # the corrupt decode itself must NOT raise in device_out mode...
    dec2.decode([payloads[0], bad], device_out=True)
    # ...the next validate()/decode() resolves it, naming the stream
    with pytest.raises(bs.CorruptStreamError, match="stream 1"):
        dec2.validate()


@pytest.mark.slow
def test_serving_full_profile_64_streams_360p():
    """The BASELINE.md conferencing profile: 64 concurrent 360p streams,
    staggered keyframes, reference-strength motion range; lossless through
    BatchedEncoder -> BatchedDecoder."""
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    s, h, w, kf = 64, 360, 640, 150
    cfg = CodecConfig(width=w, height=h, kf_interval=kf, k_fixed=64,
                      msr_x=256, msr_y=256)
    offsets = (np.arange(s) * kf) // s
    rng = np.random.default_rng(9)
    base = np.stack([
        np.roll(synth_desktop(h, w, seed=i % 8), 3 * i, axis=1)
        for i in range(s)
    ])
    enc = BatchedEncoder(s, cfg, kf_offsets=offsets)
    dec = BatchedDecoder(s, cfg)
    cur = base
    for t in range(3):
        outs = enc.encode(cur)
        back = dec.decode([p for p, _ in outs], device_out=True)
        assert bool(np.asarray(back == cur).all()), f"t={t}"
        nxt = np.roll(cur, 4, axis=1)  # scroll all streams
        nxt[:, 40:46, 50:58] = rng.integers(0, 256, (s, 6, 8, 3))
        cur = nxt


def test_dense_batch_analysis_bytes_match_serial():
    # the vmapped force_dense analysis (busy-batch heuristic) must make the
    # exact MV/record choices of the serial tiered path: encode the same
    # sequence with the heuristic forced on and off, bytes must be equal
    s, h, w = 4, 32, 48
    cfg = CodecConfig(width=w, height=h, k_fixed=8, msr_x=8, msr_y=8)
    f0 = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    f1 = np.stack([np.roll(f, 4, axis=0) for f in f0])   # scroll everywhere
    f2 = f1.copy()
    f2[:, 6:10, 8:22] = (1, 250, 9)                      # data blocks

    outs = {}
    for forced in (0, 10**9):
        enc = BatchedEncoder(s, cfg)
        enc.encode(f0)
        enc._last_active = forced  # force serial (0) / dense (huge) paths
        o1 = enc.encode(f1)
        enc._last_active = forced
        o2 = enc.encode(f2)
        outs[forced] = (o1, o2)
    assert outs[0] == outs[10**9]


@pytest.mark.slow
def test_pipelined_serving_matches_sequential():
    """serve_pipelined (one-step encoder lookahead) must produce bytes
    identical to step-by-step encode()/decode() across mixed I/P batches
    with staggered keyframes, flat transitions, and no-change streams."""
    from screenpressor_tpu.parallel.serving import BatchedDecoder, serve_pipelined

    s, h, w = 4, 32, 48
    kf = 3
    offsets = [0, 1, 2, 0]
    cfg = CodecConfig(width=w, height=h, kf_interval=kf, k_fixed=8,
                      msr_x=8, msr_y=8)
    batches = staggered_session_batches(s, h, w)

    enc_seq = BatchedEncoder(s, cfg, kf_offsets=offsets)
    dec_seq = BatchedDecoder(s, cfg)
    want = []
    for b in batches:
        outs = enc_seq.encode(b)
        back = dec_seq.decode([p for p, _ in outs])
        want.append(outs)
        np.testing.assert_array_equal(back, b)

    enc = BatchedEncoder(s, cfg, kf_offsets=offsets)
    dec = BatchedDecoder(s, cfg)
    got = list(serve_pipelined(enc, batches, dec, device_out=False))
    assert len(got) == len(batches)
    for t, ((outs, back), b) in enumerate(zip(got, batches)):
        assert outs == want[t], f"step {t}: pipelined bytes differ"
        np.testing.assert_array_equal(back, b, err_msg=f"step {t}")


@pytest.mark.slow
def test_serving_kernel_paths_interpret(monkeypatch):
    """Serving round-trip with the Pallas kernels FORCED ON (interpret mode
    on CPU). The batched-kernel plumbing (static `batched` flags, the
    BatchTracer import, the batch VMEM budgets) is only exercised when
    use_kernels() is true, which CPU tests otherwise never hit — two round-4
    TPU-only failures (TracerBoolConversionError, Mosaic scoped-VMEM OOM
    from a silent never-firing batched estimate) escaped that way."""
    from screenpressor_tpu.parallel.serving import BatchedDecoder

    monkeypatch.setenv("SPTC_KERNELS", "1")
    cfg = CodecConfig(width=48, height=32, kf_interval=3, k_fixed=8,
                      msr_x=8, msr_y=8)
    s = 4
    rng = np.random.default_rng(0)
    base = np.stack(
        [rng.integers(0, 200, (32, 48, 3), dtype=np.uint8) | 1
         for _ in range(s)]
    )
    b1 = base.copy()
    b1[:, 4:8, 4:12] = 200
    enc = BatchedEncoder(s, cfg, kf_offsets=[0, 1, 2, 0])
    dec = BatchedDecoder(s, cfg)
    for t, b in enumerate((base, b1, b1.copy())):
        outs = enc.encode(b)
        got = dec.decode([p for p, _ in outs])
        assert np.array_equal(np.asarray(got), b), t
