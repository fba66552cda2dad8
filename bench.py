"""Benchmark: combined encode+decode throughput on synthetic 1080p screencast.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}
vs_baseline is against the 1 Gpix/s/chip north star (BASELINE.md).
Diagnostics go to stderr.

Measurement model: frames are device-resident (a production TPU pipeline
receives frames over PCIe/ICI at GB/s; the axon dev tunnel moves bytes at
~10 MB/s, which would measure the tunnel, not the codec). The timed path
covers: device analysis/modeling/entropy passes, compressed-byte pulls,
host container assembly (encode); container parsing, payload uploads, device
decode, validity checks (decode). Lossless verification compares decoded
frames against the sources on device after timing.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sptc_jax_cache")

import numpy as np


def _enable_compile_cache():
    """Persistent jit cache: on tunnel-attached TPU rigs every compile is a
    ~44 s remote round-trip regardless of program size, so caching is the
    difference between a 15-minute and a 1-minute bench. The env var alone
    is not sufficient on this stack — the config keys must be set
    explicitly."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def synth_screencast(h, w, n_frames, seed=0):
    """Desktop-like content: window, text lines, scroll, typing, idle.
    Same pixel content as the round-1 bench generator."""
    rng = np.random.default_rng(seed)
    base = np.full((h + 16 * n_frames, w, 3), (40, 44, 52), np.uint8)
    base[40 : h - 40, 60 : w - 60] = (250, 250, 250)
    for y in range(48, h - 48, 14):
        lo, hi = w // 4, max(w - 140, w // 4 + 2)
        ln = int(rng.integers(lo, hi))
        base[y : y + 8, 70 : min(70 + ln, w - 1) : 2] = (20, 20, 24)
    frames = [base[:h].copy()]
    for i in range(1, n_frames):
        kind = i % 4
        if kind == 1:  # scroll
            frames.append(base[8 * i : 8 * i + h].copy())
        elif kind == 2:  # typing: small local change
            f = frames[-1].copy()
            y = 20 + (i * 17) % max(h - 40, 1)
            x = 20 + (i * 41) % max(w - 40, 1)
            f[y : min(y + 10, h), x : min(x + 8, w)] = (200, 30, 30)
            frames.append(f)
        else:  # idle
            frames.append(frames[-1].copy())
    return frames


def main():
    h = int(os.environ.get("BENCH_H", 1080))
    w = int(os.environ.get("BENCH_W", 1920))
    # 64-frame batches amortize the per-batch dispatch/pull fixed costs;
    # measured on TPU v5e: 16 -> 47.6, 64 -> 62.6, 128 -> 56.1 Mpix/s
    n = int(os.environ.get("BENCH_FRAMES", 64))

    # The axon PJRT client blocks forever inside C (GIL held — even
    # SIGALRM can't fire) when the tunnel is down. Probe device init in a
    # killable subprocess first so the bench fails diagnosably — and
    # RETRY with backoff: round 3 lost its headline number to a single
    # tunnel flap at capture time (VERDICT r3), so one flap must not
    # erase a round's evidence. Bounded: ~15 min total by default.
    import subprocess

    probe_deadline = time.monotonic() + float(
        os.environ.get("BENCH_PROBE_WINDOW_S", 900))
    attempt = 0
    while True:
        attempt += 1
        try:
            # init AND a 4 MB data round-trip under a tight deadline: a
            # degraded tunnel can list devices fine yet move bytes at
            # KB/s (observed 2026-08-20: 4 MB pulls of 78-251 s), which
            # poisons every measurement without failing anything. Healthy
            # is ~1 s incl. interpreter start; 20 s separates cleanly
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; jax.devices(); "
                 "assert jax.device_get(jnp.zeros((1 << 22,), jnp.uint8))"
                 ".nbytes == 1 << 22"],
                timeout=20, capture_output=True,
            )
            ok = probe.returncode == 0
            detail = probe.stderr.decode(errors="replace")[-300:]
        except subprocess.TimeoutExpired:
            ok, detail = False, "probe subprocess timed out (20 s)"
        if ok:
            break
        remaining = probe_deadline - time.monotonic()
        if remaining <= 0:
            print(
                "bench: WARNING — tunnel never reached healthy data rates "
                f"within the probe window ({attempt} attempts; last: "
                f"{detail.strip() or 'timeout'}). Running anyway; numbers "
                "may understate the codec (a number with this warning "
                "beats no number).",
                file=sys.stderr, flush=True,
            )
            break
        wait = min(60.0, remaining)
        print(
            f"bench: probe attempt {attempt} failed ({detail.strip() or 'timeout'}); "
            f"retrying in {wait:.0f} s ({remaining:.0f} s left in window)",
            file=sys.stderr, flush=True,
        )
        time.sleep(wait)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    # tunnel-health ruler: the axon data path's speed varies run to run and
    # confounds A/Bs; time a fixed compute + a fixed 4 MB pull so every
    # run's stderr carries a comparable baseline
    xcal = jnp.ones((2048, 2048), jnp.bfloat16)
    jax.block_until_ready(xcal @ xcal)
    t0 = time.perf_counter()
    for _ in range(10):
        xcal = (xcal @ xcal) / 2048.0
    jax.block_until_ready(xcal)
    t_mm = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.zeros((4 * 1024 * 1024,), jnp.uint8))
    t_pull = time.perf_counter() - t0
    print(
        f"bench-cal: 10x2048-matmul {t_mm*1e3:.1f} ms, 4MB pull "
        f"{t_pull*1e3:.1f} ms", file=sys.stderr, flush=True,
    )

    if os.environ.get("BENCH_ONLY_SERVING") == "1":
        # A/B convenience: skip the main 1080p bench, run the serving
        # diagnostic only (no driver JSON line — diagnostics to stderr)
        serving_diag()
        return

    print(f"bench: backend={jax.default_backend()} {h}x{w} x{n} frames", file=sys.stderr)

    from screenpressor_tpu.api import Decoder, Encoder
    from screenpressor_tpu.config import CodecConfig

    # reference-strength motion (±256); BENCH_K_MAX for lane-count A/Bs
    cfg = CodecConfig(width=w, height=h)
    if "BENCH_K_MAX" in os.environ:
        cfg = CodecConfig(width=w, height=h, k_max=int(os.environ["BENCH_K_MAX"]))
    frames_np = synth_screencast(h, w, n)
    frames = [jax.block_until_ready(jnp.asarray(f)) for f in frames_np]

    use_bwin = os.environ.get("BENCH_WINDOW", "0") == "1"
    if use_bwin:
        # window mode: the 64-frame batch is ONE stream's 63-step window
        # after a per-step keyframe — a single device program per side,
        # collapsing the per-frame dispatch/pull chain (serve_scan). The
        # stream uses the k_fixed=32 lane profile (window programs need a
        # static lane count); sizes are reported so the ratio cost of the
        # fixed-lane profile is visible.
        from screenpressor_tpu.parallel.serve_scan import (
            WindowConfig, decode_window, encode_window)
        from screenpressor_tpu.parallel.serving import (
            BatchedDecoder, BatchedEncoder)

        cfgw = CodecConfig(width=w, height=h, k_fixed=32)
        wcfg = WindowConfig(
            cfgw, 1, f=n - 1, c=1,
            rec_cap=int(os.environ.get("BENCH_WIN_REC_CAP", 16384)),
            col_cap=int(os.environ.get("BENCH_WIN_COL_CAP", 16384)),
            pack_cap=1 << 17,
        )
        frames_b = [f.reshape(1, h, w, 3) for f in frames]

        def run():
            enc = BatchedEncoder(1, cfgw)
            dec = BatchedDecoder(1, cfgw)
            t0 = time.perf_counter()
            out0 = enc.encode(frames_b[0])
            steps = [out0] + encode_window(enc, frames_b[1:], wcfg)
            results = [s[0] for s in steps]
            t1 = time.perf_counter()
            dec0 = dec.decode([results[0][0]], device_out=True)
            rest = decode_window(dec, [[p] for p, _ in results[1:]])
            outs = [dec0[0]] + [rest[i, 0] for i in range(n - 1)]
            jax.block_until_ready(outs)
            t2 = time.perf_counter()
            return results, outs, t1 - t0, t2 - t1

        # warmup + timed best-of-N (same protocol as the default path)
        results, outs, _, _ = run()
        t_enc = t_dec = float("inf")
        for _ in range(int(os.environ.get("BENCH_REPEATS", 3))):
            results, outs, te, td = run()
            if te + td < t_enc + t_dec:
                t_enc, t_dec = te, td
        ok = bool(
            jax.device_get(
                jnp.all(jnp.stack([jnp.all(o == f) for o, f in zip(outs, frames)]))
            )
        )
        if not ok:
            print("LOSSLESS CHECK FAILED", file=sys.stderr)
            sys.exit(1)
        total_bytes = sum(len(p) for p, _ in results)
        pixels = n * h * w
        mpix = pixels / (t_enc + t_dec) / 1e6
        raw = pixels * 3
        print(
            f"bench-window: enc {pixels / t_enc / 1e6:.2f} Mpix/s, dec "
            f"{pixels / t_dec / 1e6:.2f} Mpix/s, ratio {raw / total_bytes:.1f}x "
            f"({total_bytes} B)",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "Mpixel/s/chip encode+decode 1080p screencast (lossless)",
                    "value": round(mpix, 3),
                    "unit": "Mpix/s",
                    "vs_baseline": round(mpix / 1000.0, 5),
                }
            ),
            flush=True,
        )
        if os.environ.get("BENCH_SERVING", "1") != "0":
            try:
                serving_diag()
            except Exception as e:
                print(f"bench-serving: skipped ({e})", file=sys.stderr)
        return

    def run():
        enc = Encoder(cfg, backend="jax")
        dec = Decoder(cfg, backend="jax")
        t0 = time.perf_counter()
        results = enc.encode_batch(frames)
        t1 = time.perf_counter()
        payloads = [p for p, _ in results]
        outs = dec.decode_batch(payloads, device_out=True)
        jax.block_until_ready(outs)
        t2 = time.perf_counter()
        return results, outs, t1 - t0, t2 - t1

    # warmup / compile pass (persistent compilation cache in
    # JAX_COMPILATION_CACHE_DIR carries the jits across runs)
    results, outs, _, _ = run()
    # timed steady-state passes: the axon tunnel's latency swings run to
    # run by up to ~2x at identical calibration (measured 61 vs 134 Mpix/s
    # back-to-back); a timed pass costs ~1-2 s, so take the best of
    # BENCH_REPEATS (the codec's capability, not the tunnel's mood).
    # Each pass's encode-phase attribution is collected (jx.codec
    # PHASE_TOTALS) and the BEST pass's breakdown rides along in the JSON
    # line, so the headline number carries its own evidence against
    # tunnel-mood variance.
    from screenpressor_tpu.jx import codec as jxc

    t_enc = t_dec = float("inf")
    best_phases: dict = {}
    jxc.PHASE_COLLECT["on"] = True
    for i in range(int(os.environ.get("BENCH_REPEATS", 6))):
        jxc.PHASE_TOTALS.clear()
        results, outs, te, td = run()
        print(f"bench-pass {i}: enc {te*1e3:.0f} ms dec {td*1e3:.0f} ms",
              file=sys.stderr, flush=True)
        if te + td < t_enc + t_dec:
            t_enc, t_dec = te, td
            best_phases = {k: round(v * 1e3, 1)
                           for k, v in jxc.PHASE_TOTALS.items()}
    jxc.PHASE_COLLECT["on"] = False

    ok = bool(
        jax.device_get(
            jnp.all(jnp.stack([jnp.all(o == f) for o, f in zip(outs, frames)]))
        )
    )
    if not ok:
        print("LOSSLESS CHECK FAILED", file=sys.stderr)
        sys.exit(1)

    total_bytes = sum(len(p) for p, _ in results)
    pixels = n * h * w
    mpix = pixels / (t_enc + t_dec) / 1e6
    raw = pixels * 3
    print(
        f"bench: enc {pixels / t_enc / 1e6:.2f} Mpix/s, dec {pixels / t_dec / 1e6:.2f} "
        f"Mpix/s, ratio {raw / total_bytes:.1f}x ({total_bytes} B)",
        file=sys.stderr,
    )
    # the driver's JSON line goes out FIRST (the serving diagnostic below
    # can cost minutes of one-time jit compiles on a cold cache)
    print(
        json.dumps(
            {
                "metric": "Mpixel/s/chip encode+decode 1080p screencast (lossless)",
                "value": round(mpix, 3),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix / 1000.0, 5),
                "enc_mpix_s": round(pixels / t_enc / 1e6, 1),
                "dec_mpix_s": round(pixels / t_dec / 1e6, 1),
                "cal_matmul_ms": round(t_mm * 1e3, 1),
                "cal_pull4mb_ms": round(t_pull * 1e3, 1),
                "phases_ms": best_phases,
            }
        ),
        flush=True,
    )

    if os.environ.get("BENCH_SERVING", "1") != "0":
        try:
            serving_diag()
        except Exception as e:  # diagnostic only — never fail the bench
            print(f"bench-serving: skipped ({e})", file=sys.stderr)


def serving_diag():
    """Multi-stream serving diagnostic (stderr only): S concurrent 360p
    streams through BatchedEncoder/BatchedDecoder with HBM-resident state
    (BASELINE.md serving target: 64 x 30fps streams/chip)."""
    import jax

    from screenpressor_tpu.config import CodecConfig
    from screenpressor_tpu.parallel.serving import BatchedDecoder, BatchedEncoder

    # the real conferencing profile (BASELINE.md): 64 concurrent 360p streams,
    # reference-strength +-256 motion, staggered per-stream keyframes.
    # BENCH_SERVE_WINDOW=1 runs the F-step window scan
    # (serve_scan.serve_windowed); default is the per-step loop — at the
    # SPTC4 table sizes the window's fixed-capacity section scans were
    # measured slower than the per-step path's per-step-sized scans
    # (13 vs 117 sf/s at the scan-fallback config), so the window stays
    # opt-in until it wins on this profile.
    use_window = os.environ.get("BENCH_SERVE_WINDOW", "0") == "1"
    s, h, w, steps = (
        int(os.environ.get("BENCH_STREAMS", 64)), 360, 640,
        # window mode: 1 + 2*F steps -> one fallback step + two full F=8
        # windows (a single window program; no second compile for a tail)
        int(os.environ.get("BENCH_SERVE_STEPS", 16 if use_window else 4)),
    )
    msr = int(os.environ.get("BENCH_SERVE_MSR", 256))
    kf = int(os.environ.get("BENCH_SERVE_KF", 150))
    cfg = CodecConfig(width=w, height=h, kf_interval=kf, k_fixed=64,
                      msr_x=msr, msr_y=msr)
    offsets = (np.arange(s) * kf) // max(s, 1)
    base = synth_screencast(h, w, steps + 1, seed=3)
    host_batches = [
        np.stack([np.roll(base[t], i * 3, axis=1) for i in range(s)])
        for t in range(steps + 1)
    ]
    # device-resident inputs, same measurement model as the main bench
    # (production frames arrive on device at GB/s; the dev tunnel would
    # otherwise dominate at ~10 MB/s for 44 MB per 64-stream batch)
    import jax.numpy as jnp
    batches = [jax.block_until_ready(jnp.asarray(b)) for b in host_batches]

    def run_serving(window):
        from screenpressor_tpu.parallel.serve_scan import (
            WindowConfig, serve_windowed)
        from screenpressor_tpu.parallel.serving import serve_pipelined

        enc = BatchedEncoder(s, cfg, kf_offsets=offsets)
        dec = BatchedDecoder(s, cfg)
        t0 = time.perf_counter()
        if window:
            wcfg = WindowConfig(
                cfg, s, f=int(os.environ.get("BENCH_SERVE_F", 8)), c=2,
                rec_cap=int(os.environ.get("BENCH_SERVE_REC_CAP", 8192)),
                col_cap=int(os.environ.get("BENCH_SERVE_COL_CAP", 8192)))
            for _, outs in serve_windowed(enc, batches, dec, wcfg):
                pass
        else:
            for _, outs in serve_pipelined(enc, batches, dec):
                pass
        jax.block_until_ready(outs)
        dec.validate()
        return outs, time.perf_counter() - t0

    if use_window:
        try:
            run_serving(True)  # warm (compile)
        except Exception as e:
            # never lose the serving number to a window-path failure:
            # fall back to the per-step loop
            print(f"bench-serving: window path failed ({type(e).__name__}: "
                  f"{str(e)[:2000]}); falling back to per-step",
                  file=sys.stderr, flush=True)
            use_window = False
            run_serving(False)
    else:
        run_serving(False)
    outs, dt = run_serving(use_window)
    if not bool(np.asarray(jax.device_get(outs == batches[-1])).all()):
        print("bench-serving: LOSSLESS CHECK FAILED", file=sys.stderr)
        return
    pix = s * h * w * (steps + 1)
    fps = s * (steps + 1) / dt
    print(
        f"bench-serving: {s} streams 360p msr={msr} staggered-kf: "
        f"{pix / dt / 1e6:.1f} Mpix/s aggregate enc+dec "
        f"({fps:.0f} stream-frames/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
