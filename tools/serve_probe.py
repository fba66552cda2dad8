"""Attribute the serving busy-step cost: run each sub-stage of the 64-stream
P encode (analyze -> eager classify -> counts pull -> sections) with explicit
device syncs, on the same content mix as bench.serving_diag.

Usage: python tools/serve_probe.py   (on TPU)
Env: PROBE_S (streams, default 64), PROBE_KIND (scroll|typing|idle).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sptc_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_screencast, _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp

from screenpressor_tpu.config import CodecConfig, next_pow2
from screenpressor_tpu.jx.pframe import _cands_rmax
from screenpressor_tpu.parallel import serving as sv


def sync(x):
    jax.block_until_ready(x)
    return x


def t(fn, n=3):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    s = int(os.environ.get("PROBE_S", 64))
    h, w = 360, 640
    kind = os.environ.get("PROBE_KIND", "scroll")
    cfg = CodecConfig(width=w, height=h, kf_interval=150, k_fixed=64,
                      msr_x=256, msr_y=256)
    base = synth_screencast(h, w, 6, seed=3)
    tsel = {"scroll": (1, 0), "typing": (2, 1), "idle": (3, 2)}[kind]
    frames = jnp.asarray(
        np.stack([np.roll(base[tsel[0]], i * 3, axis=1) for i in range(s)]))
    prevs = jnp.asarray(
        np.stack([np.roll(base[tsel[1]], i * 3, axis=1) for i in range(s)]))
    sync((frames, prevs))
    print(f"backend={jax.default_backend()} {s}x{h}x{w} kind={kind}",
          flush=True)

    cands, cols, rmax, lows = _cands_rmax(cfg)
    nby, nbx = cfg.nby, cfg.nbx
    nbp = next_pow2(nbx * nby)

    def analyze_dense():
        return sv._batched_analyze_dense(
            frames, prevs, cands, cols, h, w, nby, nbx, rmax, nbp,
            cfg.msr_x, cfg.msr_y, lows[0], lows[1])

    def analyze_map():
        return sv._batched_analyze(
            frames, prevs, cands, cols, h, w, nby, nbx, rmax, nbp,
            cfg.msr_x, cfg.msr_y, lows[0], lows[1])

    ms_d = t(analyze_dense)
    ms_m = t(analyze_map)
    arrs, counts, flat4 = analyze_dense()
    ch = np.asarray(counts)
    print(f"analyze dense: {ms_d:.0f} ms   lax.map: {ms_m:.0f} ms", flush=True)
    print(f"counts[0]: any={ch[:, 0].sum()} n_data max={ch[:, 6].max()} "
          f"mean={ch[:, 6].mean():.1f} n_mv max={ch[:, 5].max()}", flush=True)

    own_d = jnp.ones((s,), bool)
    for bcap in sorted({int(next_pow2(max(int(ch[:, 6].max()), 1))), 64, 256}):
        if bcap > nbx * nby:
            continue

        def classify():
            return sv._batched_classify_eager(
                frames, prevs, arrs["data_rects"], counts, flat4, own_d,
                h, w, bcap)

        print(f"classify_eager bcap={bcap}: {t(classify):.0f} ms", flush=True)

    def pull():
        return jax.device_get(
            (jnp.concatenate([counts, flat4], axis=1),))

    print(f"counts pull: {t(pull):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
