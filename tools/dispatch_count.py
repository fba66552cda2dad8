"""Count top-level device dispatches + host pulls per serving step (CPU).

The TPU bench rig drives the chip through a tunnel where every dispatched
program costs ~3-5 ms and every blocking pull ~5-50 ms, so the NUMBER of
per-step operations — not their compute — bounds serving throughput
(BACKLOG.md "measured end-of-round-3 state"). This tool runs the batched
serving loop on CPU with the jit-execution primitive instrumented, printing
dispatch/pull counts per step so dispatch regressions are visible (and
fixable) without TPU access.

Usage: python tools/dispatch_count.py [streams] [steps]
"""

import os
import sys as _sys
_sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import jax._src.pjit as _pj

COUNTS = {"dispatch": 0, "pull": 0}

# Wrap the C++ fast-path callable factory: every execution of every jit
# (user jits AND the per-primitive jits behind eager jnp ops) created after
# this point increments the counter. Must run before the package imports.
_orig_cpp = _pj._cpp_pjit


TRACE: list = []  # (name,) per dispatch when SPTC_DISPATCH_TRACE=1
_DO_TRACE = os.environ.get("SPTC_DISPATCH_TRACE") == "1"


def _counting_cpp(fun, jit_info):
    inner = _orig_cpp(fun, jit_info)
    name = str(getattr(jit_info, "fun_sourceinfo", None)
               or getattr(fun, "__qualname__", "?"))

    @functools.wraps(inner)
    def wrapper(*a, **k):
        COUNTS["dispatch"] += 1
        if _DO_TRACE:
            TRACE.append(name)
        return inner(*a, **k)

    for attr in ("clear_cache", "_fun", "lower", "eval_shape", "trace"):
        if hasattr(inner, attr):
            try:
                setattr(wrapper, attr, getattr(inner, attr))
            except Exception:
                pass
    return wrapper


_pj._cpp_pjit = _counting_cpp

_orig_get = jax.device_get


def _counting_get(x):
    COUNTS["pull"] += 1
    return _orig_get(x)


jax.device_get = _counting_get


def main():
    from screenpressor_tpu.config import CodecConfig
    from screenpressor_tpu.parallel.serving import (
        BatchedDecoder,
        BatchedEncoder,
        serve_pipelined,
    )

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    h, w, kf = 72, 128, 12
    cfg = CodecConfig(width=w, height=h, kf_interval=kf, k_fixed=16,
                      msr_x=16, msr_y=16)
    offsets = (np.arange(s) * kf) // max(s, 1)
    rng = np.random.default_rng(5)
    base = np.stack([
        np.roll(
            np.tile(rng.integers(0, 4, (h // 8, w // 8, 3), np.uint8) * 60,
                    (8, 8, 1)),
            3 * i, axis=1)
        for i in range(s)
    ])
    batches = []
    cur = base
    for t in range(steps):
        nxt = np.roll(cur, 2, axis=1)
        nxt[:, 30:36, 40:48] = rng.integers(0, 256, (s, 6, 8, 3))
        batches.append(nxt)
        cur = nxt

    enc = BatchedEncoder(s, cfg, kf_offsets=offsets)
    dec = BatchedDecoder(s, cfg)
    it = serve_pipelined(enc, batches, dec)
    print(f"{s} streams {w}x{h} kf={kf} staggered")
    for t in range(steps):
        before = dict(COUNTS)
        tr0 = len(TRACE)
        next(it)
        d = COUNTS["dispatch"] - before["dispatch"]
        p = COUNTS["pull"] - before["pull"]
        print(f"step {t}: {d:4d} dispatches, {p} pulls")
        if _DO_TRACE:
            from collections import Counter

            for name, n in Counter(TRACE[tr0:]).most_common():
                print(f"    {n:3d}x {name}")


if __name__ == "__main__":
    main()
