"""P-frame decode stage microbenchmark on the live backend.

Times the three stages of decode_p_device separately (section scans,
resolve, rebuild) plus the full fused program, per content kind, so the
decode optimization order is chosen from data.

Usage: python tools/decode_probe.py          # on TPU via tunnel
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sptc_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, synth_screencast

_enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu.api import Encoder
from screenpressor_tpu.config import CodecConfig, pad_cap
from screenpressor_tpu.jx import pframe as pf
from screenpressor_tpu.jx.jitopts import kernel_jit
from screenpressor_tpu.jx.tables import renew_tables_cached


def t(fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


@functools.partial(kernel_jit, static_argnames=("kts", "caps"))
def _sections_only(payloads, ns, tables, kts, caps):
    return pf.decode_sections_device(payloads, ns, tables, kts, caps)


@functools.partial(
    kernel_jit,
    static_argnames=("h", "w", "nbx", "nby", "kts", "caps", "mcap", "bcap"),
)
def _resolve_only(payloads, ns, xx1, xx2, n_data, prev, tables, h, w, nbx,
                  nby, kts, caps, mcap, bcap):
    return pf.decode_p_resolve(payloads, ns, xx1, xx2, n_data, prev, tables,
                               h, w, nbx, nby, kts, caps, mcap, bcap)


def main():
    h, w = 1080, 1920
    cfg = CodecConfig(width=w, height=h)
    frames = synth_screencast(h, w, 8)
    enc = Encoder(cfg, backend="jax")
    datas = [enc.encode(jnp.asarray(f))[0] for f in frames]
    kinds = {1: "scroll", 2: "typing"}
    prev = jnp.asarray(frames[0])
    tables = renew_tables_cached()
    for i, name in kinds.items():
        parsed = pf.parse_p_header(datas[i], 1, cfg)
        if parsed is None:
            continue
        payloads, ns, kts, caps, (xx1, xx2, n_mv, n_data) = parsed
        payloads = {k: jnp.asarray(v) for k, v in payloads.items()}
        mcap, bcap = pad_cap(n_mv), pad_cap(n_data)
        t_sec = t(lambda: _sections_only(payloads, ns, tables, kts, caps)[0]["bt"])
        t_res = t(lambda: _resolve_only(
            payloads, ns, np.int32(xx1), np.int32(xx2), np.int32(n_data),
            prev, tables, h, w, cfg.nbx, cfg.nby, kts, caps, mcap, bcap)[0][0])
        t_full = t(lambda: pf.decode_p_device(
            payloads, ns, np.int32(xx1), np.int32(xx2), np.int32(n_data),
            prev, tables, h, w, cfg.nbx, cfg.nby, kts, caps, mcap, bcap)[0])
        print(
            f"decode[{name}]: sections {t_sec:.2f} ms | +resolve "
            f"{t_res:.2f} ms | full (+rebuild) {t_full:.2f} ms "
            f"(kts={[(n_, k_, t_) for n_, k_, t_ in kts]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
