"""A/B: 1080p I-frame section encode — scan fallback vs Pallas kernel with a
raised VMEM budget (v5e has 128 MB VMEM; the default guard is 12 MB).

Run on TPU: python tools/iframe_kernel_ab.py
Env: AB_LIMIT_MB (kernel+fuse limit, default 24), AB_SCOPED_KIB (scoped vmem
compiler option for the wrapping jit, default 32768).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sptc_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import synth_screencast, _enable_compile_cache


def t(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    _enable_compile_cache()
    from screenpressor_tpu.jx import coder as jc
    from screenpressor_tpu.jx import kernels as kx
    from screenpressor_tpu.jx import iframe as jif
    from screenpressor_tpu.jx.classify import classify_i
    from screenpressor_tpu.jx.tables import renew_tables
    from screenpressor_tpu.config import CodecConfig

    h, w = 1080, 1920
    f = jnp.asarray(synth_screencast(h, w, 1)[0])
    records, n_rec, lits, n_lit = jax.jit(
        classify_i, static_argnums=(1, 2))(f, h, w)
    n_rec, n_lit = int(n_rec), int(n_lit)
    cfg = CodecConfig(w, h)
    k_rec, k_col = cfg.lanes(n_rec), cfg.lanes(n_lit)
    t_rec = jc._pad_steps(-(-n_rec // k_rec))
    t_col = jc._pad_steps(-(-n_lit // k_col))
    print(f"n_rec={n_rec} n_lit={n_lit} (k,t) rec=({k_rec},{t_rec}) "
          f"col=({k_col},{t_col})", flush=True)

    raw_threshold = 1 + w * h * 3

    def run(tag):
        tables = renew_tables()
        enc = jax.jit(
            jif.encode_i_raw._fun if hasattr(jif.encode_i_raw, "_fun")
            else jif.encode_i_raw.__wrapped__,
            static_argnames=("k_rec", "t_rec", "k_col", "t_col",
                             "raw_threshold"),
            compiler_options=(
                {"xla_tpu_scoped_vmem_limit_kib":
                 os.environ.get("AB_SCOPED_KIB", "32768")}
                if jax.default_backend() != "cpu" else None),
        )
        ms = t(lambda: enc(records, jnp.int32(n_rec), lits,
                           jnp.int32(n_lit), tables, k_rec, t_rec,
                           k_col, t_col, raw_threshold))
        out = enc(records, jnp.int32(n_rec), lits, jnp.int32(n_lit),
                  tables, k_rec, t_rec, k_col, t_col, raw_threshold)
        total = int(np.asarray(out[6])[0])
        print(f"{tag}: {ms:.1f} ms  total_bytes={total}", flush=True)
        return total

    base = run("baseline (col on scan path)")

    lim = int(os.environ.get("AB_LIMIT_MB", 24)) * 1024 * 1024
    jc._KERNEL_VMEM_LIMIT = lim
    kx._FUSE_VMEM_LIMIT = lim
    jax.clear_caches()
    new = run(f"kernel limit={lim // (1024 * 1024)}MB")
    assert new == base, (new, base)
    print("bytes identical", flush=True)


if __name__ == "__main__":
    main()
