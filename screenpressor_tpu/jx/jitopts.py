"""Lazy jit wrapper for programs that embed Pallas section kernels.

The fused section kernels keep table blocks + per-lane payload state
resident in VMEM; at 1080p shapes the estimate runs to ~22 MB against
XLA's default 16 MB scoped-VMEM reservation (TPU v5e has 128 MB VMEM
total). The compiler option must be set on the OUTERMOST jit — inner
jit options are ignored once inlined — so every top-level program that
can reach a section kernel is created through kernel_jit.

The CPU backend *rejects* (not ignores) the option, and the backend is
not known at import time, so the jit is created lazily on first call.
"""

from __future__ import annotations

import functools

import jax

SCOPED_VMEM_KIB = "32768"


def kernel_jit(fn, *, static_argnames):
    jitted = None

    @functools.wraps(fn)
    def call(*args, **kwargs):
        nonlocal jitted
        if jitted is None:
            opts = (
                {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
                if jax.default_backend() != "cpu"
                else None
            )
            jitted = jax.jit(
                fn, static_argnames=static_argnames, compiler_options=opts
            )
        return jitted(*args, **kwargs)

    return call
