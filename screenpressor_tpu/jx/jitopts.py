"""Lazy jit wrapper for programs that embed Pallas section kernels.

The fused section kernels keep table blocks + per-lane payload state
resident in VMEM; at 1080p shapes the estimate runs to ~22 MB against
XLA's default 16 MB scoped-VMEM reservation (TPU v5e has 128 MB VMEM
total). The compiler option must be set on the OUTERMOST jit — inner
jit options are ignored once inlined — so every top-level program that
can reach a section kernel is created through kernel_jit.

The CPU backend *rejects* (not ignores) the option, and the backend is
not known at import time, so the jit is created lazily on first call.

jax also rejects compiler_options on a NESTED jit (the option would be
silently meaningless once the inner program is inlined), and several of
these entry points are reused as building blocks inside larger programs
(e.g. decode_i_device under the serving batch vmap, whose outer program
is itself a kernel_jit). When called under an active trace, dispatch to
a plain jit instead — the outermost program owns the option.
"""

from __future__ import annotations

import functools

import jax

try:  # jax 0.9: no public alias; the serving path needs nested detection
    from jax._src.core import trace_state_clean as _trace_state_clean
except ImportError:  # pragma: no cover - future jax
    _trace_state_clean = None

# Scoped-VMEM cap for kernel-bearing programs. This is a RESERVATION taken
# from the same 128 MB pool XLA's own fusion buffers use, so bigger is not
# better. Round-4 A/Bs (healthy-tunnel, calibrated): raising it so the
# SPTC4 (8,4) color sections kernelize made things WORSE — the kernel's
# whole-window table update is O(window x alphabet) per substep, and at
# 4096 rows/plane the lax.scan coder's O(K x alphabet) update wins. With
# 32 MB (round-3 proven) the estimates route (8,4) color sections to the
# scan path automatically and every smaller kernel behaves as before.
SCOPED_VMEM_KIB = "32768"


def _nested(args, kwargs) -> bool:
    if _trace_state_clean is not None:
        return not _trace_state_clean()
    return any(
        isinstance(x, jax.core.Tracer)
        for x in jax.tree_util.tree_leaves((args, kwargs))
    )


def kernel_jit(fn, *, static_argnames, donate_argnums=None, vmem_kib=None):
    """vmem_kib: override the scoped cap for this entry point. The serving
    batch programs are section-kernel-dominated and their per-stream table
    blocks double-buffer in+out (~66 MB at SPTC4 shapes), so they compile
    with a 96 MB cap; general programs keep the default 32 MB (a bigger
    reservation starves XLA's own fusion buffers — measured -43% on the
    1080p bench at 96 MB)."""
    jitted = None
    cap = vmem_kib or SCOPED_VMEM_KIB
    jkw = {"static_argnames": static_argnames}
    if donate_argnums is not None:
        jkw["donate_argnums"] = donate_argnums
    plain = jax.jit(fn, **jkw)

    @functools.wraps(fn)
    def call(*args, **kwargs):
        nonlocal jitted
        if _nested(args, kwargs):
            return plain(*args, **kwargs)
        if jitted is None:
            opts = (
                {"xla_tpu_scoped_vmem_limit_kib": cap}
                if jax.default_backend() != "cpu"
                else None
            )
            jitted = jax.jit(fn, compiler_options=opts, **jkw)
        return jitted(*args, **kwargs)

    return call


# cap for the serving batch entry points (see kernel_jit docstring)
BATCH_VMEM_KIB = "98304"


def batch_kernel_jit(fn, *, static_argnames, donate_argnums=None):
    return kernel_jit(fn, static_argnames=static_argnames,
                      donate_argnums=donate_argnums,
                      vmem_kib=BATCH_VMEM_KIB)
