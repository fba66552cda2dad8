"""kernel_jit: scoped-VMEM compiler options only on true top-level calls.

Regression: jax rejects compiler_options on a nested jit, and several
kernel_jit entry points (decode_i_device, encode_sections_raw) are reused
inside the serving batch programs. On CPU the option is never set, so only
the nested-dispatch *mechanism* is testable here; the TPU serving
diagnostic (bench.py) exercises the real error path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu.jx import jitopts


def test_nested_detection():
    seen = []

    def probe(x):
        seen.append(jitopts._nested((x,), {}))
        return x

    assert not jitopts._nested((jnp.ones(3),), {})
    jax.jit(probe)(jnp.ones(3))
    assert seen == [True]


def test_kernel_jit_callable_nested_and_top_level():
    def f(x, n: int):
        return x * n

    g = jitopts.kernel_jit(f, static_argnames=("n",))

    # top-level call (creates the compiler-options jit on TPU)
    out_top = g(jnp.arange(4), n=3)
    assert np.array_equal(np.asarray(out_top), np.arange(4) * 3)

    # nested call must dispatch to the plain jit (no compiler options)
    out_nested = jax.jit(lambda x: g(x, n=3) + 1)(jnp.arange(4))
    assert np.array_equal(np.asarray(out_nested), np.arange(4) * 3 + 1)
