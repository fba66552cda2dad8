"""Test configuration: force CPU with 8 virtual devices so tests run
deterministically without TPU hardware.

The environment may export JAX_PLATFORMS=axon/tpu, and pytest plugins
(e.g. jaxtyping's) can import jax before this file runs — at which point JAX
has already snapshotted the env var into its config. Setting the env vars is
therefore not enough; we also override via jax.config after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the live compiled-executable volume per module.

    The full suite compiles hundreds of XLA CPU programs in one process;
    past ~130 tests the next large compile segfaults inside
    backend_compile_and_load (deterministic, order-dependent — an XLA CPU
    code-placement/accumulation issue; each crashing program compiles fine
    in a fresh process). Dropping caches at module boundaries keeps the
    process under the threshold at the cost of recompiling a few shared
    session programs."""
    yield
    import jax

    jax.clear_caches()
