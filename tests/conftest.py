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

# Persistent compile cache: the per-module jax.clear_caches() below (an XLA
# CPU segfault workaround) forces shared session programs to recompile many
# times per run; the disk cache turns each recompile into a ~100 ms
# deserialization (measured: 2.3 s -> 0.09 s). Keyed by HLO hash + compile
# options — but NOT by host CPU features: XLA CPU AOT blobs from a
# different machine type load with "machine feature not supported"
# errors (observed 2026-08-21 alongside a one-off byte-mismatch flake),
# so the directory is additionally keyed by a host fingerprint.
import hashlib

try:
    with open("/proc/cpuinfo") as _fh:
        _flags = next(
            (ln for ln in _fh if ln.startswith("flags")), "")
except OSError:  # pragma: no cover - non-Linux
    _flags = ""
_host_key = hashlib.sha1(_flags.encode()).hexdigest()[:8]
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SPTC_TEST_CACHE", f"/tmp/sptc_jax_cache_cpu_{_host_key}"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


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
