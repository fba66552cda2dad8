"""Sharded analysis on a virtual 8-device mesh must match single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from screenpressor_tpu.jx.classify import fits_planes_i
from screenpressor_tpu.parallel.mesh import make_mesh, sharded_analysis_step
from tests.test_spec_iframe import synth_desktop


@pytest.mark.parametrize("sp", [1, 2, 4])
def test_sharded_fits_match(sp):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, sp=sp)
    s, h, w = 8 // sp * 2, 32, 48
    frames = np.stack([synth_desktop(h, w, seed=i) for i in range(s)])
    prevs = np.roll(frames, 2, axis=1)
    fits, changed, flat = sharded_analysis_step(
        jnp.asarray(frames), jnp.asarray(prevs), mesh
    )
    fits = np.asarray(fits)
    for i in range(s):
        ref = np.asarray(fits_planes_i(jnp.asarray(frames[i]))).reshape(h, w, 6)
        np.testing.assert_array_equal(fits[i], ref)
    assert np.asarray(changed).shape == (s,)
    assert not np.asarray(flat).any()


def test_sharded_flat_detection():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, sp=2)
    s, h, w = 8, 32, 32
    frames = np.stack(
        [np.full((h, w, 3), 10 * i, np.uint8) for i in range(s)]
    )
    frames[3] = synth_desktop(h, w)
    fits, changed, flat = sharded_analysis_step(
        jnp.asarray(frames), jnp.asarray(frames), mesh
    )
    flat = np.asarray(flat)
    assert flat[0] and flat[1] and not flat[3]
    assert not np.asarray(changed).any()


@pytest.mark.slow
def test_dryrun_entry():
    """Full multichip dryrun (~3 min of shard compiles on the 1-core CI
    rig). Slow-marked: the round driver executes the same entry point
    (__graft_entry__.dryrun_multichip) on every round, so the default lane
    still has independent coverage of the sharded path via
    test_sharded_fits_match."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
