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


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_encode_i_byte_identical(sp):
    """Row/lane-sharded real-pipeline I encode (encode_i_sp) must emit the
    single-device jax Encoder's exact bytes (VERDICT r3 #4: the production
    pipeline row-sharded, not just the analysis pass)."""
    from screenpressor_tpu.api import Encoder
    from screenpressor_tpu.config import CodecConfig
    from screenpressor_tpu.parallel.mesh import encode_i_sp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, sp=sp)
    h, w = 64, 64  # (h // sp) * w stays SEG_TILE-aligned for sp in (2, 4)
    cfg = CodecConfig(width=w, height=h, k_fixed=8)
    frame = synth_desktop(h, w, seed=3)
    want, _ = Encoder(cfg, backend="jax").encode(frame)
    got, ftype, _ = encode_i_sp(frame, mesh, cfg)
    assert ftype == 0
    assert got == want, (len(got), len(want))


def test_sp_encode_i_flat_and_noise():
    from screenpressor_tpu.api import Encoder
    from screenpressor_tpu.config import CodecConfig
    from screenpressor_tpu.parallel.mesh import encode_i_sp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, sp=2)
    h, w = 32, 64
    cfg = CodecConfig(width=w, height=h, k_fixed=8)
    flat = np.full((h, w, 3), 9, np.uint8)
    got, ftype, _ = encode_i_sp(flat, mesh, cfg)
    want, _ = Encoder(cfg, backend="jax").encode(flat)
    assert got == want and len(got) == 4
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    got, _, _ = encode_i_sp(noise, mesh, cfg)
    want, _ = Encoder(cfg, backend="jax").encode(noise)
    assert got == want  # raw escape path agrees too
