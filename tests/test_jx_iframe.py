"""JAX I-frame pipeline: byte-identical streams and lossless round-trips."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.jx import iframe as ji
from screenpressor_tpu.jx.classify import classify_i as classify_i_jax
from screenpressor_tpu.jx.tables import renew_tables
from screenpressor_tpu.spec.classify import classify_i as classify_i_spec
from screenpressor_tpu.spec.iframe import encode_i as encode_i_spec
from screenpressor_tpu.spec.tables import TableSet
from tests.test_spec_iframe import synth_desktop


def test_classify_matches_spec():
    f = synth_desktop(40, 56, seed=3)
    spec_recs, spec_lits = classify_i_spec(f)
    records, n_rec, lits, n_lit = classify_i_jax(f, 40, 56)
    n_rec, n_lit = int(n_rec), int(n_lit)
    assert n_rec == len(spec_recs)
    assert n_lit == len(spec_lits)
    np.testing.assert_array_equal(
        np.asarray(records[:n_rec]), np.asarray(spec_recs, np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(lits[:n_lit]), np.asarray(spec_lits, np.int32)
    )


def test_iframe_bytes_match_spec():
    f = synth_desktop(48, 64, seed=1)
    cfg = CodecConfig(width=64, height=48)
    spec_bytes = encode_i_spec(f, TableSet(), cfg)
    jax_bytes, _ = ji.encode_i(f, renew_tables(), cfg)
    assert jax_bytes == spec_bytes


@pytest.mark.slow
def test_iframe_roundtrip_jax():
    for seed in (0, 5):
        f = synth_desktop(48, 64, seed=seed)
        cfg = CodecConfig(width=64, height=48)
        data, _ = ji.encode_i(f, renew_tables(), cfg)
        out, _ = ji.decode_i(data, 1, renew_tables(), cfg)
        np.testing.assert_array_equal(np.asarray(out), f)


@pytest.mark.slow
def test_iframe_roundtrip_noise():
    rng = np.random.default_rng(7)
    f = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    cfg = CodecConfig(width=48, height=32)
    data, _ = ji.encode_i(f, renew_tables(), cfg)
    out, _ = ji.decode_i(data, 1, renew_tables(), cfg)
    np.testing.assert_array_equal(np.asarray(out), f)


def test_large_frame_seg_tile_cross_impl():
    """Frames above the adaptive seg-tile threshold (config.seg_tile
    switches to whole-row ~16K tiles, round 5) must stay byte-identical
    across spec/jax/native encoders and round-trip losslessly."""
    import numpy as np
    import pytest

    from screenpressor_tpu.api import Decoder, Encoder
    from screenpressor_tpu.config import CodecConfig, seg_tile

    h, w = 272, 512
    assert seg_tile(h * w, w) != 1024, "fixture must exercise the large tile"
    rng = np.random.default_rng(9)
    f = np.full((h, w, 3), (40, 44, 52), np.uint8)
    f[30:240, 40:470] = (250, 250, 250)
    for y in range(36, 230, 11):
        f[y : y + 5, 48 : 48 + int(rng.integers(200, 400)) : 2] = (20, 20, 24)
    cfg = CodecConfig(width=w, height=h)
    dj, _ = Encoder(cfg, backend="jax").encode(f)
    ds, _ = Encoder(cfg, backend="spec").encode(f)
    assert dj == ds
    try:
        dn, _ = Encoder(cfg, backend="native").encode(f)
    except Exception as e:  # native toolchain unavailable on this rig
        pytest.skip(f"native backend unavailable: {e}")
    assert dn == dj
    out = Decoder(cfg, backend="jax").decode(dj)
    assert (np.asarray(out) == f).all()
