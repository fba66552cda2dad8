"""Compact color-table encode (colw) — byte-identity vs the full-window
path, on both the lax.scan coder and the Pallas kernels (interpret mode).

The colw transform (jx.coder.color_compact_sections) is an encoder-side
re-parameterization only: gathered touched-row tables + remapped rows must
produce EXACTLY the bytes and table state of the full-table path
(substeps.ColW docstring). Reference analog: none — this is a TPU
scheduling optimization over the same format.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.tables import renew_tables


def _mk_section(n, k, palette_size, seed=0):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (palette_size, 3))
    lits = palette[rng.integers(0, palette_size, n)].astype(np.int32)
    t = jc._pad_steps(-(-n // k))
    cap = 1 << (max(n, 1) - 1).bit_length()
    lits_cap = np.zeros((max(cap, 64), 3), np.int32)
    lits_cap[:n] = lits
    dealt = jc.deal_device(jnp.asarray(lits_cap), jnp.int32(n), k, t)
    lens = jc.lane_lens_device(jnp.int32(n), k)
    return dealt, lens, t, jnp.asarray(lits_cap)


def _blobs(buf, start, k):
    buf, start = np.asarray(buf), np.asarray(start)
    return [buf[i, start[i]:].tobytes() for i in range(k)]


@pytest.mark.parametrize("col_w", [256, 1024])
@pytest.mark.parametrize("n,k,pal", [(700, 8, 7), (70, 4, 40), (3, 1, 3)])
def test_colw_byte_identity_scan(n, k, pal, col_w):
    dealt, lens, t, lits_cap = _mk_section(n, k, pal, seed=n)
    nt = int(jc.color_touched_count(lits_cap, jnp.int32(n)))
    assert nt <= col_w, "fixture must fit the bucket"
    b1, s1, tab1 = jc.encode_sections_auto(
        [dealt], [lens], renew_tables(), (("col", k, t),))
    b2, s2, tab2 = jc.encode_sections_auto(
        [dealt], [lens], renew_tables(), (("col", k, t),), col_w=col_w)
    assert _blobs(b1[0], s1[0], k) == _blobs(b2[0], s2[0], k)
    for key in ("cnt", "cntsum", "gcnt", "gsum"):
        np.testing.assert_array_equal(
            np.asarray(tab1["color"][key]), np.asarray(tab2["color"][key]),
            err_msg=key,
        )


def test_colw_byte_identity_kernels(monkeypatch):
    """Same check through the Pallas kernel path (interpret mode on CPU)."""
    monkeypatch.setenv("SPTC_KERNELS", "1")
    dealt, lens, t, lits_cap = _mk_section(300, 8, 9, seed=2)
    b1, s1, tab1 = jc.encode_sections_auto(
        [dealt], [lens], renew_tables(), (("col", 8, t),))
    b2, s2, tab2 = jc.encode_sections_auto(
        [dealt], [lens], renew_tables(), (("col", 8, t),), col_w=256)
    assert _blobs(b1[0], s1[0], 8) == _blobs(b2[0], s2[0], 8)
    np.testing.assert_array_equal(
        np.asarray(tab1["color"]["cnt"]), np.asarray(tab2["color"]["cnt"]))


def test_touched_count_overapproximates():
    """color_touched_count must upper-bound the exact touched rows for
    EVERY lane count (the compact table must contain every accessed row)."""
    for seed, n, pal in ((0, 500, 5), (1, 211, 64), (2, 37, 200)):
        rng = np.random.default_rng(seed)
        palette = rng.integers(0, 256, (pal, 3))
        lits = palette[rng.integers(0, pal, n)].astype(np.int32)
        cap = 1 << (n - 1).bit_length()
        lits_cap = np.zeros((cap, 3), np.int32)
        lits_cap[:n] = lits
        nt = int(jc.color_touched_count(jnp.asarray(lits_cap), jnp.int32(n)))
        for k in (1, 2, 4, 8, 32):
            t = jc._pad_steps(-(-n // k))
            dealt = jc.deal_device(jnp.asarray(lits_cap), jnp.int32(n), k, t)
            lens = jc.lane_lens_device(jnp.int32(n), k)
            rows = np.asarray(jc._col_rows_exact(dealt, lens))
            active = np.arange(t)[:, None] < np.asarray(lens)[None, :]
            exact = set(np.unique(rows[active])) | {0}
            assert len(exact) <= nt, (seed, k, len(exact), nt)


@pytest.mark.slow
def test_colw_e2e_session_vs_spec():
    """Full session with the compact path forced on: jax bytes == spec
    bytes, lossless round-trip (covers I + P col sections, table chaining
    through restore, and the raw/flat interplay)."""
    os.environ["SPTC_COLW"] = "1"
    try:
        from screenpressor_tpu.api import Decoder, Encoder
        from screenpressor_tpu.config import CodecConfig

        rng = np.random.default_rng(1)
        h, w = 48, 64
        cfg = CodecConfig(width=w, height=h, kf_interval=3)
        base = np.full((h, w, 3), (40, 44, 52), np.uint8)
        base[8:40, 6:58] = (250, 250, 250)
        for y in range(10, 38, 5):
            base[y:y + 2, 8:56:2] = (20, 20, 24)
        frames = [base.copy()]
        for i in range(1, 7):
            f = frames[-1].copy()
            if i % 3 == 1:
                f = np.roll(f, 4, axis=0)
            elif i % 3 == 2:
                y, x = 8 + i * 3, 5 + i * 5
                f[y:y + 4, x:x + 4] = rng.integers(0, 256, (4, 4, 3))
            frames.append(f)
        enc_j = Encoder(cfg, backend="jax")
        enc_s = Encoder(cfg, backend="spec")
        dec_j = Decoder(cfg, backend="jax")
        for i, f in enumerate(frames):
            dj, _ = enc_j.encode(f)
            ds, _ = enc_s.encode(f)
            assert dj == ds, f"frame {i}"
            out = dec_j.decode(dj)
            assert (np.asarray(out) == f).all(), f"frame {i} roundtrip"
    finally:
        os.environ.pop("SPTC_COLW", None)
