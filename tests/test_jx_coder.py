"""JAX section coder must produce byte-identical streams to the numpy spec."""

import numpy as np
import pytest

from screenpressor_tpu.config import lane_count
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.tables import renew_tables
from screenpressor_tpu.spec import coder as sc
from screenpressor_tpu.spec.tables import TableSet

SPEC_CODECS = {
    "rec": sc.RecCodec(),
    "col": sc.ColCodec(),
    "bt": sc.BTCodec(),
    "sxy": sc.SxyCodec(),
    "mv": sc.MVCodec(),
}


def _spec_records(name, n, rng):
    if name == "rec":
        return [(int(p), int(x) + 1) for p, x in zip(rng.integers(0, 6, n), rng.integers(0, 255, n))]
    if name == "col":
        pal = [(255, 255, 255), (0, 0, 0), (30, 60, 200), (128, 5, 77)]
        return [pal[i] for i in rng.choice(4, n, p=[0.6, 0.2, 0.1, 0.1])]
    if name == "bt":
        return [(int(b), int(x) + 1) for b, x in zip(rng.integers(0, 5, n), rng.integers(0, 255, n))]
    if name == "sxy":
        return [tuple(int(v) for v in rng.integers(0, 16, 4)) for _ in range(n)]
    if name == "mv":
        out, mv = [], (0, 0)
        for _ in range(n):
            if rng.random() < 0.5:
                out.append(mv)
            else:
                mv = (int(rng.integers(-64, 65)), int(rng.integers(-64, 65)))
                out.append(mv)
        return out
    raise KeyError(name)


@pytest.mark.parametrize("name", ["rec", "col", "bt", "sxy", "mv"])
@pytest.mark.parametrize("n", [1, 7, 700])
def test_jax_encode_matches_spec(name, n):
    rng = np.random.default_rng(sum(map(ord, name)) + n)
    records = _spec_records(name, n, rng)
    k = lane_count(n)

    spec_blobs = sc.encode_section(records, k, TableSet(), SPEC_CODECS[name])
    rec_arr = np.asarray([list(r) for r in records], np.int32)
    jax_blobs, _ = jc.encode_section(rec_arr, k, renew_tables(), name)
    assert jax_blobs == spec_blobs


@pytest.mark.parametrize("name", ["rec", "col", "bt", "sxy", "mv"])
@pytest.mark.parametrize("n", [1, 7, 700])
def test_jax_decode_matches_spec(name, n):
    rng = np.random.default_rng(sum(map(ord, name)) + n + 7)
    records = _spec_records(name, n, rng)
    k = lane_count(n)
    blobs = sc.encode_section(records, k, TableSet(), SPEC_CODECS[name])
    out, _ = jc.decode_section(blobs, n, k, renew_tables(), name)
    np.testing.assert_array_equal(out, np.asarray([list(r) for r in records], np.int32))


def test_jax_roundtrip_table_lockstep():
    rng = np.random.default_rng(0)
    records = _spec_records("rec", 2000, rng)
    k = lane_count(2000)
    rec_arr = np.asarray(records, np.int32)
    blobs, enc_tabs = jc.encode_section(rec_arr, k, renew_tables(), "rec")
    out, dec_tabs = jc.decode_section(blobs, 2000, k, renew_tables(), "rec")
    np.testing.assert_array_equal(out, rec_arr)
    for kind in ("ptype", "nrun"):
        np.testing.assert_array_equal(
            np.asarray(enc_tabs[kind]["cnt"]), np.asarray(dec_tabs[kind]["cnt"])
        )
        np.testing.assert_array_equal(
            np.asarray(enc_tabs[kind]["cntsum"]), np.asarray(dec_tabs[kind]["cntsum"])
        )
