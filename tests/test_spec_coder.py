"""Round-trip tests for the K-lane BSAC section coder (numpy spec)."""

import numpy as np
import pytest

from screenpressor_tpu.config import PROB_SCALE, lane_count
from screenpressor_tpu.spec.coder import (
    BTCodec,
    ColCodec,
    MVCodec,
    RecCodec,
    SxyCodec,
    decode_section,
    encode_section,
)
from screenpressor_tpu.spec.tables import Table, TableSet


def _roundtrip(records, codec, k=None):
    k = k if k is not None else lane_count(len(records))
    enc_tabs, dec_tabs = TableSet(), TableSet()
    blobs = encode_section(records, k, enc_tabs, codec)
    out = decode_section(blobs, len(records), k, dec_tabs, codec)
    assert out == list(records)
    # encoder/decoder models must stay in lockstep
    for name in enc_tabs.tables:
        np.testing.assert_array_equal(enc_tabs[name].cnt, dec_tabs[name].cnt)
        np.testing.assert_array_equal(enc_tabs[name].cntsum, dec_tabs[name].cntsum)
    return blobs


def test_rec_roundtrip_small():
    recs = [(0, 1), (1, 255), (2, 16), (1, 255), (0, 3)]
    _roundtrip(recs, RecCodec(), k=1)
    _roundtrip(recs, RecCodec(), k=4)


def test_rec_roundtrip_many_lanes():
    rng = np.random.default_rng(0)
    recs = [(int(p), int(n) + 1) for p, n in zip(rng.integers(0, 6, 3000), rng.integers(0, 255, 3000))]
    _roundtrip(recs, RecCodec())


def test_rec_adaptivity_compresses():
    # heavily repetitive records should compress far below the uniform cost
    recs = [(1, 255)] * 4000
    blobs = _roundtrip(recs, RecCodec(), k=4)
    total = sum(len(b) for b in blobs)
    # uniform cost would be ~ (log2(6)+8)/8 * 4000 ~ 5200B; adaptive -> small
    # (fast-adaptation steps trade a little steady-state precision for a much
    # cheaper transient; see config.STEP)
    assert total < 1400


def test_col_roundtrip():
    rng = np.random.default_rng(1)
    recs = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(2000)]
    _roundtrip(recs, ColCodec())


def test_col_correlated_compresses():
    # screen-like palette: few distinct colors. Short sequences are dominated
    # by the uniform-init adaptation transient (~raw-byte cost), long
    # sequences must reach steady-state efficiency.
    palette = [(255, 255, 255), (0, 0, 0), (30, 60, 200), (30, 60, 201)]
    rng = np.random.default_rng(2)
    recs = [palette[i] for i in rng.choice(4, 12000, p=[0.7, 0.2, 0.05, 0.05])]
    blobs = _roundtrip(recs, ColCodec())
    total = sum(len(b) for b in blobs)
    assert total < 12000 * 3  # always beats raw bytes
    assert total < 12000 * 0.75  # steady state well under 1B per 3B pixel


def test_bt_sxy_codecs():
    rng = np.random.default_rng(3)
    bts = [(int(b), int(n) + 1) for b, n in zip(rng.integers(0, 5, 500), rng.integers(0, 255, 500))]
    _roundtrip(bts, BTCodec())
    sxys = [tuple(int(v) for v in rng.integers(0, 16, 4)) for _ in range(500)]
    _roundtrip(sxys, SxyCodec())


def test_mv_codec_with_same_flags():
    rng = np.random.default_rng(4)
    recs = []
    mv = (0, 0)
    for _ in range(800):
        if rng.random() < 0.6:
            recs.append(mv)  # repeat -> encoder should use the flag
        else:
            mv = (int(rng.integers(-64, 65)), int(rng.integers(-64, 65)))
            recs.append(mv)
    blobs = _roundtrip(recs, MVCodec())
    total = sum(len(b) for b in blobs)
    # two 512-ary symbols would cost ~2.25B each; flags push far below
    assert total < 800 * 2


def test_empty_section():
    blobs = encode_section([], 1, TableSet(), RecCodec())
    assert blobs == [b""]
    out = decode_section(blobs, 0, 1, TableSet(), RecCodec())
    assert out == []


def test_rescale_bounds_hold():
    # hammer one context to force many rescales, check invariants
    t = Table(1, 256)
    rng = np.random.default_rng(5)
    for _ in range(200):
        syms = rng.integers(0, 4, 64)
        t.update_batch([(0, int(s)) for s in syms])
        assert t.cnt[0].sum() <= PROB_SCALE
        assert (t.cnt[0] >= 1).all()
        assert t.cntsum[0] == t.cnt[0].sum()


def test_mixed_backoff_invariants():
    # SPTC3 mixed kind: effective distribution must satisfy the rANS
    # contract (eff >= 1, sum(eff) <= PROB_SCALE) at every point of a
    # hammering schedule, including straight after renew and around both
    # row and global rescales.
    t = Table(4, 256, name="color")
    assert t.mix
    rng = np.random.default_rng(9)

    def check_all_rows():
        for r in range(t.rows):
            eff = t._eff(r)
            assert (eff >= 1).all()
            assert eff.sum() <= PROB_SCALE, (r, eff.sum())
            cu, fr = t.interval(r, 255)
            assert cu + fr <= PROB_SCALE

    check_all_rows()
    for i in range(300):
        row = int(rng.integers(0, 4))
        syms = rng.integers(0, 8 if i % 3 else 256, 32)
        t.update_batch([(row, int(s)) for s in syms])
        assert t.gsum == t.gcnt.sum()
        assert t.cntsum[row] == t.cnt[row].sum()
    check_all_rows()


def test_mixed_backoff_cold_context_is_cheap():
    # a context row never seen before should code a globally-common symbol
    # much cheaper than uniform (the whole point of the backoff)
    t = Table(8, 256, name="color")
    # warm the global through row 0 with symbol 42
    for _ in range(60):
        t.update_batch([(0, 42)] * 8)
    cu, fr = t.interval(5, 42)  # cold row 5
    import math

    bits = math.log2(PROB_SCALE / fr)
    assert bits < 2.0, bits  # uniform would cost ~8 bits
