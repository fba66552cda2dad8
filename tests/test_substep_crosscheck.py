"""Substep-schedule cross-check (VERDICT r4 #8).

The record-codec schedule — which table kind codes which sub-symbol on
which row, in what order — exists in three implementations: the normative
numpy spec (`spec/coder.py` RecordCodec classes), the shared JAX substep
description (`jx/substeps.py`, feeding both the lax.scan coder and the
Pallas kernels), and the native coder (`native/sptc.cpp`). This test walks
the spec and JAX schedules kind-by-kind over randomized records and
asserts identical (kind, row, symbol, active) traces on BOTH the encode
and decode directions, so a format change that edits one copy but not the
other fails here rather than as a downstream byte mismatch. (The native
copy is covered behaviorally: test_native asserts whole-stream
byte-equality against spec, which pins its schedule to the same bytes.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from screenpressor_tpu.config import MV_OFFSET, NUM_PTYPES, TABLE_KINDS
from screenpressor_tpu.jx.substeps import SUBSTEP_CODECS
from screenpressor_tpu.spec import coder as sc

SPEC_CODECS = {
    "rec": sc.RecCodec(),
    "col": sc.ColCodec(),
    "bt": sc.BTCodec(),
    "sxy": sc.SxyCodec(),
    "mv": sc.MVCodec(),
}


def _random_records(name, n, rng):
    if name == "rec":
        return [(int(rng.integers(0, NUM_PTYPES)), int(rng.integers(1, 256)))
                for _ in range(n)]
    if name == "col":
        return [tuple(int(v) for v in rng.integers(0, 256, 3))
                for _ in range(n)]
    if name == "bt":
        return [(int(rng.integers(0, 5)), int(rng.integers(1, 256)))
                for _ in range(n)]
    if name == "sxy":
        return [tuple(int(v) for v in rng.integers(0, 16, 4))
                for _ in range(n)]
    # mv: repeat values often so the same-as-previous flag takes both arms
    vals = [(-3, 2), (0, 0), (5, -7), (-3, 2)]
    return [vals[int(rng.integers(0, len(vals)))] for _ in range(n)]


def _jx_trace(name, records):
    """(kind, row, sym, active) per (record, substep) through jx/substeps."""
    codec = SUBSTEP_CODECS[name]
    z = jnp.zeros((1,), jnp.int32)
    state = codec.init_state(z)
    out = []
    for rec in records:
        rec_l = [jnp.asarray([v], jnp.int32) for v in rec]
        for j, kind in enumerate(codec.kinds):
            row, sym, extra = codec.enc_syms(j, rec_l, state)
            active = True if extra is None else bool(extra[0])
            out.append((kind, int(row[0]), int(sym[0]), active))
        state = codec.enc_next_state(rec_l, state, jnp.asarray([True]))
    return out


def _jx_dec_trace(name, records):
    """Decode-direction rows via dec_row, fed with the true symbols."""
    codec = SUBSTEP_CODECS[name]
    z = jnp.zeros((1,), jnp.int32)
    state = codec.init_state(z)
    out = []
    for rec in records:
        # the true sub-symbols this record encodes (from the enc schedule)
        rec_l = [jnp.asarray([v], jnp.int32) for v in rec]
        partial = []
        for j, kind in enumerate(codec.kinds):
            row, extra = codec.dec_row(j, partial, state)
            _, sym, enc_extra = codec.enc_syms(j, rec_l, state)
            active = True if extra is None else bool(extra[0])
            out.append((kind, int(row[0]), active))
            partial.append(jnp.where(jnp.asarray(active), sym, 0))
        rec_out, state = codec.dec_finish(
            partial, state, jnp.asarray([True])
        )
        for a, b in zip(rec_out, rec):
            assert int(a[0]) == b, (name, rec)
    return out


def _spec_trace(name, records):
    codec = SPEC_CODECS[name]
    state = codec.init_state()
    out = []
    for rec in records:
        for j in range(codec.n_substeps):
            ks = codec.enc_symbol(j, rec, state)
            if ks is None:
                out.append((None, None, None, False))
            else:
                out.append((ks[0], ks[1], ks[2], True))
        state = codec.enc_next_state(rec, state)
    return out


def _spec_dec_trace(name, records):
    codec = SPEC_CODECS[name]
    state = codec.init_state()
    out = []
    for rec in records:
        partial = []
        for j in range(codec.n_substeps):
            ks = codec.enc_symbol(j, rec, state)
            ctx = codec.dec_context(j, partial, state)
            if ctx is None:
                assert ks is None, (name, rec, j)
                out.append((None, None, False))
                partial.append(None)
            else:
                out.append((ctx[0], ctx[1], True))
                partial.append(ks[2])
        rec_out, state = codec.dec_record(partial, state)
        assert tuple(np.ravel(rec_out)) == tuple(np.ravel(rec)), (name, rec)
    return out


@pytest.mark.parametrize("name", sorted(SPEC_CODECS))
def test_encode_schedules_match(name):
    rng = np.random.default_rng(hash(name) % 2**32)
    records = _random_records(name, 40, rng)
    spec = _spec_trace(name, records)
    jx = _jx_trace(name, records)
    assert len(spec) == len(jx)
    for s, j in zip(spec, jx):
        if not s[3]:  # spec skip == jx inactive substep
            assert not j[3], (name, s, j)
            continue
        assert j[3], (name, s, j)
        assert (s[0], s[1], s[2]) == (j[0], j[1], j[2]), (name, s, j)


@pytest.mark.parametrize("name", sorted(SPEC_CODECS))
def test_decode_schedules_match(name):
    rng = np.random.default_rng(hash(name) % 2**32 + 1)
    records = _random_records(name, 40, rng)
    spec = _spec_dec_trace(name, records)
    jx = _jx_dec_trace(name, records)
    assert len(spec) == len(jx)
    for s, j in zip(spec, jx):
        if not s[2]:
            assert not j[2], (name, s, j)
            continue
        assert j[2], (name, s, j)
        assert (s[0], s[1]) == (j[0], j[1]), (name, s, j)


def test_substep_kinds_cover_table_kinds():
    """Every TABLE_KINDS entry is driven by some codec substep, and every
    substep kind exists in TABLE_KINDS — a renamed/added kind must update
    both tables and schedules together."""
    used = set()
    for name, codec in SUBSTEP_CODECS.items():
        for kd in codec.kinds:
            used.add(kd)
    assert used == set(TABLE_KINDS), (used, set(TABLE_KINDS))


def test_colw_matches_col_schedule():
    """The compact color variant must code the same (symbol, active)
    stream as Col; its rows are the remapped form of Col's rows (verified
    end-to-end by test_colw byte-identity — here we pin symbol order)."""
    rng = np.random.default_rng(7)
    records = _random_records("col", 20, rng)
    col = SUBSTEP_CODECS["col"]
    colw = SUBSTEP_CODECS["colw256"]
    state = col.init_state(jnp.zeros((1,), jnp.int32))
    for rec in records:
        rec_l = [jnp.asarray([v], jnp.int32) for v in rec]
        # colw records carry (rgb, rows); rows content is irrelevant here
        recw_l = rec_l + [jnp.zeros((1,), jnp.int32)] * 3
        for j in range(3):
            _, sym_c, ex_c = col.enc_syms(j, rec_l, state)
            _, sym_w, ex_w = colw.enc_syms(j, recw_l, ())
            assert ex_c is None and ex_w is None
            assert int(sym_c[0]) == int(sym_w[0])
        state = col.enc_next_state(rec_l, state, jnp.asarray([True]))
