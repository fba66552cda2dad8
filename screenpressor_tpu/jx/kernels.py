"""Pallas TPU kernels for the BSAC section coder.

One kernel invocation runs a whole section (T steps x sub-steps) with every
piece of state resident in VMEM: lane rANS states, lane payload bytes, and
the adaptive tables. This removes the per-substep XLA op launches and HBM
round-trips that dominate the lax.scan implementation in jx/coder.py
(measured 45-55 ms per 1080p section scan in round 1).

Mosaic has no dynamic vector gather/scatter, so data-dependent table access
is built from lane-column masks:

- small tables (R <= 16: ptype/nrun/bt/btn/sxy/mvflag/mv): gather/scatter as
  R masked row broadcasts/reductions on the VPU (exact, no MXU);
- the color table (R = 768): exact one-hot matmuls on the MXU with
  precision=HIGHEST (TPU matmuls default to bf16 operands; table values up
  to PROB_SCALE are not bf16-exact);
- exclusive prefix over the alphabet: one [K,A] @ [A,A] strictly-lower-
  triangular matmul (HIGHEST);
- payload byte fetch at per-lane positions: a per-step 256-byte window per
  lane (block-mask refill), then a one-hot select per byte.

Every per-lane vector is kept in COLUMN form [K, 1] — sublane-major — so the
substep loop contains no lane<->sublane transposes. (Also note: narrow
column slices like `ref[:, 2:3]` miscompile on this Mosaic version — always
select columns with an iota mask + reduce.)

Table semantics are EXACTLY spec/tables.py (SPTC2 live counts, scale-to-fill
rescale with integer `(target << 13) // cntsum`); streams are byte-identical
to the spec/jx/native implementations (tests/test_kernels.py).

Reference analog: the serial decode loops of `DecompressI/P`
(`screencap.cpp:414-498,1275-1432`) and the pipelined encode of `ransmt.h`,
re-expressed as K parallel lanes stepping in lockstep on the VPU/MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from screenpressor_tpu.config import (
    COLOR_CTX_BITS_B,
    COLOR_CTX_ROWS,
    COLOR_CTX_SHIFT,
    COLOR_CTX_SHIFT_A,
    MV_OFFSET,
    PROB_BITS,
    PROB_SCALE,
    RANS_L,
    MIX_ESC_C,
    RESCALE_SHIFT,
    TABLE_KINDS,
    kind_gstep,
    kind_mixed,
    kind_step,
)

MASK = PROB_SCALE - 1
X_MAX_SHIFT = 23 - PROB_BITS + 8
PAYBLK = 128  # payload refill block granularity
SMALL_R = 16  # tables with R <= SMALL_R use VPU row broadcasts, not the MXU

U32 = jnp.uint32
F32 = jnp.float32
I32 = jnp.int32
HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Record codecs: the shared substep description (jx/substeps.py) on [K, 1]
# lane columns. One schedule serves both this kernel layer and the lax.scan
# coder — a format change edits substeps.py only.
# ---------------------------------------------------------------------------

from screenpressor_tpu.jx.substeps import SUBSTEP_CODECS as KCODECS


def _unique_kinds(codec):
    seen = []
    for kd in codec.kinds:
        if kd not in seen:
            seen.append(kd)
    return tuple(seen)


def _table_names(kinds):
    """Kernel table-ref names for these kinds: the per-context tables plus
    one 'g:<kind>' global row per mixed kind (SPTC3 backoff)."""
    return tuple(kinds) + tuple("g:" + kd for kd in kinds if kind_mixed(kd))


def _table_input(tables, name):
    """Build the [R, A] / [8, A] f32 kernel input for a table-ref name."""
    if name.startswith("g:"):
        gcnt = tables[name[2:]]["gcnt"]
        return jnp.zeros((8, gcnt.shape[0]), F32).at[0].set(gcnt.astype(F32))
    return tables[name]["cnt"].astype(F32)


def _tables_output(tables, names, outs):
    """Fold the kernel's updated table arrays back into the pytree."""
    tables = dict(tables)
    for name, cnew in zip(names, outs):
        if name.startswith("g:"):
            kd = name[2:]
            gcnt = cnew[0].astype(jnp.int32)
            tables[kd] = dict(tables[kd])
            tables[kd]["gcnt"] = gcnt
            tables[kd]["gsum"] = gcnt.sum()
        else:
            cnt = cnew.astype(jnp.int32)
            tables[name] = dict(tables.get(name, {}))
            tables[name]["cnt"] = cnt
            tables[name]["cntsum"] = cnt.sum(axis=1)
    return tables


# ---------------------------------------------------------------------------
# Kernel-side primitives (column-vector conventions: lanes along sublanes)
# ---------------------------------------------------------------------------


def _prefix_matrix(a):
    """[A, A] f32 strictly-lower-triangular ones (built in-kernel)."""
    r = jax.lax.broadcasted_iota(I32, (a, a), 0)
    c = jax.lax.broadcasted_iota(I32, (a, a), 1)
    return (r < c).astype(F32)


def _split_hi_lo(v):
    """f32 integer matrix -> (hi, lo) with v = 256*hi + lo, both bf16-exact
    (hi <= PROB_SCALE/256 + overshoot < 1024... values here are < 2^17, so
    hi < 512 and lo < 256 — integers <= 256 are bf16-exact; hi values up to
    512 are also exact since 512 = 2^9 with 8-bit mantissa covers multiples
    at that scale only for <= 512... to stay safe hi uses a 128 divisor)."""
    hi = jnp.floor(v * (1.0 / 128.0))
    lo = v - hi * 128.0
    return hi, lo


def _exact_dot(a, b):
    """Exact integer-valued f32 matmul via hi/lo split (2 default-precision
    bf16 matmuls instead of one 6-pass HIGHEST matmul; the split operand
    halves are bf16-exact: lo < 128, hi < 2048 -> needs one more split level
    when values exceed 2^15; BSAC values stay < PROB_SCALE + K*STEP < 2^18,
    so hi < 2^11 which is NOT bf16-exact... use a 3-way split)."""
    # 3-way split into 7-bit planes: v = h2*2^14 + h1*2^7 + h0, each < 128
    h1 = jnp.floor(a * (1.0 / 128.0))
    h0 = a - h1 * 128.0
    h2 = jnp.floor(h1 * (1.0 / 128.0))
    h1 = h1 - h2 * 128.0
    d0 = jnp.dot(h0, b, preferred_element_type=F32)
    d1 = jnp.dot(h1, b, preferred_element_type=F32)
    d2 = jnp.dot(h2, b, preferred_element_type=F32)
    return d0 + d1 * 128.0 + d2 * (128.0 * 128.0)


def _prefix_exclusive(g, pm):
    """[K, A] f32 -> exclusive prefix along axis 1 via triangular matmuls."""
    return _exact_dot(g, pm)


def _gather_small(cnt_ref, rowc, r, base=0):
    """[K,1] local rows from a table window via masked row broadcasts."""
    g = None
    for ri in range(r):
        m = (rowc == ri).astype(F32)  # [K, 1]
        term = m * cnt_ref[base + ri, :][None, :]
        g = term if g is None else g + term
    return g  # [K, A]


def _gather_mxu(cnt_ref, oh, base, window):
    """[K, W] one-hot @ [W, A] table window (exact: split the TABLE side
    into 7-bit planes — table values < PROB_SCALE so a 2-level split
    suffices — and run bf16 matmuls with f32 accumulation: 0/1 one-hots and
    7-bit planes are both bf16-exact, and bf16 operands halve the VMEM
    transients, which matters at the SPTC3 color-table size [3*1024, 256];
    the per-substep static plane window cuts them 3x further)."""
    tab = cnt_ref[pl.ds(base, window), :]
    h1 = jnp.floor(tab * (1.0 / 128.0))
    h0 = tab - h1 * 128.0
    d0 = jnp.dot(oh, h0, preferred_element_type=F32)
    d1 = jnp.dot(oh, h1, preferred_element_type=F32)
    return d0 + d1 * 128.0


def _select_col(mat, sym_col):
    """mat [K, A], sym [K, 1] -> [K, 1] f32 values mat[k, sym[k]]."""
    k, a = mat.shape
    oh = (sym_col == jax.lax.broadcasted_iota(I32, (k, a), 1)).astype(F32)
    return jnp.sum(mat * oh, axis=1, keepdims=True)


def _update_deltas(g, rowc, sym_col, active, step, a, eq, first_mask):
    """Common SPTC2 batched-update math on gathered rows.

    Returns (delta [K, A] f32, masked by first-lane-per-row)."""
    k = g.shape[0]
    actf = active.astype(F32)  # [K, 1]
    oh_sym = (
        sym_col == jax.lax.broadcasted_iota(I32, (k, a), 1)
    ).astype(F32) * actf  # [K, A]
    # h[k, a] = step * sum_j eq[k, j] * oh_sym[j, a]  (eq columns pre-masked)
    h = jnp.dot(eq, oh_sym * float(step), preferred_element_type=F32)  # [K, A]
    post = g + h
    postsum = jnp.sum(post, axis=1, keepdims=True).astype(I32)  # [K, 1]
    touched = jnp.sum(eq, axis=1, keepdims=True) > 0.0
    need = (postsum > PROB_SCALE - step) & touched
    target = PROB_SCALE - step - a
    sc = (
        jnp.full_like(postsum, target << RESCALE_SHIFT).astype(U32)
        // jnp.maximum(postsum, 1).astype(U32)
    ).astype(I32)
    post_i = post.astype(I32)
    newc = jnp.maximum((post_i * sc) >> RESCALE_SHIFT, 1)
    final = jnp.where(need, newc, post_i)
    delta = (final - g.astype(I32)).astype(F32)
    return delta * first_mask


def _row_masks(rowc, active, k):
    """eq (active-masked row-sharing matrix) + first-lane mask, both f32.

    eq[k, j] = (row_k == row_j) & active_j; first_mask[k] = 1 iff k is the
    lowest lane index sharing row_k (over ALL lanes, active or not, so every
    writer of a row computes identical values)."""
    # rowc [K,1] vs rowT [1,K]: one int32 transpose per substep
    rowT = jnp.transpose(rowc)  # [1, K]
    eq_b = rowc == rowT  # [K, K]
    lanes = jax.lax.broadcasted_iota(I32, (k, k), 1)
    first = jnp.min(jnp.where(eq_b, lanes, k), axis=1, keepdims=True)
    first_mask = (first == jax.lax.broadcasted_iota(I32, (k, 1), 0)).astype(F32)
    eq = eq_b.astype(F32) * jnp.transpose(active.astype(F32))  # mask columns
    return eq, first_mask


def _scatter_small(cnt_ref, rowc, delta, r, base=0):
    """Scatter-add masked deltas into a table window: masked reductions."""
    for ri in range(r):
        m = (rowc == ri).astype(F32)  # [K, 1]
        cnt_ref[base + ri, :] = cnt_ref[base + ri, :] + jnp.sum(m * delta, axis=0)


def _scatter_mxu(cnt_ref, oh, delta, base, window):
    """cnt += onehot^T @ delta (exact via signed 7-bit-plane split of delta:
    delta in (-2^18, 2^18); split on delta + bias to keep planes positive;
    bf16 operands — 0/1 one-hots and 7-bit planes are bf16-exact)."""
    bias = float(1 << 18)
    d = delta + bias  # in [0, 2^19)
    h1 = jnp.floor(d * (1.0 / 128.0))
    h0 = d - h1 * 128.0
    h2 = jnp.floor(h1 * (1.0 / 128.0))
    h1 = h1 - h2 * 128.0
    dims = (((0,), (0,)), ((), ()))
    d0 = jax.lax.dot_general(oh, h0, dims, preferred_element_type=F32)
    d1 = jax.lax.dot_general(oh, h1, dims, preferred_element_type=F32)
    d2 = jax.lax.dot_general(oh, h2, dims, preferred_element_type=F32)
    # combine the planes in int32 (d2 * 2^14 exceeds f32's exact-int range)
    dT = d0.astype(I32) + (d1.astype(I32) << 7) + (d2.astype(I32) << 14)
    # remove the bias contribution: bias * (lanes mapping to each row)
    colsum = jnp.sum(oh, axis=0)[:, None].astype(I32)  # [W, 1]
    upd = dT - colsum * int(bias)
    cnt_ref[pl.ds(base, window), :] = (
        cnt_ref[pl.ds(base, window), :] + upd.astype(F32)
    )


class _ByteWindow:
    """Per-lane 256-byte payload window, refilled once per step."""

    def __init__(self, pay_ref, k, l):
        self.pay_ref = pay_ref  # [K, L] int32, L multiple of PAYBLK
        self.k = k
        self.l = l
        self.nblk = l // PAYBLK

    def refill(self, pos_col):
        """base = pos & ~(PAYBLK-1); win[k, :] = payload[k, base : base+256]."""
        base = pos_col & ~(PAYBLK - 1)
        blk = base >> 7  # [K, 1]
        pay3 = self.pay_ref[:, :].reshape(self.k, self.nblk, PAYBLK)
        bidx = jax.lax.broadcasted_iota(I32, (self.k, self.nblk), 1)
        oh0 = (bidx == blk).astype(I32)
        oh1 = (bidx == jnp.minimum(blk + 1, self.nblk - 1)).astype(I32)
        w0 = jnp.sum(pay3 * oh0[:, :, None], axis=1)  # [K, 128]
        w1 = jnp.sum(pay3 * oh1[:, :, None], axis=1)
        return base, jnp.concatenate([w0, w1], axis=1)  # [K, 256]

    @staticmethod
    def fetch(win, base, pos_col):
        off = pos_col - base  # [K, 1]
        k = win.shape[0]
        oh = (off == jax.lax.broadcasted_iota(I32, (k, 2 * PAYBLK), 1)).astype(I32)
        return jnp.sum(win * oh, axis=1, keepdims=True)  # [K, 1]


def _substep_tables(cnts, kd, rowc, active, k, base=0):
    """Gather + (deferred) update closure for one substep's table access.

    `base`: static row offset of this substep's table window (the color
    chain addresses exactly one plane per substep). `rowc` is the GLOBAL
    row; the window's local row is rowc - base.

    Returns (g_code, update): g_code is the effective coding distribution
    (raw live counts, plus the scaled global row for mixed kinds —
    spec.tables.Table._eff); update applies the batched count update to the
    row table and, for mixed kinds, the global row."""
    r, a = TABLE_KINDS[kd]
    # per-substep table window: the color chain addresses one plane per
    # substep (COLOR_CTX_ROWS rows), and a COMPACT color table (colw
    # sections — fewer resident rows than the full table) bounds it further
    window = COLOR_CTX_ROWS if kd == "color" else r
    window = min(window, cnts[kd].shape[0])
    rowc = jnp.clip(rowc - base, 0, window - 1)  # local window row
    small = window <= SMALL_R
    if small:
        g = _gather_small(cnts[kd], rowc, window, base)
        oh = None
    else:
        oh = (
            rowc == jax.lax.broadcasted_iota(I32, (k, window), 1)
        ).astype(F32)  # [K, W]
        g = _gather_mxu(cnts[kd], oh, base, window)

    gname = "g:" + kd
    if gname in cnts:
        # escalating backoff (config.MIX_ESC_C): the row's counts scale to
        # a fill target growing with its observation mass; the global row
        # scales into the remaining space. Integer math matches
        # spec.tables.Table._eff exactly (products bounded by target << 13
        # < 2^27, int32-safe).
        gref = cnts[gname]  # [8, A] f32 (row 0 live)
        rmask = (
            jax.lax.broadcasted_iota(I32, (8, a), 0) == 0
        ).astype(F32)
        gvec = jnp.sum(gref[:, :] * rmask, axis=0, keepdims=True)  # [1, A]
        gvec_i = gvec.astype(I32)
        gsum = jnp.sum(gvec_i, axis=1, keepdims=True)  # [1, 1]
        s_obs = jnp.sum(g, axis=1, keepdims=True).astype(I32)  # [K, 1]
        target = ((PROB_SCALE - 2 * a) * s_obs) // (s_obs + MIX_ESC_C)
        sc_r = (target << 13) // jnp.maximum(s_obs, 1)  # [K, 1]
        row_eff = (g.astype(I32) * sc_r) >> 13  # [K, A]
        spare = (PROB_SCALE - a) - jnp.sum(row_eff, axis=1, keepdims=True)
        sc = (spare << 13) // jnp.maximum(gsum, 1)  # [K, 1] (broadcast gsum)
        g_eff = jnp.maximum((gvec_i * sc) >> 13, 1)  # [K, A] int32
        g_code = (row_eff + g_eff).astype(F32)
    else:
        g_code = g

    def update(sym_col):
        eq, first_mask = _row_masks(rowc, active, k)
        delta = _update_deltas(
            g, rowc, sym_col, active, kind_step(kd), a, eq, first_mask
        )
        if small:
            _scatter_small(cnts[kd], rowc, delta, window, base)
        else:
            _scatter_mxu(cnts[kd], oh, delta, base, window)
        if gname in cnts:
            gstep = kind_gstep(kd)
            actf = active.astype(F32)  # [K, 1]
            oh_sym = (
                sym_col == jax.lax.broadcasted_iota(I32, (k, a), 1)
            ).astype(F32) * actf  # [K, A]
            add = jnp.sum(oh_sym, axis=0, keepdims=True) * float(gstep)
            gnew = gvec_i + add.astype(I32)  # [1, A]
            n_act = jnp.sum(active.astype(I32), axis=0, keepdims=True)  # [1,1]
            gsum_new = gsum + n_act * gstep
            gneed = gsum_new > PROB_SCALE - gstep
            gtarget = PROB_SCALE - gstep - a
            gsc = (gtarget << 13) // jnp.maximum(gsum_new, 1)  # [1, 1]
            gresc = jnp.maximum((gnew * gsc) >> 13, 1)
            gfin = jnp.where(gneed, gresc, gnew).astype(F32)  # [1, A]
            gref[:, :] = gfin * rmask

    return g_code, update


# ---------------------------------------------------------------------------
# Section decode kernel
# ---------------------------------------------------------------------------


def _emit_decode_section(codec_name: str, k: int, l: int, t_steps: int,
                         pay_ref, lens_ref, out_ref, cnts, prefix_m):
    """Emit one section's decode loop into the surrounding kernel. `cnts`
    are the live table refs — sections emitted in sequence chain table
    state exactly like separate kernel launches do."""
    codec = KCODECS[codec_name]
    w = codec.rec_width
    if True:
        bw = _ByteWindow(pay_ref, k, l)

        # rANS init: 4 LE bytes per lane (iota-select columns; narrow column
        # slices miscompile)
        p8 = pay_ref[:, 0:8]
        cidx = jax.lax.broadcasted_iota(I32, (k, 8), 1)
        xi = jnp.zeros((k, 1), I32)
        for i in range(4):
            col = jnp.sum(p8 * (cidx == i), axis=1, keepdims=True)
            xi = xi | (col << (8 * i))
        x = pltpu.bitcast(xi, U32)  # [K, 1]
        pos = jnp.full((k, 1), 4, I32)
        state = codec.init_state(jnp.zeros((k, 1), I32))
        lens = lens_ref[:, :]  # [K, 1]
        stage0 = tuple(jnp.zeros((k, PAYBLK), I32) for _ in range(w))

        def step(t, carry):
            x, pos, state, stage = carry
            lane_active = t < lens  # [K, 1]
            base, win = bw.refill(pos)
            partial = []
            for j, kd in enumerate(codec.kinds):
                a = TABLE_KINDS[kd][1]
                row, extra = codec.dec_row(j, partial, state)
                active = lane_active if extra is None else (lane_active & extra)
                tab_base = codec.sub_base(j) if hasattr(codec, "sub_base") else 0
                g, update = _substep_tables(cnts, kd, row, active, k, tab_base)
                cum = _prefix_exclusive(g, prefix_m[a])
                sf = (x & MASK).astype(I32).astype(F32)  # [K, 1]
                ge = (cum <= sf).astype(I32)
                sym_col = jnp.sum(ge, axis=1, keepdims=True) - 1  # [K, 1]
                cum_c = _select_col(cum, sym_col).astype(I32)
                freq_c = _select_col(g, sym_col).astype(I32)
                xx = (
                    freq_c.astype(U32) * (x >> PROB_BITS)
                    + (x & MASK)
                    - cum_c.astype(U32)
                )
                for _ in range(2):
                    need = (xx < RANS_L) & active
                    byte = _ByteWindow.fetch(win, base, pos)
                    xx = jnp.where(need, (xx << 8) | byte.astype(U32), xx)
                    pos = jnp.where(need, pos + 1, pos)
                x = jnp.where(active, xx, x)
                sym_col = jnp.where(active, sym_col, 0)
                partial.append(sym_col)
                update(sym_col)
            rec, state = codec.dec_finish(partial, state, lane_active)
            # stage records; flush aligned 128-column blocks (Mosaic requires
            # dynamic minor-dim store offsets to be 128-multiples)
            tmod = t % PAYBLK
            cmask = jax.lax.broadcasted_iota(I32, (k, PAYBLK), 1) == tmod
            stage = tuple(
                jnp.where(cmask, rec[wi], stage[wi]) for wi in range(w)
            )

            @pl.when(tmod == PAYBLK - 1)
            def _():
                tb = pl.multiple_of(t - (PAYBLK - 1), PAYBLK)
                for wi in range(w):
                    out_ref[wi, :, pl.ds(tb, PAYBLK)] = stage[wi]

            return x, pos, state, stage

        x, pos, state, stage = jax.lax.fori_loop(
            0, t_steps, step, (x, pos, state, stage0)
        )
        if t_steps % PAYBLK != 0:
            tb = (t_steps // PAYBLK) * PAYBLK
            for wi in range(w):
                out_ref[wi, :, pl.ds(tb, PAYBLK)] = stage[wi]


def _build_decode_kernel(codec_name: str, k: int, l: int, t_steps: int):
    codec = KCODECS[codec_name]
    kinds = _unique_kinds(codec)
    names = _table_names(kinds)
    w = codec.rec_width
    pms = {kd: TABLE_KINDS[kd][1] for kd in kinds}

    def kernel(pay_ref, lens_ref, *refs):
        # refs = (cnt_in..., out_rec, cnt_out...); cnt_in aliases cnt_out
        out_ref = refs[len(names)]
        cnts = dict(zip(names, refs[len(names) + 1 :]))
        for i, kd in enumerate(names):
            cnts[kd][:, :] = refs[i][:, :]
        prefix_m = {a: _prefix_matrix(a) for a in set(pms.values())}
        _emit_decode_section(
            codec_name, k, l, t_steps, pay_ref, lens_ref, out_ref, cnts,
            prefix_m,
        )

    return kernel, kinds, w


def _dec_geometry(codec_name: str, k: int, t_steps: int, l: int):
    codec = KCODECS[codec_name]
    kp = max(k, 8)
    lp = 2 * PAYBLK
    while lp < l:
        lp *= 2
    tp = -(-t_steps // PAYBLK) * PAYBLK
    return codec.rec_width, kp, lp, tp


def _dec_vmem_estimate(kts_l):
    """Rough VMEM bytes for a fused decode of these sections; kts_l entries
    are (codec_name, k, t_steps, l_payload)."""
    total = 1 * 1024 * 1024
    union = _union_kinds([cn for cn, _, _, _ in kts_l])
    r_max = 8
    for kd in union:
        r, a = TABLE_KINDS[kd]
        total += 4 * r * a
        window = COLOR_CTX_ROWS if kd == "color" else r
        if window > SMALL_R:
            r_max = max(r_max, window)
    for cn, k, t, l in kts_l:
        w, kp, lp, tp = _dec_geometry(cn, k, t, l)
        a_max = max(TABLE_KINDS[kd][1] for kd in _unique_kinds(KCODECS[cn]))
        total += 4 * kp * (lp + w * tp + 16 * PAYBLK + 6 * a_max)
        total += 4 * a_max * a_max
    kp_max = max(_dec_geometry(cn, k, t, l)[1] for cn, k, t, l in kts_l)
    a_big = max(TABLE_KINDS[kd][1] for kd in union)
    total += 2 * kp_max * r_max + 8 * r_max * a_big
    return total


def _build_decode_multi(sections):
    """Kernel decoding several sections back to back, chaining table state
    in VMEM. sections: tuple of (codec_name, kp, lp, t_steps)."""
    kinds = _union_kinds([s[0] for s in sections])
    names = _table_names(kinds)
    ns = len(sections)

    def kernel(*refs):
        # refs = (pay_0, lens_0, ..., cnt_in..., out_0..., cnt_out...)
        pos = 2 * ns
        cnt_in = refs[pos : pos + len(names)]
        pos += len(names)
        outs = refs[pos : pos + ns]
        pos += ns
        cnts = dict(zip(names, refs[pos : pos + len(names)]))
        for i, kd in enumerate(names):
            cnts[kd][:, :] = cnt_in[i][:, :]
        alphabets = {TABLE_KINDS[kd][1] for kd in kinds}
        prefix_m = {a: _prefix_matrix(a) for a in alphabets}
        for si, (cn, kp, lp, t) in enumerate(sections):
            _emit_decode_section(
                cn, kp, lp, t, refs[2 * si], refs[2 * si + 1], outs[si],
                cnts, prefix_m,
            )

    return kernel, kinds


def _decode_sections_pallas(pay_list, lens_list, tables, kts):
    """Decode the given sections in ONE pallas launch (tables chained in
    VMEM — identical to sequential decode_section_kernel calls)."""
    geos, ins = [], []
    for (cn, k, t), pay, lens in zip(kts, pay_list, lens_list):
        g = _dec_geometry(cn, k, t, pay.shape[1])
        geos.append(g)
        w, kp, lp, tp = g
        p = jnp.zeros((kp, lp), I32).at[:k, : pay.shape[1]].set(
            pay.astype(I32))
        l2 = jnp.zeros((kp, 1), I32).at[:k, 0].set(lens.astype(I32))
        ins.extend([p, l2])
    sections = tuple(
        (cn, g[1], g[2], t) for (cn, k, t), g in zip(kts, geos)
    )
    kernel, kinds = _build_decode_multi(sections)
    names = _table_names(kinds)
    cnt_f32 = [_table_input(tables, nm) for nm in names]
    out_shapes = [
        jax.ShapeDtypeStruct((g[0], g[1], g[3]), I32) for g in geos
    ] + [jax.ShapeDtypeStruct(c.shape, F32) for c in cnt_f32]
    n_in = 2 * len(kts)
    aliases = {n_in + i: len(kts) + i for i in range(len(names))}
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (n_in + len(names)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (len(kts) + len(names)),
        input_output_aliases=aliases,
        interpret=jax.default_backend() == "cpu",
    )(*ins, *cnt_f32)
    recs = [
        jnp.transpose(out, (2, 1, 0))[:t, :k, :]
        for (cn, k, t), out in zip(kts, outs[: len(kts)])
    ]
    tables = _tables_output(tables, names, outs[len(kts) :])
    return recs, tables


# fused-decode VMEM budget: decode keeps the FULL color table resident
# (rows are data-dependent), so groups containing a col section sit near
# the kernel_jit 32 MB scoped cap already; 30 MB leaves headroom for the
# estimate's error while still fusing the small sections together
_DEC_FUSE_VMEM_LIMIT = 30 * 1024 * 1024


def decode_sections_fused(pay_list, lens_list, tables, kts):
    """Decode several sections with as few kernel launches as possible
    (~1-3 ms fixed cost per launch on device); greedy grouping under the
    VMEM budget, per-section kernel (which itself falls back to the scan
    coder when oversized) for groups of one. Bytes and table chaining are
    identical to sequential decode_section_auto calls."""
    from screenpressor_tpu.jx import coder as jc

    recs = []
    i = 0
    while i < len(kts):
        j = i + 1
        while j <= len(kts):
            group = [
                (cn, k, t, pay.shape[1])
                for (cn, k, t), pay in zip(kts[i:j], pay_list[i:j])
            ]
            if _dec_vmem_estimate(group) > _DEC_FUSE_VMEM_LIMIT:
                break
            j += 1
        j = max(j - 1, i + 1)
        single = [(kts[i][0], kts[i][1], kts[i][2], pay_list[i].shape[1])]
        if j == i + 1 and _dec_vmem_estimate(single) > _DEC_FUSE_VMEM_LIMIT:
            cn, k, t = kts[i]
            r, tables = jc.decode_section_auto(
                pay_list[i], lens_list[i], tables, cn, k, t, batched=False
            )
            recs.append(r)
            i = j
            continue
        r, tables = _decode_sections_pallas(
            pay_list[i:j], lens_list[i:j], tables, tuple(kts[i:j])
        )
        recs.extend(r)
        i = j
    return recs, tables


@functools.lru_cache(maxsize=None)
def _decode_call(codec_name: str, kp: int, lp: int, t_steps: int,
                 cnt_shapes: tuple, interpret: bool):
    """Pallas launcher for one section-decode geometry, with a custom vmap
    rule: the unbatched form maps everything into VMEM directly (one
    stream's state fits); the batched form (BatchedDecoder's S-stream vmap)
    grids over the batch so per-step VMEM stays single-stream-sized —
    without this rule XLA pins the whole batch in VMEM and a 64-stream
    360p decode OOMs scoped VMEM (measured round 3: 19.7M vs the 16M cap)."""
    import jax.custom_batching

    kernel, _, w = _build_decode_kernel(codec_name, kp, lp, t_steps)
    tp = -(-t_steps // PAYBLK) * PAYBLK
    n_tab = len(cnt_shapes)
    n_in = 2  # pay, lens
    aliases = {n_in + i: 1 + i for i in range(n_tab)}

    @jax.custom_batching.custom_vmap
    def call(pay, lens2, *cnt_f32):
        out_shapes = [jax.ShapeDtypeStruct((w, kp, tp), I32)] + [
            jax.ShapeDtypeStruct(s, F32) for s in cnt_shapes
        ]
        return tuple(pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_in + n_tab),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_tab),
            input_output_aliases=aliases,
            interpret=interpret,
        )(pay, lens2, *cnt_f32))

    def _bspec(shape):
        # leading None: the batch dim is squeezed out of the kernel block,
        # so the single-stream kernel body serves the batched launch too
        return pl.BlockSpec((None,) + shape, lambda i: (i,) + (0,) * len(shape))

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for b, a in zip(in_batched, args)
        )
        out_shapes = [jax.ShapeDtypeStruct((axis_size, w, kp, tp), I32)] + [
            jax.ShapeDtypeStruct((axis_size,) + s, F32) for s in cnt_shapes
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(axis_size,),
            out_shape=out_shapes,
            in_specs=[_bspec((kp, lp)), _bspec((kp, 1))]
            + [_bspec(s) for s in cnt_shapes],
            out_specs=[_bspec((w, kp, tp))] + [_bspec(s) for s in cnt_shapes],
            input_output_aliases=aliases,
            interpret=interpret,
        )(*args)
        return tuple(outs), (True,) * (1 + n_tab)

    return call


@functools.partial(jax.jit, static_argnames=("codec_name", "k", "t_steps"))
def decode_section_kernel(payload, lens, tables, codec_name: str, k: int,
                          t_steps: int):
    """Drop-in replacement for jx.coder.decode_section_scan (same contract:
    payload [K, L] uint8, lens [K] -> records [T, K, W] int32, tables')."""
    codec = KCODECS[codec_name]
    kinds = _unique_kinds(codec)

    kp = max(k, 8)  # lane padding for tiny sections (padded lanes never active)
    l = payload.shape[1]
    lp = 2 * PAYBLK  # pow2 bucketing bounds the Mosaic compile variants
    while lp < l:
        lp *= 2
    pay = jnp.zeros((kp, lp), I32).at[:k, :l].set(payload.astype(I32))
    lens2 = jnp.zeros((kp, 1), I32).at[:k, 0].set(lens.astype(I32))
    names = _table_names(kinds)
    cnt_f32 = [_table_input(tables, nm) for nm in names]

    call = _decode_call(
        codec_name, kp, lp, t_steps,
        tuple(c.shape for c in cnt_f32),
        jax.default_backend() == "cpu",
    )
    outs = call(pay, lens2, *cnt_f32)
    recs = jnp.transpose(outs[0], (2, 1, 0))[:t_steps, :k, :]  # [T, K, W]
    tables = _tables_output(tables, names, outs[1:])
    return recs, tables


# ---------------------------------------------------------------------------
# Fused section encode kernel (forward model pass + reverse rANS pack)
# ---------------------------------------------------------------------------


def _emit_encode_section(codec_name: str, k: int, t_steps: int, cap: int,
                         recs_ref, lens_ref, buf_ref, start_ref, iv_ref,
                         cnts, prefix_m):
    """Emit one section's encode (forward model pass + reverse rANS pack)
    into the surrounding kernel. `cnts` are the live table refs — sections
    emitted in sequence chain table state exactly like separate kernel
    launches do."""
    codec = KCODECS[codec_name]
    s_sub = len(codec.kinds)
    ts = t_steps * s_sub
    w = codec.rec_width
    ncapb = cap // PAYBLK
    if True:
        lens = lens_ref[:, :]  # [K, 1]

        # ---- phase 1: forward model pass ----
        state0 = codec.init_state(jnp.zeros((k, 1), I32))
        rstage0 = tuple(jnp.zeros((k, PAYBLK), I32) for _ in range(w))
        istage0 = jnp.zeros((k, PAYBLK), I32)

        def fwd(t, carry):
            state, rstage, istage = carry
            lane_active = t < lens
            # refill the record stage every 128 steps (aligned loads)
            @pl.when(t % PAYBLK == 0)
            def _():
                pass  # loads below handle staging via value-carry

            tmod = t % PAYBLK
            rstage = jax.lax.cond(
                tmod == 0,
                lambda rs: tuple(
                    recs_ref[wi, :, pl.ds(pl.multiple_of(t, PAYBLK), PAYBLK)]
                    for wi in range(w)
                ),
                lambda rs: rs,
                rstage,
            )
            cmask = jax.lax.broadcasted_iota(I32, (k, PAYBLK), 1) == tmod
            rec = [
                jnp.sum(jnp.where(cmask, rstage[wi], 0), axis=1, keepdims=True)
                for wi in range(w)
            ]
            for j, kd in enumerate(codec.kinds):
                a = TABLE_KINDS[kd][1]
                row, sym, extra = codec.enc_syms(j, rec, state)
                active = lane_active if extra is None else (lane_active & extra)
                symc = jnp.clip(sym, 0, a - 1)
                tab_base = codec.sub_base(j) if hasattr(codec, "sub_base") else 0
                g, update = _substep_tables(cnts, kd, row, active, k, tab_base)
                cum = _prefix_exclusive(g, prefix_m[a])
                cum_c = _select_col(cum, symc).astype(I32)
                freq_c = _select_col(g, symc).astype(I32)
                symm = jnp.where(active, symc, 0)
                update(symm)
                # stage packed (cum | freq<<14 | act<<29) at s = t*S + j
                s = t * s_sub + j
                smod = s % PAYBLK
                simask = jax.lax.broadcasted_iota(I32, (k, PAYBLK), 1) == smod
                packed = cum_c | (freq_c << 14) | (active.astype(I32) << 29)
                istage = jnp.where(simask, packed, istage)

                @pl.when(smod == PAYBLK - 1)
                def _(istage=istage, s=s):
                    sb = pl.multiple_of(s - (PAYBLK - 1), PAYBLK)
                    iv_ref[:, pl.ds(sb, PAYBLK)] = istage

            state = codec.enc_next_state(rec, state, lane_active)
            return state, rstage, istage

        state, rstage, istage = jax.lax.fori_loop(
            0, t_steps, fwd, (state0, rstage0, istage0)
        )
        if ts % PAYBLK != 0:
            sb = (ts // PAYBLK) * PAYBLK
            iv_ref[:, pl.ds(sb, PAYBLK)] = istage

        # ---- phase 2: reverse rANS pack ----
        buf_ref[:, :] = jnp.zeros((k, cap), I32)
        x = jnp.full((k, 1), RANS_L, U32)
        pos = jnp.full((k, 1), cap, I32)
        wstage0 = jnp.zeros((k, 2 * PAYBLK), I32)  # byte window [wbase, +256)

        def emit(wstage, wbase, pos, byte, do):
            p = jnp.where(do, pos - 1, pos)
            off = p - wbase  # in [0, 256) by refill invariant
            offm = jax.lax.broadcasted_iota(I32, (k, 2 * PAYBLK), 1) == off
            wstage = jnp.where(
                offm & do, byte, wstage
            )
            return wstage, p

        def flush_low(wstage, wbase, need):
            """Slide windows down 128 bytes for lanes that `need` it: write
            the window's upper half into buf_ref and shift."""
            blk = (wbase >> 7) + 1  # upper-half block index
            bidx = jax.lax.broadcasted_iota(I32, (k, ncapb), 1)
            ohb = ((bidx == blk) & need).astype(I32)
            upper = jnp.where(
                jax.lax.broadcasted_iota(I32, (k, 2 * PAYBLK), 1) >= PAYBLK,
                wstage, 0,
            )
            # align upper half to [0,128): roll left by 128
            upper128 = pltpu.roll(upper, PAYBLK, 1)[:, :PAYBLK]
            add = (ohb[:, :, None] * upper128[:, None, :]).reshape(k, cap)
            buf_ref[:, :] = buf_ref[:, :] + add
            # shift window contents up (bytes move from low half to high half)
            wstage = jnp.where(
                need,
                pltpu.roll(wstage, PAYBLK, 1)
                & jnp.where(
                    jax.lax.broadcasted_iota(I32, (k, 2 * PAYBLK), 1) >= PAYBLK,
                    -1, 0,
                ),
                wstage,
            )
            wbase = jnp.where(need, wbase - PAYBLK, wbase)
            return wstage, wbase

        wbase0 = jnp.full((k, 1), cap - 2 * PAYBLK, I32)

        def rev(i, carry):
            x, pos, wstage, wbase, istage = carry
            s = ts - 1 - i
            smod = s % PAYBLK
            istage = jax.lax.cond(
                smod == PAYBLK - 1,
                lambda st: iv_ref[
                    :, pl.ds(pl.multiple_of(s - (PAYBLK - 1), PAYBLK), PAYBLK)
                ],
                lambda st: st,
                istage,
            )
            cmask = jax.lax.broadcasted_iota(I32, (k, PAYBLK), 1) == smod
            packed = jnp.sum(jnp.where(cmask, istage, 0), axis=1, keepdims=True)
            cum_c = packed & 16383
            freq_c = (packed >> 14) & 32767
            act = (packed >> 29) != 0
            fx = jnp.maximum(freq_c, 1).astype(U32)  # int32 max (maxui is
            # not legal on this Mosaic version)
            x_max = jnp.where(
                act, fx << X_MAX_SHIFT, jnp.full((k, 1), 0xFFFFFFFF, U32)
            )
            for _ in range(2):
                do = x >= x_max
                wstage, pos = emit(
                    wstage, wbase, pos, (x & 0xFF).astype(I32), do
                )
                x = jnp.where(do, x >> 8, x)
            # x // fx via f32 reciprocal + one-step integer fixup (u32
            # vector division may be microcoded on the VPU). Exact: the
            # renorm above guarantees x < fx << 19, so q < 2^19 and the
            # f32 estimate is off by at most 1 (x's f32 rounding is a
            # 2^-24 relative error; q fits the 24-bit mantissa).
            xi = pltpu.bitcast(x, I32)
            fxi = pltpu.bitcast(fx, I32)  # fx <= 2^14, sign-safe
            # unsigned->f32 via signed convert + wrap correction (Mosaic
            # has no unsigned converts)
            xf = xi.astype(F32) + jnp.where(xi < 0, 4294967296.0, 0.0)
            q = jnp.floor(xf / fxi.astype(F32)).astype(I32)
            # true remainder is tiny, so mod-2^32 i32 arithmetic is exact
            r = xi - q * fxi
            qdn = r < 0
            q = jnp.where(qdn, q - 1, q)
            r = jnp.where(qdn, r + fxi, r)
            qup = r >= fxi
            q = jnp.where(qup, q + 1, q)
            r = jnp.where(qup, r - fxi, r)
            nx = (
                (pltpu.bitcast(q, U32) << PROB_BITS)
                + pltpu.bitcast(r, U32)
                + cum_c.astype(U32)
            )
            x = jnp.where(act, nx, x)
            # keep >= 8 bytes of room below pos
            need = (pos - wbase) < 8
            wstage, wbase = flush_low(wstage, wbase, need)
            return x, pos, wstage, wbase, istage

        # preload the (possibly partial) top block for the first reverse steps
        top = ((ts - 1) // PAYBLK) * PAYBLK
        istage_r = iv_ref[:, pl.ds(top, PAYBLK)]
        x, pos, wstage, wbase, _ = jax.lax.fori_loop(
            0, ts, rev, (x, pos, wstage0, wbase0, istage_r)
        )
        # final 4-byte state flush (LE, low byte at the lowest address)
        ones = jnp.ones((k, 1), bool)
        for i in (3, 2, 1, 0):
            wstage, pos = emit(
                wstage, wbase, pos, ((x >> (8 * i)) & 0xFF).astype(I32), ones
            )
            need = (pos - wbase) < 8
            wstage, wbase = flush_low(wstage, wbase, need)
        # flush remaining window halves (both blocks)
        for _ in range(2):
            wstage, wbase = flush_low(wstage, wbase, ones)
        start_ref[:, :] = pos


def _union_kinds(section_codecs):
    seen = []
    for cn in section_codecs:
        for kd in _unique_kinds(KCODECS[cn]):
            if kd not in seen:
                seen.append(kd)
    return tuple(seen)


def _enc_geometry(codec_name: str, k: int, t_steps: int):
    codec = KCODECS[codec_name]
    s_sub = len(codec.kinds)
    cap0 = 2 * t_steps * s_sub + 8
    cap = -(-cap0 // (2 * PAYBLK)) * (2 * PAYBLK)
    kp = max(k, 8)
    tp = -(-t_steps // PAYBLK) * PAYBLK
    tsp = -(-(t_steps * s_sub) // PAYBLK) * PAYBLK
    return codec.rec_width, s_sub, cap, kp, tp, tsp


def _build_encode_multi(sections):
    """Kernel running several sections back to back, chaining table state in
    VMEM. sections: tuple of (codec_name, k_padded, t_steps, cap)."""
    kinds = _union_kinds([s[0] for s in sections])
    names = _table_names(kinds)
    ns = len(sections)

    def kernel(*refs):
        # refs = (recs_0, lens_0, ..., cnt_in...,
        #         buf_0, start_0, ..., cnt_out..., iv_0...iv_{ns-1})
        pos = 2 * ns
        cnt_in = refs[pos : pos + len(names)]
        pos += len(names)
        outs = refs[pos : pos + 2 * ns]
        pos += 2 * ns
        cnts = dict(zip(names, refs[pos : pos + len(names)]))
        ivs = refs[pos + len(names) :]
        for i, kd in enumerate(names):
            cnts[kd][:, :] = cnt_in[i][:, :]
        alphabets = {TABLE_KINDS[kd][1] for kd in kinds}
        prefix_m = {a: _prefix_matrix(a) for a in alphabets}
        for si, (cn, kp, t_steps, cap) in enumerate(sections):
            _emit_encode_section(
                cn, kp, t_steps, cap,
                refs[2 * si], refs[2 * si + 1],
                outs[2 * si], outs[2 * si + 1], ivs[si],
                cnts, prefix_m,
            )

    return kernel, kinds


def _encode_sections_pallas(dealt_list, lens_list, tables, kts):
    """Shared driver: run the given sections in ONE pallas_call.

    dealt_list/lens_list: per-section [T, K, W] records and [K] lens;
    kts: tuple of (codec_name, k, t_steps). Returns (bufs, starts, tables')
    as lists aligned with kts."""
    geo = [_enc_geometry(cn, k, t) for cn, k, t in kts]
    sections = tuple(
        (cn, g[3], t, g[2]) for (cn, k, t), g in zip(kts, geo)
    )
    kernel, kinds = _build_encode_multi(sections)

    ins = []
    for (cn, k, t), g, recs, lens in zip(kts, geo, dealt_list, lens_list):
        w, s_sub, cap, kp, tp, tsp = g
        recs_t = jnp.zeros((w, kp, tp), I32).at[:, :k, :t].set(
            jnp.transpose(recs, (2, 1, 0))
        )
        lens2 = jnp.zeros((kp, 1), I32).at[:k, 0].set(lens.astype(I32))
        ins.extend([recs_t, lens2])
    names = _table_names(kinds)
    cnt_f32 = [_table_input(tables, nm) for nm in names]

    out_shapes = []
    for (cn, k, t), g in zip(kts, geo):
        w, s_sub, cap, kp, tp, tsp = g
        out_shapes.append(jax.ShapeDtypeStruct((kp, cap), I32))
        out_shapes.append(jax.ShapeDtypeStruct((kp, 1), I32))
    out_shapes += [jax.ShapeDtypeStruct(c.shape, F32) for c in cnt_f32]
    n_in = 2 * len(kts)
    aliases = {n_in + i: 2 * len(kts) + i for i in range(len(names))}
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (n_in + len(names)),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 * len(kts) + len(names)),
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((g[3], g[5]), I32) for g in geo],
        interpret=jax.default_backend() == "cpu",
    )(*ins, *cnt_f32)
    bufs, starts = [], []
    for i, ((cn, k, t), g) in enumerate(zip(kts, geo)):
        bufs.append(outs[2 * i][:k].astype(jnp.uint8))
        starts.append(outs[2 * i + 1][:k, 0])
    tables = _tables_output(tables, names, outs[2 * len(kts) :])
    return bufs, starts, tables


def _color_rows_limit(kts) -> int:
    """Resident color-table rows for this section group: the full table,
    unless every color-using codec in the group is a compact (colw)
    variant — then the largest compact_rows bound."""
    full = TABLE_KINDS["color"][0]
    rows = 0
    for cn, _, _ in kts:
        c = KCODECS[cn]
        if "color" in c.kinds:
            rows = max(rows, getattr(c, "compact_rows", 0) or full)
    return rows or full


def _enc_vmem_estimate(kts):
    """Rough VMEM bytes for a fused encode of these sections (tables,
    records, payload buffers, interval scratch, per-step temporaries)."""
    total = 1 * 1024 * 1024  # fixed temporaries headroom
    union = _union_kinds([cn for cn, _, _ in kts])
    color_rows = _color_rows_limit(kts)
    r_max = 8
    for kd in union:
        r, a = TABLE_KINDS[kd]
        if kd == "color":
            r = min(r, color_rows)
        total += 4 * r * a  # resident f32 table
        window = min(COLOR_CTX_ROWS, r) if kd == "color" else r
        if window > SMALL_R:
            r_max = max(r_max, window)
    for cn, k, t in kts:
        w, s_sub, cap, kp, tp, tsp = _enc_geometry(cn, k, t)
        per_lane = w * tp + cap + tsp + 16 * PAYBLK
        a_max = max(TABLE_KINDS[kd][1] for kd in _unique_kinds(KCODECS[cn]))
        total += 4 * kp * (per_lane + 6 * a_max) + 4 * a_max * a_max
    # MXU gather/scatter transients at the largest table used: bf16 one-hot
    # [kp, r_max], bf16 table planes (2x), f32 scatter result
    kp_max = max(_enc_geometry(cn, k, t)[3] for cn, k, t in kts)
    a_big = max(TABLE_KINDS[kd][1] for kd in union)
    total += 2 * kp_max * r_max + 8 * r_max * a_big
    return total


# fuse sections into one kernel only while the estimate stays inside the
# 32 MB scoped-VMEM cap set by jitopts.kernel_jit (with headroom for the
# estimate's error); larger sections fall back to one kernel each. Under a
# stream vmap (serving) the stream-grid pipeline double-buffers the table
# block in AND out, so the estimate gains 3 extra copies of the resident
# tables (see coder._kernel_fits).
_FUSE_VMEM_LIMIT = 24 * 1024 * 1024


def _batch_table_overhead(kts) -> int:
    union = _union_kinds([cn for cn, _, _ in kts])
    color_rows = _color_rows_limit(kts)
    return 3 * sum(
        4 * (min(TABLE_KINDS[kd][0], color_rows) if kd == "color"
             else TABLE_KINDS[kd][0]) * TABLE_KINDS[kd][1]
        for kd in union
    )


def encode_sections_fused(dealt_list, lens_list, tables, kts,
                          batched: bool = False):
    """Encode several sections with as few kernel launches as possible
    (~3 ms fixed cost per launch on tunnel-attached TPUs). Greedily packs
    consecutive sections into fused kernels under a VMEM budget; falls back
    to per-section kernels for oversized groups. Bytes and table chaining
    are identical to sequential encode_section_kernel calls. batched: the
    caller runs under a stream vmap (table blocks double-buffer in+out)."""
    limit = _FUSE_VMEM_LIMIT if not batched else 80 * 1024 * 1024
    extra = _batch_table_overhead(kts) if batched else 0

    def est(group):
        return _enc_vmem_estimate(group) + extra

    bufs, starts = [], []
    i = 0
    while i < len(kts):
        j = i + 1
        while j <= len(kts) and est(kts[i:j]) <= limit:
            j += 1
        j = max(j - 1, i + 1)
        if j == i + 1 and est(kts[i:j]) > limit:
            # single section too big for VMEM: scan path (bytes identical)
            from screenpressor_tpu.jx import coder as jc

            cn, k, t = kts[i]
            cum, freq, act, tables = jc.model_scan(
                dealt_list[i], lens_list[i], tables, cn, k, t
            )
            nsub = len(KCODECS[cn].kinds)
            b1, s1 = jc.rans_pack(cum, freq, act, 2 * t * nsub + 8)
            bufs.append(b1)
            starts.append(s1)
            i = j
            continue
        b, s, tables = _encode_sections_pallas(
            dealt_list[i:j], lens_list[i:j], tables, tuple(kts[i:j])
        )
        bufs.extend(b)
        starts.extend(s)
        i = j
    return bufs, starts, tables


@functools.partial(jax.jit, static_argnames=("codec_name", "k", "t_steps"))
def encode_section_kernel(recs, lens, tables, codec_name: str, k: int,
                          t_steps: int):
    """Fused replacement for jx.coder.model_scan + rans_pack.

    recs: [T, K, W] int32 dealt records; lens [K].
    Returns (buf [K, cap] uint8, start [K] int32, tables')."""
    bufs, starts, tables = _encode_sections_pallas(
        [recs], [lens], tables, ((codec_name, k, t_steps),)
    )
    return bufs[0], starts[0], tables
