"""Frame reconstruction — JAX implementation.

Records guarantee exact predictor matches inside runs, so each row obeys the
affine recurrence v[x] = a[x] * v[x-1] + b[x] (a in {0,1}) resolved with an
associative scan over X; rows chain through a lax.scan over Y (DESIGN.md).
Replaces the reference's serial per-pixel reconstruction loops
(`DecompressI`, `screencap.cpp:414-498`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from screenpressor_tpu.config import (
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LITERAL,
)


def expand_records(records, lits, n: int):
    """records [R, 2] (ptype, n) + lits [L, 3] -> per-pixel ptype [n] and
    literal value [n, 3] (literal of the covering record; arbitrary for
    non-literal pixels). R, L are capacity-padded; padded rows have n = 0.

    Values are propagated across runs as scatter(delta-at-start) + cumsum —
    pixel-granularity random gathers (2M rows at 1080p) lowered poorly on
    TPU (~100 ms); the delta form needs only record-granularity gathers."""
    rec_pt = records[:, 0]
    rec_n = records[:, 1]
    starts = jnp.cumsum(rec_n) - rec_n  # [R]
    valid = rec_n > 0
    tgt = jnp.where(valid, starts, n)

    def spread(vals):
        """vals [R, C] per-record -> [n, C] per-pixel (value of the covering
        record) via delta scatter + cumsum."""
        prev = jnp.concatenate([jnp.zeros_like(vals[:1]), vals[:-1]], axis=0)
        delta = jnp.where(valid[:, None], vals - jnp.where(
            jnp.arange(vals.shape[0])[:, None] == 0, 0, prev), 0)
        out = jnp.zeros((n, vals.shape[1]), vals.dtype).at[tgt].add(
            delta, mode="drop"
        )
        return jnp.cumsum(out, axis=0)

    pt_pix = spread(rec_pt[:, None].astype(jnp.int32))[:, 0]
    lit_idx = jnp.cumsum((rec_pt == PT_LITERAL).astype(jnp.int32)) - 1
    lit_rec = lits[jnp.clip(lit_idx, 0, lits.shape[0] - 1)]  # [R, 3]
    lit_pix = spread(lit_rec.astype(jnp.int32))
    return pt_pix, lit_pix


def _row_affine(a, b, carry_pix):
    """Resolve v[x] = a[x]*v[x-1] + b[x] with v[-1] = carry_pix.
    a: [W] int32 in {0,1}; b: [W, 3] int32."""

    def combine(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay[..., None] * bx + by

    pa, pb = jax.lax.associative_scan(combine, (a, b), axis=0)
    return pa[..., None] * carry_pix[None, :] + pb


_ROW_GROUP = 64  # rows per Pallas grid step


def _recon_kernel(pt_ref, lit_ref, out_ref, carry_ref):
    """Row-sequential affine reconstruction; each row's recurrence resolves
    with log2(W) roll+combine passes on VMEM values.

    Blocks (channels in sublanes, pixels in lanes): pt [G, Wp],
    lit/out [G, 3, Wp]; carry scratch [3, Wp] = previous row.
    """
    g = pl.program_id(0)
    rows = pt_ref.shape[0]
    wp = pt_ref.shape[1]

    @pl.when(g == 0)
    def _():
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    def one_row(r, _):
        pt = pt_ref[pl.ds(r, 1), :]  # [1, Wp]
        lit = lit_ref[r]  # [3, Wp]
        prev_row = carry_ref[:, :]  # [3, Wp]
        carry_pix = prev_row[:, wp - 1 : wp]  # [3, 1]
        above = prev_row
        aboveleft = jnp.roll(prev_row, 1, axis=1)  # slot 0 = last pixel
        reset = (pt == PT_LITERAL) | (pt == PT_ABOVE) | (pt == PT_ABOVELEFT)
        known = jnp.where(
            pt == PT_ABOVE,
            above,
            jnp.where(pt == PT_ABOVELEFT, aboveleft, lit),
        )
        a = jnp.where(reset, 0, 1).astype(jnp.int32)  # [1, Wp]
        d = jnp.where(pt == PT_GRADIENT, above - aboveleft, 0)
        b = jnp.where(reset, known, d)  # [3, Wp]
        # prefix composition of v = a*v_prev + b (Hillis-Steele)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        shift = 1
        while shift < wp:
            first = idx < shift
            a_s = jnp.where(first, 1, jnp.roll(a, shift, axis=1))
            b_s = jnp.where(first, 0, jnp.roll(b, shift, axis=1))
            b = a * b_s + b
            a = a * a_s
            shift *= 2
        row = a * carry_pix + b
        out_ref[r] = row
        carry_ref[:, :] = row
        return 0

    jax.lax.fori_loop(0, rows, one_row, 0)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def reconstruct_i(records, lits, h: int, w: int):
    """I-frame reconstruction -> [h, w, 3] uint8.

    Rows are inherently sequential (above-row dependency); a Pallas kernel
    walks rows with the whole row in VMEM, resolving each row's affine
    recurrence with log2(W) vector passes."""
    n = h * w
    pt_pix, lit_pix = expand_records(records, lits, n)
    hp = -(-h // _ROW_GROUP) * _ROW_GROUP
    wp = max(128, 1 << (w - 1).bit_length())
    # pad columns as left-runs so the wrap-around carry pixel (out[y-1][w-1])
    # propagates through the padding to column 0 of the next row
    pt_rows = jnp.ones((hp, wp), jnp.int32)  # PT_LEFT
    pt_rows = pt_rows.at[:h, :w].set(pt_pix.reshape(h, w))
    lit_rows = jnp.zeros((hp, 3, wp), jnp.int32).at[:h, :, :w].set(
        jnp.transpose(lit_pix.reshape(h, w, 3), (0, 2, 1))
    )
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _recon_kernel,
        out_shape=jax.ShapeDtypeStruct((hp, 3, wp), jnp.int32),
        grid=(hp // _ROW_GROUP,),
        in_specs=[
            pl.BlockSpec((_ROW_GROUP, wp), lambda g: (g, 0)),
            pl.BlockSpec((_ROW_GROUP, 3, wp), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROW_GROUP, 3, wp), lambda g: (g, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3, wp), jnp.int32)],
        interpret=interpret,
    )(pt_rows, lit_rows)
    return jnp.transpose(out[:h, :, :w], (0, 2, 1)).astype(jnp.uint8)
