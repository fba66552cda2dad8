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

from screenpressor_tpu.config import (
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LITERAL,
)


def expand_records(records, lits, n: int):
    """records [R, 2] (ptype, n) + lits [L, 3] -> per-pixel ptype [n] and
    literal value [n, 3] (literal of the covering record; arbitrary for
    non-literal pixels). R, L are capacity-padded; padded rows have n = 0."""
    rec_pt = records[:, 0]
    rec_n = records[:, 1]
    starts = jnp.cumsum(rec_n) - rec_n  # [R]
    # per-pixel record id via scatter+cumsum (padded records scatter to n -> drop)
    marks = jnp.zeros((n,), jnp.int32).at[jnp.where(rec_n > 0, starts, n)].add(
        1, mode="drop"
    )
    rec_id = jnp.cumsum(marks) - 1
    pt_pix = rec_pt[rec_id]
    lit_idx = jnp.cumsum((rec_pt == PT_LITERAL).astype(jnp.int32)) - 1
    lit_pix = lits[jnp.clip(lit_idx[rec_id], 0, lits.shape[0] - 1)]
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


_ROW_UNROLL = 8


@functools.partial(jax.jit, static_argnames=("h", "w"))
def reconstruct_i(records, lits, h: int, w: int):
    """I-frame reconstruction -> [h, w, 3] uint8.

    Rows are inherently sequential (above-row dependency); the scan processes
    _ROW_UNROLL rows per step to amortize loop overhead."""
    n = h * w
    pt_pix, lit_pix = expand_records(records, lits, n)
    hp = -(-h // _ROW_UNROLL) * _ROW_UNROLL
    pt_rows = jnp.zeros((hp, w), jnp.int32).at[:h].set(pt_pix.reshape(h, w))
    lit_rows = jnp.zeros((hp, w, 3), jnp.int32).at[:h].set(lit_pix.reshape(h, w, 3))
    pt_g = pt_rows.reshape(hp // _ROW_UNROLL, _ROW_UNROLL, w)
    lit_g = lit_rows.reshape(hp // _ROW_UNROLL, _ROW_UNROLL, w, 3)

    def one_row(prev_row, carry_pix, pt, lit):
        above = prev_row
        aboveleft = jnp.concatenate([carry_pix[None, :], above[:-1]], axis=0)
        reset = (pt == PT_LITERAL) | (pt == PT_ABOVE) | (pt == PT_ABOVELEFT)
        known = jnp.where(
            (pt == PT_ABOVE)[:, None],
            above,
            jnp.where((pt == PT_ABOVELEFT)[:, None], aboveleft, lit),
        )
        a = jnp.where(reset, 0, 1).astype(jnp.int32)
        d = jnp.where((pt == PT_GRADIENT)[:, None], above - aboveleft, 0)
        b = jnp.where(reset[:, None], known, d)
        row = _row_affine(a, b, carry_pix)
        return row

    def group_step(carry, inp):
        prev_row, carry_pix = carry
        pts, litg = inp
        rows = []
        for r in range(_ROW_UNROLL):
            row = one_row(prev_row, carry_pix, pts[r], litg[r])
            rows.append(row)
            prev_row, carry_pix = row, row[-1]
        return (prev_row, carry_pix), jnp.stack(rows)

    init = (jnp.zeros((w, 3), jnp.int32), jnp.zeros((3,), jnp.int32))
    _, rows = jax.lax.scan(group_step, init, (pt_g, lit_g))
    return rows.reshape(hp, w, 3)[:h].astype(jnp.uint8)
