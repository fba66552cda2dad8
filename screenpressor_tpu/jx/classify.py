"""Pixel classification + greedy RLE segmentation — JAX implementation.

Matches `spec/classify.py` exactly. The serial greedy segmentation walk is
re-expressed as: (1) vectorized predicate planes, (2) per-type streak tables
via reverse cumulative mins, (3) a jump function `next_start(i)` and
pointer-doubling path expansion (O(n log n) parallel work) to enumerate
record starts — the TPU replacement for the reference's serial
`ClassifyPixelsI` walk (`screencap.cpp:876-919`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from screenpressor_tpu.config import (
    MAX_RUN,
    NUM_PTYPES,
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LEFT,
    PT_LITERAL,
)


def fits_planes_i(frame):
    """frame [H, W, 3] uint8 -> fits [N, 6] bool (raster layout)."""
    h, w, _ = frame.shape
    n = h * w
    pix = frame.reshape(n, 3).astype(jnp.int32)
    left = jnp.concatenate([jnp.zeros((1, 3), jnp.int32), pix[:-1]], axis=0)
    above = jnp.concatenate([jnp.zeros((w, 3), jnp.int32), pix[:-w]], axis=0)
    idx = jnp.arange(n)
    xs = idx % w
    inner = (idx >= w + 1) & (xs > 0)
    al_idx = jnp.where(inner, idx - w - 1, jnp.maximum(idx - 1, 0))
    aboveleft = pix[al_idx]
    aboveleft = aboveleft.at[0].set(0)
    has_above = idx >= w

    eq = lambda a, b: jnp.all(a == b, axis=1)
    f_left = eq(pix, left).at[0].set(False)
    fits = jnp.zeros((n, NUM_PTYPES), bool)
    fits = fits.at[:, PT_LITERAL].set(f_left)
    fits = fits.at[:, PT_LEFT].set(f_left)
    fits = fits.at[:, PT_ABOVE].set(eq(pix, above) & has_above)
    fits = fits.at[:, PT_GRADIENT].set(eq(pix, left + above - aboveleft) & has_above)
    fits = fits.at[:, PT_ABOVELEFT].set(eq(pix, aboveleft) & has_above)
    return fits


def start_types_i(fits):
    n = fits.shape[0]
    t = jnp.full((n,), PT_LITERAL, jnp.int32)
    for p in (PT_GRADIENT, PT_ABOVE, PT_ABOVELEFT, PT_LEFT):
        t = jnp.where(fits[:, p], p, t)
    return t.at[0].set(PT_LITERAL)


def streak_tables(fits):
    """r[t][i] = length of true-streak of fits[:, t] starting at i."""
    n, nt = fits.shape
    idx = jnp.arange(n + 1, dtype=jnp.int32)
    outs = []
    for t in range(nt):
        f = jnp.concatenate([fits[:, t], jnp.zeros((1,), bool)])
        nf = jnp.where(~f, idx, n + 1)
        nf = jax.lax.cummin(nf, axis=0, reverse=True)
        outs.append(nf[:n] - idx[:n])
    return jnp.stack(outs)  # [nt, n]


def segment(frame):
    """frame -> (starts [n] int32 with sentinel n, ptypes [n], runs [n],
    n_records scalar). Slot i of the output is record i (padded with
    sentinels past n_records)."""
    h, w, _ = frame.shape
    n = h * w
    fits = fits_planes_i(frame)
    st = start_types_i(fits)
    runs = streak_tables(fits)

    # run length if a record starts at i: 1 + min(streak(i+1), MAX_RUN-1),
    # clipped to n - i
    ext = jnp.concatenate([runs[:, 1:], jnp.zeros((runs.shape[0], 1), jnp.int32)], axis=1)
    ext_t = ext[st, jnp.arange(n)]
    runlen = jnp.minimum(1 + jnp.minimum(ext_t, MAX_RUN - 1), n - jnp.arange(n))
    jump = jnp.minimum(jnp.arange(n, dtype=jnp.int32) + runlen, n)
    jump = jnp.concatenate([jump, jnp.array([n], jnp.int32)])  # fixpoint at n

    # pointer-doubling path expansion from 0. Squaring the full jump table is
    # the expensive part (n-wide gathers), so cap it at f^(2^SQ) and expand
    # the remaining path in fixed 2^SQ-record chunks reusing that table.
    cap = n
    sq_cap = 13
    path = jnp.full((cap,), n, jnp.int32).at[0].set(0)
    m = jump
    length = 1
    while length < cap and length < (1 << sq_cap):
        upd = min(length, cap - length)  # clamp final round to the buffer
        tail = m[path[:upd]]
        path = jax.lax.dynamic_update_slice(path, tail, (length,))
        if length * 2 < cap:
            m = m[m]
        length *= 2
    chunk = 1 << sq_cap
    while length < cap:
        upd = min(chunk, cap - length)
        # path[length + j] = f^chunk(path[length - chunk + j])
        tail = m[path[length - chunk : length - chunk + upd]]
        path = jax.lax.dynamic_update_slice(path, tail, (length,))
        length += upd
    is_rec = path < n
    n_records = jnp.sum(is_rec).astype(jnp.int32)
    ptypes = jnp.where(is_rec, st[jnp.minimum(path, n - 1)], 0)
    rlens = jnp.where(is_rec, runlen[jnp.minimum(path, n - 1)], 0)
    return path, ptypes, rlens, n_records


@functools.partial(jax.jit, static_argnames=("h", "w"))
def classify_i(frame, h: int, w: int):
    """Device classification: returns dense per-record arrays (capacity n).

    records[i] = (ptype, n); literal triples compacted to lit[i] with
    lit_count; callers slice by n_records on the host.
    """
    starts, ptypes, rlens, n_records = segment(frame)
    n = h * w
    pix = frame.reshape(n, 3)
    is_lit = (ptypes == PT_LITERAL) & (starts < n)
    lit_pos = jnp.cumsum(is_lit.astype(jnp.int32)) - 1
    src = pix[jnp.minimum(starts, n - 1)].astype(jnp.int32)
    # compact literals; non-literal slots scatter out of bounds and drop
    tgt = jnp.where(is_lit, lit_pos, n)
    lits = jnp.zeros((n, 3), jnp.int32).at[tgt].set(src, mode="drop")
    n_literals = jnp.sum(is_lit).astype(jnp.int32)
    records = jnp.stack([ptypes, rlens], axis=1)
    return records, n_records, lits, n_literals
