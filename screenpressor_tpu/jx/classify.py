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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    # no index-0 special case: global pixel 0 has all-False fits planes
    # (fits_planes_i zeroes them), so it types PT_LITERAL by default — and
    # a row-shard's local pixel 0 (classify_from_fits) must NOT be forced
    n = fits.shape[0]
    t = jnp.full((n,), PT_LITERAL, jnp.int32)
    for p in (PT_GRADIENT, PT_ABOVE, PT_ABOVELEFT, PT_LEFT):
        t = jnp.where(fits[:, p], p, t)
    return t


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


_WALK_LANES = 256  # tiles per kernel grid step (VPU lane batch)


def _make_walk_kernel(chunk: int):
    def kernel(fits_ref, st_ref, out_ref, cur_ref, run_ref):
        """Greedy run-walk state machine: serial over the tile positions,
        vectorized across _WALK_LANES tiles (VPU lanes), with the walk
        state carried across position-chunk grid steps in VMEM scratch
        (large tiles would otherwise need the whole [tile, lanes] block in
        VMEM at once). Emits the record-start mask; run lengths and types
        derive from it afterwards. This is the Pallas replacement for the
        serial `ClassifyPixelsI` walk (`screencap.cpp:876-919`)."""
        c = pl.program_id(1)
        lanes = fits_ref.shape[1]

        @pl.when(c == 0)
        def _():
            cur_ref[:, :] = jnp.zeros_like(cur_ref)
            run_ref[:, :] = jnp.zeros_like(run_ref)

        def body(t, carry):
            cur_pt, run = carry
            f = fits_ref[pl.ds(t, 1), :]
            stt = st_ref[pl.ds(t, 1), :]
            fits_cur = (f >> cur_pt) & 1
            first = (c == 0) & (t == 0)  # tile position 0 always starts
            ext = (fits_cur == 1) & (run < MAX_RUN) & jnp.logical_not(first)
            is_start = ~ext
            out_ref[pl.ds(t, 1), :] = is_start.astype(jnp.int32)
            cur_pt = jnp.where(is_start, stt, cur_pt)
            run = jnp.where(is_start, 1, run + 1)
            return cur_pt, run

        carry = (cur_ref[:, :], run_ref[:, :])
        cur_pt, run = jax.lax.fori_loop(0, chunk, body, carry)
        cur_ref[:, :] = cur_pt
        run_ref[:, :] = run

    return kernel


def _walk_chunk(tile: int) -> int:
    """Largest divisor of `tile` <= 2048 (position-chunk block rows)."""
    for k in range(1, tile + 1):
        if tile % k == 0 and tile // k <= 2048:
            return tile // k
    return 1


def _run_walk(fits_bits, st, n: int, tile: int):
    """fits_bits/st: [n] int32 -> is_start [n] bool via the Pallas kernel."""
    n_tiles = -(-n // tile)
    tp = -(-n_tiles // _WALK_LANES) * _WALK_LANES
    pad = tp * tile - n
    fb = jnp.concatenate([fits_bits, jnp.zeros((pad,), jnp.int32)])
    sb = jnp.concatenate([st, jnp.zeros((pad,), jnp.int32)])
    # [tiles, L] -> [L, tiles]: the tile axis is the vector lane axis
    fb = fb.reshape(tp, tile).T
    sb = sb.reshape(tp, tile).T
    chunk = _walk_chunk(tile)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _make_walk_kernel(chunk),
        out_shape=jax.ShapeDtypeStruct((tile, tp), jnp.int32),
        grid=(tp // _WALK_LANES, tile // chunk),
        in_specs=[
            pl.BlockSpec((chunk, _WALK_LANES), lambda g, c: (c, g)),
            pl.BlockSpec((chunk, _WALK_LANES), lambda g, c: (c, g)),
        ],
        out_specs=pl.BlockSpec((chunk, _WALK_LANES), lambda g, c: (c, g)),
        scratch_shapes=[
            pltpu.VMEM((1, _WALK_LANES), jnp.int32),
            pltpu.VMEM((1, _WALK_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(fb, sb)
    return out.T.reshape(tp * tile)[:n] != 0


def _segment_pixels(frame):
    """frame -> per-pixel (is_start [n] bool, st [n] start types)."""
    from screenpressor_tpu.config import seg_tile

    h, w, _ = frame.shape
    n = h * w
    fits = fits_planes_i(frame)
    st = start_types_i(fits)
    bits = jnp.zeros((n,), jnp.int32)
    for t in range(NUM_PTYPES):
        bits = bits | (fits[:, t].astype(jnp.int32) << t)
    return _run_walk(bits, st, n, seg_tile(n, w)), st


def segment(frame):
    """frame -> (starts [n] int32 with sentinel n, ptypes [n], runs [n],
    n_records scalar). Slot i of the output is record i (padded with
    sentinels past n_records). Runs break at SEG_TILE boundaries (shared
    encoder policy; decoders accept any valid segmentation)."""
    h, w, _ = frame.shape
    n = h * w
    is_start, st = _segment_pixels(frame)

    idx = jnp.arange(n, dtype=jnp.int32)
    # next record start strictly after i (or n)
    starts_at = jnp.where(is_start, idx, n)
    nxt = jax.lax.cummin(
        jnp.concatenate([starts_at[1:], jnp.array([n], jnp.int32)]),
        axis=0, reverse=True,
    )
    runlen = jnp.where(is_start, nxt - idx, 0)
    n_records = jnp.sum(is_start).astype(jnp.int32)
    # compact starts into record slots. Sort-based compaction: record i's
    # rank is its key (non-starts key to n and carry their own pad
    # sentinels to the tail). One multi-payload sort is ~5x cheaper than
    # three 2M-element scatters on TPU (scatter serializes; sort doesn't).
    pos = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    key = jnp.where(is_start, pos, n)
    _, path, ptypes, rlens = jax.lax.sort(
        (key, starts_at, jnp.where(is_start, st, 0), runlen), num_keys=1
    )
    return path, ptypes, rlens, n_records


def classify_from_fits(fits, pix, tile: int):
    """Classification from precomputed fits planes: fits [n, 6] bool,
    pix [n, 3] -> (records, n_records, lits, n_literals), same contract as
    `classify_i`. `tile` must be the GLOBAL frame's config.seg_tile (not
    the shard's) so shards segment identically to the unsharded encoder.
    Used by the row-sharded pipeline (parallel/mesh.py), where fits come
    from a halo exchange: a shard whose pixel range starts on a tile
    boundary produces exactly the global records of its range (runs break
    at tile boundaries, so no run crosses a shard seam)."""
    n = fits.shape[0]
    st = start_types_i(fits)
    bits = jnp.zeros((n,), jnp.int32)
    for t in range(NUM_PTYPES):
        bits = bits | (fits[:, t].astype(jnp.int32) << t)
    is_start = _run_walk(bits, st, n, tile)
    idx = jnp.arange(n, dtype=jnp.int32)
    starts_at = jnp.where(is_start, idx, n)
    nxt = jax.lax.cummin(
        jnp.concatenate([starts_at[1:], jnp.array([n], jnp.int32)]),
        axis=0, reverse=True,
    )
    runlen = jnp.where(is_start, nxt - idx, 0)
    n_records = jnp.sum(is_start).astype(jnp.int32)
    pos = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    key = jnp.where(is_start, pos, n)
    _, ptypes, rlens = jax.lax.sort(
        (key, jnp.where(is_start, st, 0), runlen), num_keys=1
    )
    is_lit = is_start & (st == PT_LITERAL)
    lit_pos = jnp.cumsum(is_lit.astype(jnp.int32)) - 1
    lkey = jnp.where(is_lit, lit_pos, n)
    pix = pix.astype(jnp.int32)
    masked = jnp.where(is_lit[:, None], pix, 0)
    _, lr, lg, lb = jax.lax.sort(
        (lkey, masked[:, 0], masked[:, 1], masked[:, 2]), num_keys=1
    )
    lits = jnp.stack([lr, lg, lb], axis=1)
    n_literals = jnp.sum(is_lit).astype(jnp.int32)
    records = jnp.stack([ptypes, rlens], axis=1)
    return records, n_records, lits, n_literals


@functools.partial(jax.jit, static_argnames=("h", "w"))
def classify_i(frame, h: int, w: int):
    """Device classification: returns dense per-record arrays (capacity n).

    records[i] = (ptype, n); literal triples compacted to lit[i] with
    lit_count; callers slice by n_records on the host.
    """
    n = h * w
    is_start, st = _segment_pixels(frame)
    idx = jnp.arange(n, dtype=jnp.int32)
    starts_at = jnp.where(is_start, idx, n)
    nxt = jax.lax.cummin(
        jnp.concatenate([starts_at[1:], jnp.array([n], jnp.int32)]),
        axis=0, reverse=True,
    )
    runlen = jnp.where(is_start, nxt - idx, 0)
    n_records = jnp.sum(is_start).astype(jnp.int32)
    pos = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    key = jnp.where(is_start, pos, n)
    _, ptypes, rlens = jax.lax.sort(
        (key, jnp.where(is_start, st, 0), runlen), num_keys=1
    )
    # literal colors compact straight from the pixel plane (elementwise +
    # one sort: record i's start pixel IS pixel i when is_start[i]), so no
    # 2M-row gather/scatter is needed.
    is_lit = is_start & (st == PT_LITERAL)
    lit_pos = jnp.cumsum(is_lit.astype(jnp.int32)) - 1
    lkey = jnp.where(is_lit, lit_pos, n)
    pix = frame.reshape(n, 3).astype(jnp.int32)
    masked = jnp.where(is_lit[:, None], pix, 0)
    _, lr, lg, lb = jax.lax.sort(
        (lkey, masked[:, 0], masked[:, 1], masked[:, 2]), num_keys=1
    )
    lits = jnp.stack([lr, lg, lb], axis=1)
    n_literals = jnp.sum(is_lit).astype(jnp.int32)
    records = jnp.stack([ptypes, rlens], axis=1)
    return records, n_records, lits, n_literals
