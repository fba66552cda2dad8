"""P-frame encode/decode — JAX pipeline.

Byte-identical to `spec/pframe.py`. Per-block work (classification,
segmentation, reconstruction) is vmapped over a padded block list; blocks are
independent by format design (out-of-subrect neighbors read the previous
frame), which is what makes this parallelism sound — the reference decodes
blocks serially in raster order (`DecompressP`, `screencap.cpp:1275-1432`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import (
    ALG_P,
    BLOCK,
    BT_FULL_DATA,
    BT_FULL_MOTION,
    BT_PARTIAL_DATA,
    BT_PARTIAL_MOTION,
    CodecConfig,
    MAX_RUN,
    NUM_PTYPES,
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LEFT,
    PT_LITERAL,
    PT_PREVFRAME,
    next_pow2,
    pad_cap,
)
from screenpressor_tpu.jx import blocks as jb
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.jitopts import kernel_jit
from screenpressor_tpu.jx.recon import _row_affine
from screenpressor_tpu.spec.blocks import rle_blocks

AREA = BLOCK * BLOCK


# ---------------------------------------------------------------------------
# Per-block classification (encoder)
# ---------------------------------------------------------------------------


def _win17(padded, x1, y1):
    return jax.lax.dynamic_slice(padded, (y1, x1, 0), (BLOCK + 1, BLOCK + 1, 3))


def _block_fits(cw, pw, x1, y1, bw, bh):
    """cw/pw: [17,17,3] windows with origin (y1-1, x1-1). Returns
    (fits [256, 6], start_types [256], cur_seq [256, 3], valid [256])
    in sub-rect raster order."""
    p = jnp.arange(AREA)
    ry = p // jnp.maximum(bw, 1)
    rx = p % jnp.maximum(bw, 1)
    valid = p < bw * bh
    ryc = jnp.minimum(ry, BLOCK - 1)

    cur = cw[1 + ryc, 1 + rx]
    c_left, p_left = cw[1 + ryc, rx], pw[1 + ryc, rx]
    c_above, p_above = cw[ryc, 1 + rx], pw[ryc, 1 + rx]
    c_tl, p_tl = cw[ryc, rx], pw[ryc, rx]
    prevv = pw[1 + ryc, 1 + rx]

    left = jnp.where((rx > 0)[:, None], c_left, p_left)
    above = jnp.where((ry > 0)[:, None], c_above, p_above)
    tl = jnp.where(((rx > 0) & (ry > 0))[:, None], c_tl, p_tl)

    avail_l = (x1 + rx) > 0
    avail_a = (y1 + ry) > 0
    avail_al = avail_l & avail_a

    # scan-prev: previous pixel in sub-rect raster order
    sp = jnp.where((rx > 0)[:, None], cw[1 + ryc, rx], cw[ryc, bw])
    eq = lambda a, b: jnp.all(a == b, axis=-1)

    f = jnp.zeros((AREA, NUM_PTYPES), bool)
    f0 = eq(cur, sp).at[0].set(False)
    f = f.at[:, PT_LITERAL].set(f0 & valid)
    f = f.at[:, PT_LEFT].set(eq(cur, left) & avail_l & valid)
    f = f.at[:, PT_ABOVE].set(eq(cur, above) & avail_a & valid)
    f = f.at[:, PT_PREVFRAME].set(eq(cur, prevv) & valid)
    f = f.at[:, PT_GRADIENT].set(eq(cur, left + above - tl) & avail_al & valid)
    f = f.at[:, PT_ABOVELEFT].set(eq(cur, tl) & avail_al & valid)

    st = jnp.full((AREA,), PT_LITERAL, jnp.int32)
    for pt in (PT_GRADIENT, PT_ABOVE, PT_ABOVELEFT, PT_PREVFRAME, PT_LEFT):
        st = jnp.where(f[:, pt], pt, st)
    return f, st, cur, valid


def _segment_seq(fits, st, n_valid):
    """Greedy segmentation of a 256-length sub-symbol sequence.
    Returns (starts [256] with sentinel AREA, ptypes, runlens, n_records)."""
    n = AREA
    idx = jnp.arange(n + 1, dtype=jnp.int32)
    streaks = []
    for t in range(NUM_PTYPES):
        fcol = jnp.concatenate([fits[:, t], jnp.zeros((1,), bool)])
        nf = jnp.where(~fcol, idx, n + 1)
        nf = jax.lax.cummin(nf, axis=0, reverse=True)
        streaks.append(nf[:n] - idx[:n])
    streaks = jnp.stack(streaks)
    ext = jnp.concatenate([streaks[:, 1:], jnp.zeros((NUM_PTYPES, 1), jnp.int32)], axis=1)
    ext_t = ext[st, jnp.arange(n)]
    runlen = jnp.minimum(1 + jnp.minimum(ext_t, MAX_RUN - 1), n_valid - jnp.arange(n))
    runlen = jnp.maximum(runlen, 1)
    jump = jnp.minimum(jnp.arange(n, dtype=jnp.int32) + runlen, n_valid)
    jump = jnp.where(jnp.arange(n) < n_valid, jump, n)
    jump = jnp.concatenate([jump, jnp.array([n], jnp.int32)])
    jump = jnp.minimum(jump, n)

    path = jnp.full((n,), n, jnp.int32).at[0].set(jnp.where(n_valid > 0, 0, n))
    m = jump
    length = 1
    while length < n:
        upd = min(length, n - length)
        tail = m[path[:upd]]
        path = jax.lax.dynamic_update_slice(path, tail, (length,))
        m = m[m]
        length *= 2
    is_rec = path < n_valid
    n_records = jnp.sum(is_rec).astype(jnp.int32)
    pc = jnp.minimum(path, n - 1)
    ptypes = jnp.where(is_rec, st[pc], 0)
    rlens = jnp.where(is_rec, runlen[pc], 0)
    return path, ptypes, rlens, n_records


def _classify_one_block(cw, pw, x1, y1, bw, bh):
    fits, st, cur, valid = _block_fits(cw, pw, x1, y1, bw, bh)
    path, ptypes, rlens, n_records = _segment_seq(fits, st, bw * bh)
    pc = jnp.minimum(path, AREA - 1)
    lits = cur[pc]
    is_lit = (path < bw * bh) & (ptypes == PT_LITERAL)
    return ptypes, rlens, n_records, lits, is_lit


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def classify_blocks(frame, prev, rects, h: int, w: int, bcap: int):
    """rects: [bcap, 4] int32 (padded with zeros). Returns per-block record
    arrays: (ptypes [bcap,256], rlens, n_records [bcap], lits [bcap,256,3],
    is_lit [bcap,256])."""
    # 1-pixel apron on top/left; BLOCK+1 on bottom/right so 17x17 windows at
    # any sub-rect origin never get start-clamped out of alignment
    fp = jnp.pad(frame.astype(jnp.int32), ((1, BLOCK + 1), (1, BLOCK + 1), (0, 0)))
    pp = jnp.pad(prev.astype(jnp.int32), ((1, BLOCK + 1), (1, BLOCK + 1), (0, 0)))

    def per_block(rect):
        x1, y1, x2, y2 = rect[0], rect[1], rect[2], rect[3]
        cw = _win17(fp, x1, y1)
        pw = _win17(pp, x1, y1)
        return _classify_one_block(cw, pw, x1, y1, x2 - x1, y2 - y1)

    return jax.vmap(per_block)(rects)


# ---------------------------------------------------------------------------
# Per-block reconstruction (decoder)
# ---------------------------------------------------------------------------


def _expand_block_records(ptypes, rlens, lits):
    """[256] record arrays -> per-seq-position (ptype, literal value)."""
    starts = jnp.cumsum(rlens) - rlens
    marks = jnp.zeros((AREA,), jnp.int32).at[jnp.where(rlens > 0, starts, AREA)].add(
        1, mode="drop"
    )
    rec_id = jnp.cumsum(marks) - 1
    rec_id = jnp.clip(rec_id, 0, AREA - 1)
    pt_seq = ptypes[rec_id]
    lit_seq = lits[rec_id]
    return pt_seq, lit_seq


def _reconstruct_one_block(pw, ptypes, rlens, lits, x1, y1, bw, bh):
    """pw: [17,17,3] prev window. Returns [16,16,3] sub-rect pixels
    (grid-relative; garbage beyond bw/bh)."""
    pt_seq, lit_seq = _expand_block_records(ptypes, rlens, lits)
    p = jnp.arange(AREA)
    ry = p // jnp.maximum(bw, 1)
    rx = p % jnp.maximum(bw, 1)
    # invalid positions scatter out of bounds (drop); valid ry < bh <= BLOCK
    ry_t = jnp.where(p < bw * bh, ry, BLOCK)
    pt_grid = (
        jnp.zeros((BLOCK, BLOCK), jnp.int32)
        .at[ry_t, rx]
        .set(pt_seq.astype(jnp.int32), mode="drop")
    )
    lit_grid = (
        jnp.zeros((BLOCK, BLOCK, 3), jnp.int32)
        .at[ry_t, rx]
        .set(lit_seq, mode="drop")
    )

    rxs = jnp.arange(BLOCK)

    def row_step(carry, inp):
        prev_row = carry  # [16, 3] current block's previous row (grid coords)
        pt, lit, ridx = inp
        ry_is0 = ridx == 0
        above = jnp.where(ry_is0, pw[0, 1 : BLOCK + 1], prev_row)
        # topleft: (ry>0, rx>0) -> cur; else prev window at [ridx, rx]
        tl_cur = jnp.concatenate([prev_row[:1], prev_row[:-1]], axis=0)
        tl_prev = jax.lax.dynamic_slice(pw, (ridx, 0, 0), (1, BLOCK, 3))[0]
        tl = jnp.where((ry_is0 | (rxs == 0))[:, None], tl_prev, tl_cur)
        prow = jax.lax.dynamic_slice(pw, (ridx + 1, 1, 0), (1, BLOCK, 3))[0]
        left_edge = jax.lax.dynamic_slice(pw, (ridx + 1, 0, 0), (1, 1, 3))[0, 0]

        reset = (
            (pt == PT_LITERAL)
            | (pt == PT_ABOVE)
            | (pt == PT_PREVFRAME)
            | (pt == PT_ABOVELEFT)
        )
        known = jnp.where(
            (pt == PT_ABOVE)[:, None],
            above,
            jnp.where(
                (pt == PT_PREVFRAME)[:, None],
                prow,
                jnp.where((pt == PT_ABOVELEFT)[:, None], tl, lit),
            ),
        )
        d = jnp.where((pt == PT_GRADIENT)[:, None], above - tl, 0)
        # left-propagating types at rx == 0 reset from the prev frame
        at0_left = (rxs == 0) & (pt == PT_LEFT)
        at0_grad = (rxs == 0) & (pt == PT_GRADIENT)
        known = jnp.where(at0_left[:, None], left_edge[None, :], known)
        known = jnp.where(at0_grad[:, None], left_edge[None, :] + above - tl, known)
        reset = reset | at0_left | at0_grad
        a = jnp.where(reset, 0, 1).astype(jnp.int32)
        b = jnp.where(reset[:, None], known, d)
        row = _row_affine(a, b, jnp.zeros((3,), jnp.int32))
        return row, row

    _, rows = jax.lax.scan(
        row_step,
        jnp.zeros((BLOCK, 3), jnp.int32),
        (pt_grid, lit_grid, jnp.arange(BLOCK, dtype=jnp.int32)),
    )
    return rows  # [16, 16, 3]


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def reconstruct_blocks(base, prev, rects, ptypes, rlens, lits, h: int, w: int,
                       bcap: int):
    """Rebuild all data blocks and scatter into a copy of `base`.

    `base` is the motion-applied current frame (scatter target); `prev` is
    the TRUE previous frame — out-of-sub-rect neighbor reads (left edge,
    above row at ry=0, aboveleft column, PT_PREVFRAME) are defined against
    it (`spec.pframe.reconstruct_block_p` reads prev32), NOT against the
    motion-applied intermediate: a motion block left of / above a data
    block would otherwise leak shifted pixels into the predictors.
    rects [bcap,4] (padded rows must have x2<=x1 so they scatter nothing).
    ptypes/rlens [bcap,256], lits [bcap,256,3].
    """
    pp = jnp.pad(prev.astype(jnp.int32), ((1, BLOCK + 1), (1, BLOCK + 1), (0, 0)))

    def per_block(rect, pt, rl, lt):
        x1, y1, x2, y2 = rect[0], rect[1], rect[2], rect[3]
        pw = _win17(pp, x1, y1)
        return _reconstruct_one_block(pw, pt, rl, lt, x1, y1, x2 - x1, y2 - y1)

    grids = jax.vmap(per_block)(rects, ptypes, rlens, lits)  # [bcap,16,16,3]

    ry = jnp.arange(BLOCK)[None, :, None]
    rx = jnp.arange(BLOCK)[None, None, :]
    bw = (rects[:, 2] - rects[:, 0])[:, None, None]
    bh = (rects[:, 3] - rects[:, 1])[:, None, None]
    ys = rects[:, 1][:, None, None] + ry
    xs = rects[:, 0][:, None, None] + rx
    valid = (ry < bh) & (rx < bw)
    flat_idx = jnp.where(valid, ys * w + xs, h * w)
    out = base.astype(jnp.int32).reshape(h * w, 3)
    out = out.at[flat_idx.reshape(-1)].set(
        grids.reshape(-1, 3), mode="drop"
    )
    return out.reshape(h, w, 3).astype(jnp.uint8)


_SECTION_NAMES = ("bt", "sxy", "mv", "rec", "col")
_SECTION_WIDTHS = {"bt": 2, "sxy": 4, "mv": 2, "rec": 2, "col": 3}


@functools.partial(jax.jit, static_argnames=("kts", "batched", "col_w"))
def encode_sections_device(recs_cap, ns, tables, kts, batched: bool = False,
                           col_w: int | None = None, col_bm=None):
    """Fused encode of all five P sections.

    recs_cap: dict name -> [cap, W] capacity record arrays; ns: dict of traced
    counts; kts: tuple of (name, k, t) statics. Returns (bufs, starts, lens
    dicts, tables)."""
    dealt_l, lens_l = [], []
    for name, k, t in kts:
        n = ns[name]
        dealt_l.append(jc.deal_device(recs_cap[name], n, k, t))
        lens_l.append(jc.lane_lens_device(n, k))
    bufs_l, starts_l, tables = jc.encode_sections_auto(
        dealt_l, lens_l, tables, kts, batched, col_w=col_w, col_bm=col_bm
    )
    bufs = {name: b for (name, _, _), b in zip(kts, bufs_l)}
    starts = {name: s for (name, _, _), s in zip(kts, starts_l)}
    lens_out = {name: ln for (name, _, _), ln in zip(kts, lens_l)}
    return bufs, starts, lens_out, tables


@functools.partial(jax.jit, static_argnames=("kts", "caps", "batched"))
def decode_sections_device(payloads, ns, tables, kts, caps,
                           batched: bool = False):
    """Fused decode of all five P sections -> global record arrays."""
    lens_l = [jc.lane_lens_device(ns[name], k) for name, k, _ in kts]
    recs, tables = jc.decode_sections_auto_multi(
        [payloads[name] for name, _, _ in kts], lens_l, tables, kts, batched
    )
    out = {}
    for (name, k, t), cap, scan_out in zip(kts, caps, recs):
        out[name] = jc.undeal_device(scan_out, ns[name], k, cap)
    return out, tables


@functools.partial(jax.jit, static_argnames=("h", "w", "mcap", "bcap"))
def rebuild_frame_device(prev, mo_rects, mo_mvs, d_rects, d_pt, d_rl, d_lt,
                         h: int, w: int, mcap: int, bcap: int):
    """Fused motion-apply + data-block reconstruction."""
    out = apply_motion(prev, prev, mo_rects, mo_mvs, h, w, mcap)
    out = reconstruct_blocks(out, prev, d_rects, d_pt, d_rl, d_lt, h, w, bcap)
    return out


MOTION_DISTINCT_CAP = 12  # shifted-select iterations before gather fallback


def _motion_pixel_maps(rects, mvs, valid_b, h: int, w: int):
    """Per-pixel block-rect membership and MV maps (shared by the
    distinct-MV loop and the gather fallback)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    nbx = -(-w // BLOCK)
    nby = -(-h // BLOCK)
    nb = nbx * nby
    bi = (rects[:, 1] // BLOCK) * nbx + (rects[:, 0] // BLOCK)
    bi = jnp.where(valid_b, bi, nb)
    grid_mv = jnp.zeros((nb + 1, 2), jnp.int32).at[bi].set(mvs, mode="drop")
    grid_rect = jnp.zeros((nb + 1, 4), jnp.int32).at[bi].set(rects, mode="drop")
    grid_is = jnp.zeros((nb + 1,), bool).at[bi].set(valid_b, mode="drop")

    def expand(grid):  # [nb] -> [h, w] per-pixel block value
        # row broadcast at block-grid scale, column expand on the MXU
        # (keeps full-frame tensors minor-w; the direct [nby,16,nbx,16]
        # broadcast relayouts 2M elements into 16-wide minors — see
        # jx.blocks.change_analysis layout note)
        g2 = grid[:nb].reshape(nby, nbx)
        v = jnp.broadcast_to(
            g2[:, None, :].astype(jnp.float32), (nby, BLOCK, nbx)
        ).reshape(nby * BLOCK, nbx)
        return jb._expand_cols(v, w)[:h].astype(grid.dtype)

    rpix = [expand(grid_rect[:, j]) for j in range(4)]
    in_rect = (
        expand(grid_is.astype(jnp.int32)) > 0
    ) & (xs >= rpix[0]) & (xs < rpix[2]) & (ys >= rpix[1]) & (ys < rpix[3])
    mvx_pix = expand(grid_mv[:, 0])
    mvy_pix = expand(grid_mv[:, 1])
    return bi, nb, in_rect, mvx_pix, mvy_pix


def apply_motion_loop(frame, prev, rects, mvs, h: int, w: int, mcap: int):
    """Distinct-MV shifted-select motion apply (the hot path). Returns
    (out, resolved [mcap] bool); blocks left unresolved (beyond
    MOTION_DISTINCT_CAP distinct MVs or out-of-rpad MVs) need
    apply_motion_gather. Split from apply_motion so batched (vmapped)
    decoders can lift the gather fallback to a TOP-LEVEL lax.cond — under
    vmap a per-stream cond flattens to a select and the ~150 ms per-pixel
    gather would run every step (measured at 64x360p)."""
    rpad = 256 + BLOCK  # covers the reference's msr; larger MVs use fallback
    valid_b = rects[:, 2] > rects[:, 0]
    sel_b = (
        valid_b
        & (jnp.abs(mvs[:, 0]) <= rpad) & (jnp.abs(mvs[:, 1]) <= rpad)
    )
    # scatter compacted blocks onto the block grid; expand to pixels by
    # broadcast-reshape (no pixel-granularity gathers — they lower poorly)
    _, _, in_rect, mvx_pix, mvy_pix = _motion_pixel_maps(
        rects, mvs, valid_b, h, w
    )

    prev_pad = jnp.pad(prev, ((rpad, rpad), (rpad, rpad), (0, 0)))
    lin = jnp.arange(mcap)

    def select_body(carry):
        out, resolved, it = carry
        unres = sel_b & ~resolved
        first = jnp.argmin(jnp.where(unres, lin, mcap))
        mv = mvs[first]
        win = jax.lax.dynamic_slice(
            prev_pad, (rpad + mv[1], rpad + mv[0], 0), (h, w, 3)
        )
        same = (mvs[:, 0] == mv[0]) & (mvs[:, 1] == mv[1]) & sel_b
        pixm = in_rect & (mvx_pix == mv[0]) & (mvy_pix == mv[1])
        out = jnp.where(pixm[..., None], win, out)
        return out, resolved | same, it + 1

    def select_cond(carry):
        out, resolved, it = carry
        return (it < MOTION_DISTINCT_CAP) & jnp.any(sel_b & ~resolved)

    out, resolved, _ = jax.lax.while_loop(
        select_cond, select_body,
        (frame, jnp.zeros((mcap,), bool), jnp.int32(0)),
    )
    return out, resolved | ~valid_b


def apply_motion_gather(out, prev, rects, mvs, resolved, h: int, w: int,
                        mcap: int):
    """Per-pixel gather fallback for motion blocks apply_motion_loop left
    unresolved (uncommon or very large MVs)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid_b = rects[:, 2] > rects[:, 0]
    left_b = valid_b & ~resolved
    bi, nb, in_rect, mvx_pix, mvy_pix = _motion_pixel_maps(
        rects, mvs, valid_b, h, w
    )
    nbx = -(-w // BLOCK)
    nby = -(-h // BLOCK)
    leftg = jnp.zeros((nb + 1,), bool).at[bi].set(left_b, mode="drop")
    g = leftg[:nb].reshape(nby, 1, nbx, 1)
    g = jnp.broadcast_to(g, (nby, BLOCK, nbx, BLOCK))
    leftpix = g.reshape(nby * BLOCK, nbx * BLOCK)[:h, :w]
    pixm = in_rect & leftpix
    src = jnp.clip((ys + mvy_pix) * w + xs + mvx_pix, 0, h * w - 1)
    vals = prev.reshape(h * w, 3)[src.reshape(-1)].reshape(h, w, 3)
    return jnp.where(pixm[..., None], vals, out)


@functools.partial(jax.jit, static_argnames=("h", "w", "mcap"))
def apply_motion(frame, prev, rects, mvs, h: int, w: int, mcap: int):
    """Copy motion blocks from prev (shifted) into frame.
    rects [mcap,4]; mvs [mcap,2]; padded rows must have x2<=x1.

    Screen motion is dominated by a handful of distinct MVs (scroll = 1), so
    the hot path iterates distinct MVs applying one whole-frame shifted
    SLICE + masked select each (a [mcap,16,16,3] gather lowers to ~100 ms on
    TPU; slices+selects are ~1 ms). Blocks beyond MOTION_DISTINCT_CAP
    distinct MVs fall back to the gather path inside a lax.cond (real at
    this single-stream level; batched decoders lift it above their vmap)."""
    out, resolved = apply_motion_loop(frame, prev, rects, mvs, h, w, mcap)
    return jax.lax.cond(
        jnp.any(~resolved),
        lambda o: apply_motion_gather(o, prev, rects, mvs, resolved, h, w, mcap),
        lambda o: o,
        out,
    )


# ---------------------------------------------------------------------------
# Device record assembly (encoder) and block resolution (decoder)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def classify_assemble(frame, prev, rects, n_data, h: int, w: int, bcap: int):
    """Classify all data blocks and assemble the global PIX/COL record arrays
    on device (replaces the round-1 host per-block assembly loop).

    rects: [*, 4] absolute sub-rects, first n_data valid; sliced to the
    static bcap inside the program (a host-side `[:bcap]` view would queue
    an extra device op per frame).
    Returns (pix_cap [bcap*256, 2], lit_cap [bcap*256, 3], counts [2]).
    """
    ptypes, rlens, n_recs, lits, is_lit = classify_blocks(
        frame, prev, rects[:bcap], h, w, bcap
    )
    valid_b = jnp.arange(bcap) < n_data
    n_recs = jnp.where(valid_b, n_recs, 0)
    rec_off = jnp.cumsum(n_recs) - n_recs
    slot = jnp.arange(AREA)[None, :]
    valid_slot = slot < n_recs[:, None]
    pcap = bcap * AREA
    tgt = jnp.where(valid_slot, rec_off[:, None] + slot, pcap)
    pix_cap = (
        jnp.zeros((pcap, 2), jnp.int32)
        .at[tgt]
        .set(jnp.stack([ptypes, rlens], axis=-1), mode="drop")
    )
    is_lit = is_lit & valid_slot
    nlit_b = is_lit.sum(axis=1)
    lit_off = jnp.cumsum(nlit_b) - nlit_b
    lit_rank = jnp.cumsum(is_lit, axis=1) - 1
    tgt_l = jnp.where(is_lit, lit_off[:, None] + lit_rank, pcap)
    lit_cap = jnp.zeros((pcap, 3), jnp.int32).at[tgt_l].set(lits, mode="drop")
    n_lit_total = nlit_b.sum()
    col_bm = jc.color_touched_bitmap(lit_cap, n_lit_total)
    counts = jnp.stack(
        [n_recs.sum(), n_lit_total, col_bm.sum()]
    ).astype(jnp.int32)
    return pix_cap, lit_cap, counts, col_bm


def decode_p_resolve(payloads, ns, xx1, xx2, n_data, prev, tables,
                     h: int, w: int, nbx: int, nby: int, kts, caps,
                     mcap: int, bcap: int, batched: bool = False,
                     recs=None):
    """Section scans + BT-run expansion + per-block rect/record resolution
    (everything up to the pixel rebuild). Returns
    ((mo_rects, mo_mvs, d_rects, pt, rlg, lt), err, tables) — the inputs
    rebuild_frame_device needs; split out so batched decoders can vmap the
    resolution but lift rare rebuild fallbacks above the vmap.
    recs: pre-decoded global record arrays (the sp-sharded decoder,
    parallel/mesh.decode_p_sp, supplies them) — skips the section scans."""
    if recs is None:
        recs, tables = decode_sections_device(payloads, ns, tables, kts,
                                              caps, batched=batched)
    bt, sxy, mv = recs["bt"], recs["sxy"], recs["mv"]
    pix, lit = recs["rec"], recs["col"]
    nb = nbx * nby
    err = jnp.int32(0)

    # --- expand BT runs over xx1..xx2 (relative scatter + cumsum) ---
    capbt = bt.shape[0]
    lenr = xx2 - xx1 + 1
    nvals = bt[:, 1]
    bstarts = jnp.cumsum(nvals) - nvals
    marks = jnp.zeros((nb,), jnp.int32).at[
        jnp.where(nvals > 0, bstarts, nb)
    ].add(1, mode="drop")
    ridx = jnp.cumsum(marks) - 1
    relpos = jnp.arange(nb)
    inr = (relpos < lenr) & (ridx >= 0)
    bts_rel = jnp.where(inr, bt[jnp.clip(ridx, 0, capbt - 1), 0], 0)
    err |= jnp.where(jnp.sum(nvals) != lenr, 1, 0)
    rel_of_abs = jnp.arange(nb) - xx1
    bts = jnp.where(
        (rel_of_abs >= 0) & (rel_of_abs < lenr),
        bts_rel[jnp.clip(rel_of_abs, 0, nb - 1)],
        0,
    )

    # --- per-block resolution ---
    is_partial = (bts == BT_PARTIAL_DATA) | (bts == BT_PARTIAL_MOTION)
    is_motion = (bts == BT_FULL_MOTION) | (bts == BT_PARTIAL_MOTION)
    is_data = (bts == BT_FULL_DATA) | (bts == BT_PARTIAL_DATA)
    err |= jnp.where(jnp.sum(is_partial) != ns["sxy"], 2, 0)
    err |= jnp.where(jnp.sum(is_motion) != ns["mv"], 4, 0)
    err |= jnp.where(jnp.sum(is_data) != n_data, 8, 0)

    lin = jnp.arange(nb)
    bxv, byv = lin % nbx, lin // nbx
    x_lo, y_lo = bxv * BLOCK, byv * BLOCK
    x_hi = jnp.minimum(x_lo + BLOCK, w)
    y_hi = jnp.minimum(y_lo + BLOCK, h)
    pidx = jnp.cumsum(is_partial) - 1
    s = sxy[jnp.clip(pidx, 0, sxy.shape[0] - 1)]
    x1 = jnp.where(is_partial, x_lo + s[:, 0], x_lo)
    y1 = jnp.where(is_partial, y_lo + s[:, 1], y_lo)
    x2 = jnp.where(is_partial, x_lo + s[:, 2] + 1, x_hi)
    y2 = jnp.where(is_partial, y_lo + s[:, 3] + 1, y_hi)
    rect_ok = (x1 < x2) & (x2 <= x_hi) & (y1 < y2) & (y2 <= y_hi)
    err |= jnp.where(jnp.any(is_partial & ~rect_ok), 16, 0)

    midx = jnp.cumsum(is_motion) - 1
    m = mv[jnp.clip(midx, 0, mv.shape[0] - 1)]
    mv_ok = (
        (x1 + m[:, 0] >= 0) & (y1 + m[:, 1] >= 0)
        & (x2 + m[:, 0] <= w) & (y2 + m[:, 1] <= h)
    )
    err |= jnp.where(jnp.any(is_motion & ~mv_ok), 32, 0)

    rects_all = jnp.stack([x1, y1, x2, y2], axis=1)
    mo_rects = jnp.zeros((mcap, 4), jnp.int32).at[
        jnp.where(is_motion, midx, mcap)
    ].set(rects_all, mode="drop")
    mo_mvs = jnp.zeros((mcap, 2), jnp.int32).at[
        jnp.where(is_motion, midx, mcap)
    ].set(m, mode="drop")

    didx = jnp.cumsum(is_data) - 1
    d_tgt = jnp.where(is_data, didx, bcap)
    d_rects = jnp.zeros((bcap, 4), jnp.int32).at[d_tgt].set(rects_all, mode="drop")
    areas_nb = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    areas = jnp.zeros((bcap,), jnp.int32).at[d_tgt].set(areas_nb, mode="drop")
    a_start = jnp.cumsum(areas) - areas
    a_end = a_start + areas
    total_area = areas.sum()

    # --- record -> block assignment (searchsorted over area prefix sums) ---
    cappix = pix.shape[0]
    valid_rec = jnp.arange(cappix) < ns["rec"]
    rl = jnp.where(valid_rec, pix[:, 1], 0)
    rstart = jnp.cumsum(rl) - rl
    err |= jnp.where(rl.sum() != total_area, 64, 0)
    j = jnp.searchsorted(a_start, rstart, side="right") - 1
    jc_b = jnp.clip(j, 0, bcap - 1)
    err |= jnp.where(jnp.any(valid_rec & (rstart + rl > a_end[jc_b])), 128, 0)
    rstart_s = jnp.where(valid_rec, rstart, total_area + 1 + jnp.arange(cappix))
    first_rec = jnp.searchsorted(rstart_s, a_start, side="left")
    slot = jnp.arange(cappix) - first_rec[jc_b]
    slot_ok = (slot >= 0) & (slot < AREA)
    err |= jnp.where(jnp.any(valid_rec & ~slot_ok), 256, 0)
    tgt_j = jnp.where(valid_rec & slot_ok, jc_b, bcap)
    tgt_s = jnp.where(valid_rec & slot_ok, slot, 0)
    pt = jnp.zeros((bcap, AREA), jnp.int32).at[tgt_j, tgt_s].set(
        pix[:, 0], mode="drop"
    )
    rlg = jnp.zeros((bcap, AREA), jnp.int32).at[tgt_j, tgt_s].set(rl, mode="drop")
    is_lit_rec = valid_rec & (pix[:, 0] == PT_LITERAL)
    err |= jnp.where(jnp.sum(is_lit_rec) > ns["col"], 512, 0)
    lit_idx = jnp.cumsum(is_lit_rec) - 1
    litv = lit[jnp.clip(lit_idx, 0, lit.shape[0] - 1)]
    lt = jnp.zeros((bcap, AREA, 3), jnp.int32).at[tgt_j, tgt_s].set(
        jnp.where(is_lit_rec[:, None], litv, 0), mode="drop"
    )

    return (mo_rects, mo_mvs, d_rects, pt, rlg, lt), err, tables


@functools.partial(
    kernel_jit,
    static_argnames=("h", "w", "nbx", "nby", "kts", "caps", "mcap", "bcap"),
)
def decode_p_device(payloads, ns, xx1, xx2, n_data, prev, tables,
                    h: int, w: int, nbx: int, nby: int, kts, caps, mcap: int, bcap: int):
    """Fully fused P-frame decode: five section scans, BT-run expansion,
    per-block rect/record resolution (cumsum + searchsorted + scatter — the
    tensor replacement for the reference's serial block walk,
    `DecompressP`, screencap.cpp:1275-1432), motion apply and data-block
    reconstruction. Stream-consistency violations set bits in `err` instead
    of raising (the host raises CorruptStreamError on err != 0)."""
    parts, err, tables = decode_p_resolve(
        payloads, ns, xx1, xx2, n_data, prev, tables, h, w, nbx, nby, kts,
        caps, mcap, bcap,
    )
    out = rebuild_frame_device(prev, *parts, h, w, mcap, bcap)
    return out, err, tables


_P_ERRORS = (
    (1, "block-type runs do not cover xx range"),
    (2, "sub-rect record count mismatch"),
    (4, "motion record count mismatch"),
    (8, "data block count mismatch"),
    (16, "sub-rect outside block"),
    (32, "motion vector out of bounds"),
    (64, "pixel records do not tile data blocks"),
    (128, "pixel record crosses block boundary"),
    (256, "pixel record slot out of range"),
    (512, "pixel records exhausted literals"),
)


def raise_p_error(err: int):
    for bit, msg in _P_ERRORS:
        if err & bit:
            raise bs.CorruptStreamError(msg)
    if err:
        raise bs.CorruptStreamError(f"corrupt P-frame (err={err:#x})")


# ---------------------------------------------------------------------------
# Frame encode / decode
# ---------------------------------------------------------------------------


_CANDS_CACHE: dict = {}


def _cands_rmax(cfg: CodecConfig):
    key = (cfg.msr_x, cfg.msr_y, cfg.msr_low_x, cfg.msr_low_y)
    hit = _CANDS_CACHE.get(key)
    if hit is None:
        cands_np = np.asarray(jb.mv_candidates(cfg), np.int32)
        mlow = int(max(cfg.msr_low_x, cfg.msr_low_y))
        cols = jb.mv_cand_cols(cands_np, cfg.msr_x, cfg.msr_y, mlow)
        rmax = int(max(cfg.msr_x, cfg.msr_y, cfg.msr_low_x, cfg.msr_low_y)) + BLOCK
        hit = (jnp.asarray(cands_np), jnp.asarray(cols), rmax,
               (int(cfg.msr_low_x), int(cfg.msr_low_y)))
        _CANDS_CACHE[key] = hit
    return hit


def encode_p_dispatch(frame, prev, cfg: CodecConfig):
    """Phase A: device analysis + compaction. Returns (arrs, counts_dev)."""
    h, w = cfg.height, cfg.width
    cands, cols, rmax, lows = _cands_rmax(cfg)
    nbp = next_pow2(cfg.nbx * cfg.nby)
    arrs, counts, flat = jb.analyze_compact(
        frame, prev, cands, cols, h, w, cfg.nby, cfg.nbx, rmax, nbp,
        cfg.msr_x, cfg.msr_y, lows[0], lows[1],
    )
    return arrs, counts, flat


def _map_chunk(h: int, w: int):
    """lax.map batch_size for per-frame analysis. None (default) = pure
    scan: analyze_compact's idle/small/dense tiers stay REAL branches per
    frame (any chunked vmap flattens lax.cond to a select, making every
    frame — idle ones included — pay the dense path: measured 15.5 ms/frame
    at batch_size=1 vs 6.5 scan on TPU v5e, and ~1.5 with the vectorized
    pre-sweep + unresolved-count tiers). SPTC_MAP_CHUNK=N forces a chunked
    vmap for A/B runs."""
    import os

    env = os.environ.get("SPTC_MAP_CHUNK")
    if env and int(env) > 0:
        return int(env)
    return None


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y", "low_x", "low_y"))
def _p_dispatch_map(frames, prevs, cands, cols, h, w, nby, nbx, rmax, nbp,
                    msr_x, msr_y, low_x, low_y):
    def one(fp):
        f, p = fp
        arrs, counts, flat = jb.analyze_compact(
            f, p, cands, cols, h, w, nby, nbx, rmax, nbp, msr_x, msr_y,
            low_x, low_y
        )
        return arrs, jnp.concatenate([counts, flat])

    return jax.lax.map(one, (frames, prevs), batch_size=_map_chunk(h, w))


@functools.partial(jax.jit, static_argnames=("m",))
def unstack_rows(arrs, m: int):
    """Split stacked per-frame analysis arrays into m per-frame pytrees in
    ONE device program. The per-row `tree.map(lambda a: a[j], ...)` host loop
    it replaces issued one device op per frame per array (batch of 15 = 60
    dispatches ≈ 240 ms over the TPU tunnel, where each async dispatch costs
    ~1-4 ms regardless of size). Callers pass m = pow2 batch cap so the
    program cache holds a handful of entries."""
    return [jax.tree.map(lambda a, j=j: a[j], arrs) for j in range(m)]


def encode_p_dispatch_batch(pairs, cfg: CodecConfig):
    """Phase A for many P frames in ONE device program.

    `pairs`: list of (frame, prev) device arrays. Returns (arrs_stacked,
    counts_stacked) with a leading batch axis of len(pairs).

    lax.map (scan) keeps analyze_compact's idle/small/full probe tiers as
    real runtime branches per frame (vmap would flatten them to selects and
    pay the dense path for idle frames), and a single program sidesteps the
    per-program completion round-trips that a deep queue of small programs
    costs on a thin host<->device link. The batch axis is padded to a pow2
    bucket with (last, last) idle pairs (near-zero marginal device time) so
    batch sizes don't multiply compile cache entries.
    """
    from screenpressor_tpu.jx.transfer import pow2_bucket

    h, w = cfg.height, cfg.width
    cands, cols, rmax, lows = _cands_rmax(cfg)
    nbp = next_pow2(cfg.nbx * cfg.nby)
    m = len(pairs)
    cap = pow2_bucket(m)
    pad = [(pairs[-1][0], pairs[-1][0])] * (cap - m)
    frames = jnp.stack([f for f, _ in pairs] + [f for f, _ in pad])
    prevs = jnp.stack([p for _, p in pairs] + [p for _, p in pad])
    arrs, counts = _p_dispatch_map(
        frames, prevs, cands, cols, h, w, cfg.nby, cfg.nbx, rmax, nbp,
        cfg.msr_x, cfg.msr_y, lows[0], lows[1],
    )
    return arrs, counts


@functools.partial(kernel_jit,
                   static_argnames=("kts", "caps", "raw_threshold", "batched",
                                    "col_w"))
def encode_sections_raw(sources, hdr_vals, tables, kts, caps,
                        raw_threshold: int, batched: bool = False,
                        col_w: int | None = None, col_bm=None):
    """encode_sections_device + exact container size + raw-escape table
    select on device (the host applies the identical size rule when it
    assembles the container, so the table chain never waits on a pull).

    sources: dict name -> FULL record arrays (sliced to the static `caps`
    inside the program: the host-side `arr[:cap]` views this replaces cost
    one queued device op each, ~5 tunnel-dispatched ops per frame).
    hdr_vals: [8] int32 vector of the P header fields (xx1, xx2, n_bt,
    n_sxy, n_mv, n_pix, n_lit, n_data) — the single per-frame upload; the
    per-section counts are read from it on device."""
    from screenpressor_tpu.jx.iframe import section_bytes_device, varint_len_device
    from screenpressor_tpu.jx.tables import renew_tables

    recs_cap = {
        name: sources[name][:cap] for (name, _, _), cap in zip(kts, caps)
    }
    ns = {
        name: hdr_vals[i]
        for i, name in zip((2, 3, 4, 5, 6), _SECTION_NAMES)
    }
    bufs, starts, lens_out, tables2 = encode_sections_device(
        recs_cap, ns, tables, kts, batched=batched, col_w=col_w,
        col_bm=col_bm)
    total = jnp.int32(2) + varint_len_device(hdr_vals).sum()
    for name, k, t in kts:
        total = total + section_bytes_device(
            starts[name], lens_out[name], bufs[name].shape[1], k
        )
    is_raw = total >= raw_threshold
    renewed = renew_tables()
    sel = jax.tree.map(lambda a, b: jnp.where(is_raw, a, b), renewed, tables2)
    stats = jnp.stack([total, is_raw.astype(jnp.int32)])
    return bufs, starts, lens_out, stats, sel


def encode_p_classify(frame, prev, arrs, counts_host, cfg: CodecConfig):
    """Phase B: classify + assemble PIX/COL records for data blocks.
    Returns None when the frame has no data blocks, else
    (pix_cap, lit_cap, pl_counts_dev)."""
    h, w = cfg.height, cfg.width
    n_data = int(counts_host[6])
    if not n_data:
        return None
    bcap = next_pow2(n_data)
    return classify_assemble(
        frame, prev, arrs["data_rects"], np.int32(n_data), h, w, bcap
    )


def encode_p_sections(arrs, counts_host, phase_b, pl_counts_host, tables,
                      cfg: CodecConfig):
    """Phase C: section encode with device-side raw select.
    Returns (handle, tables') where handle carries everything
    `assemble_p_container` needs."""
    any_ch, xx1, xx2, n_bt, n_sxy, n_mv, n_data = (int(v) for v in counts_host[:7])
    if phase_b is not None:
        pix_cap, lit_cap, col_bm = phase_b[0], phase_b[1], phase_b[3]
        n_pix, n_lit, n_ctouch = (int(v) for v in pl_counts_host[:3])
    else:
        pix_cap = jnp.zeros((1, 2), jnp.int32)
        lit_cap = jnp.zeros((1, 3), jnp.int32)
        col_bm = None
        n_pix = n_lit = 0
        n_ctouch = 1

    nums = {"bt": n_bt, "sxy": n_sxy, "mv": n_mv, "rec": n_pix, "col": n_lit}
    sources = {
        "bt": arrs["bt"], "sxy": arrs["sxy"], "mv": arrs["mv"],
        "rec": pix_cap, "col": lit_cap,
    }
    kts, caps = [], []
    for name in _SECTION_NAMES:
        n = nums[name]
        k = cfg.lanes(n)
        t = jc._pad_steps(-(-n // k)) if n else 1
        kts.append((name, k, t))
        caps.append(min(pad_cap(n), sources[name].shape[0]))
    raw_threshold = 1 + cfg.width * cfg.height * 3
    hdr_vals = np.asarray(
        [xx1, xx2, n_bt, n_sxy, n_mv, n_pix, n_lit, n_data], np.int32
    )
    col_w = jc.col_compact_bucket(n_ctouch)
    bufs, starts, lens_l, stats, tables = encode_sections_raw(
        sources, hdr_vals, tables, tuple(kts), tuple(caps), raw_threshold,
        col_w=col_w,
        col_bm=col_bm if col_w is not None else None,
    )
    handle = (kts, nums, (xx1, xx2, n_data), bufs, starts, lens_l, stats)
    return handle, tables


def assemble_p_container(handle, bufs_host, starts_host, lens_host):
    """Assembles the P-frame bytes from pulled buffers (host)."""
    kts, nums, (xx1, xx2, n_data), _bufs, _starts, _lens, _stats = handle
    sections = []
    for name, k, t in kts:
        blobs = [
            bytes(bufs_host[name][i, starts_host[name][i] :].tobytes())
            if lens_host[name][i] > 0 else b""
            for i in range(k)
        ]
        sections.append(bs.pack_section(blobs))
    return b"".join(
        [
            bytes([bs.header_byte(ALG_P)]),
            bytes([1]),
            bs.pack_varint(
                xx1, xx2, nums["bt"], nums["sxy"], nums["mv"],
                nums["rec"], nums["col"], n_data,
            ),
        ]
        + sections
    )


def encode_p(frame, prev, tables, cfg: CodecConfig):
    """Single-frame P encode (3 pulls; the batch API in jx.codec amortizes
    these syncs across frames). Raw escape is handled by the caller
    (jx.codec), which compares len(data) against the raw threshold — the
    device-side table select in encode_sections_raw applies the same rule."""
    frame = jnp.asarray(frame)
    prev = jnp.asarray(prev)
    arrs, counts, _flat = encode_p_dispatch(frame, prev, cfg)
    counts_host = np.asarray(counts)
    if not int(counts_host[0]):
        return bytes([bs.header_byte(ALG_P)]) + bytes([0]), tables
    phase_b = encode_p_classify(frame, prev, arrs, counts_host, cfg)
    pl_host = np.asarray(phase_b[2]) if phase_b is not None else None
    handle, tables = encode_p_sections(arrs, counts_host, phase_b, pl_host, tables, cfg)
    bufs, starts, lens_l = jax.device_get((handle[3], handle[4], handle[5]))
    data = assemble_p_container(handle, bufs, starts, lens_l)
    return data, tables


def parse_p_header(data: bytes, pos: int, cfg: CodecConfig):
    """Host-side container parse + validation. Returns None for a no-change
    frame, else (payloads, ns, kts, caps, header) ready for decode_p_device."""
    if pos >= len(data):
        raise bs.CorruptStreamError("truncated P-frame")
    flags = data[pos]
    pos += 1
    if not flags & 1:
        return None
    (xx1, xx2, n_bt, n_sxy, n_mv, n_pix, n_lit, n_data), pos = bs.read_varint(data, pos, 8)
    nb = cfg.nbx * cfg.nby
    if not (xx1 <= xx2 < nb):
        raise bs.CorruptStreamError("xx block range out of bounds")
    if max(n_bt, n_sxy, n_mv, n_data) > nb or n_pix > nb * AREA or n_lit > n_pix:
        raise bs.CorruptStreamError("section counts out of bounds")
    if n_bt == 0:
        raise bs.CorruptStreamError("empty block-type section")
    counts = {"bt": n_bt, "sxy": n_sxy, "mv": n_mv, "rec": n_pix, "col": n_lit}
    kts, caps, payloads, ns = [], [], {}, {}
    for name in _SECTION_NAMES:
        n = counts[name]
        k = cfg.lanes(n)
        blobs, pos = bs.unpack_section(data, pos, k)
        t = jc._pad_steps(-(-n // k)) if n else 1
        kts.append((name, k, t))
        caps.append(pad_cap(n))
        max_len = max(max((len(b) for b in blobs), default=0), 4)
        pay = np.zeros((k, next_pow2(max_len)), np.uint8)
        for i, b in enumerate(blobs):
            pay[i, : len(b)] = np.frombuffer(b, np.uint8)
        payloads[name] = pay
        ns[name] = n
    return payloads, ns, tuple(kts), tuple(caps), (xx1, xx2, n_mv, n_data)


def decode_p(data: bytes, pos: int, prev, tables, cfg: CodecConfig):
    parsed = parse_p_header(data, pos, cfg)
    if parsed is None:
        return jnp.asarray(prev), tables
    payloads, ns, kts, caps, (xx1, xx2, n_mv, n_data) = parsed
    mcap = pad_cap(n_mv)
    bcap = pad_cap(n_data)
    out, err, tables = decode_p_device(
        payloads, ns, np.int32(xx1), np.int32(xx2), np.int32(n_data),
        jnp.asarray(prev), tables,
        cfg.height, cfg.width, cfg.nbx, cfg.nby, kts, caps, mcap, bcap,
    )
    err = int(err)
    if err:
        raise_p_error(err)
    return out, tables
