"""P-frame block analysis — JAX implementation.

Byte-equivalent to `spec/blocks.py`. The reference's per-block sequential
heuristics (`DecideBlockTypes`/`FindMV`, `screencap.cpp:684-1087`) become:
change mask + block reductions for the change map and sub-rects, and a
`lax.scan` over a static prioritized candidate list for motion — each step is
one whole-frame shifted comparison plus per-block reductions (no gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu.config import BLOCK, CodecConfig
from screenpressor_tpu.spec.blocks import mv_candidates  # shared encoder policy

# Motion probe small-edit tier: frames with at most this many changed blocks
# probe only those blocks (see motion_search_pruned). Perf knob only — the
# coded bitstream is identical either way.
_PROBE_SMALL_CAP = 512


def _memb_x(w: int, nbx: int):
    """[w, nbx] 0/1 f32 block-column membership (x // BLOCK == bx)."""
    return (
        jnp.arange(w)[:, None] // BLOCK == jnp.arange(nbx)[None, :]
    ).astype(jnp.float32)


def _expand_cols(vals_hb, w: int):
    """[rows, nbx] integer-valued f32 -> [rows, w] per-pixel-column values
    via one MXU matmul with the one-hot membership (each output is a single
    input value — exact at any precision; HIGHEST keeps the f32 operand
    intact, values exceed bf16's integer range)."""
    nbx = vals_hb.shape[1]
    memb = _memb_x(w, nbx).T  # [nbx, w]
    return jax.lax.dot(vals_hb, memb, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("h", "w", "nby", "nbx"))
def change_analysis(frame, prev, h: int, w: int, nby: int, nbx: int):
    """-> (block_changed [nby,nbx], rects [nby,nbx,4] absolute sub-rects,
    subrect_mask [h,w]).

    Layout note: all full-frame tensors keep the pixel column as the minor
    dimension; per-block column reductions ride the MXU (0/1 membership
    matmul) and bound expansion is one matmul per bound. The direct
    [nby,16,nbx,16] formulation relayouts 2M-element tensors into 16-wide
    minors (1/8 VPU lane utilization) and measured 5.4 ms/frame at 1080p —
    the single largest analysis cost (round-5 phase_a_probe)."""
    diff = jnp.any(frame != prev, axis=-1)  # [h, w]
    hp, wp = nby * BLOCK, nbx * BLOCK
    diff_p = jnp.zeros((hp, w), bool).at[:h].set(diff)
    # per-(pixel-row, block-col) change counts on the MXU (0/1 operands,
    # f32 accumulate -> exact)
    colcnt = jax.lax.dot(
        diff_p.astype(jnp.float32), _memb_x(w, nbx),
        preferred_element_type=jnp.float32,
    )  # [hp, nbx]
    rows_any = colcnt > 0.5
    ra3 = rows_any.reshape(nby, BLOCK, nbx)
    r = jnp.arange(BLOCK)[None, :, None]
    y1r = jnp.min(jnp.where(ra3, r, BLOCK), axis=1)
    y2r = jnp.max(jnp.where(ra3, r + 1, 0), axis=1)
    changed = y2r > 0

    rowblk = diff_p.reshape(nby, BLOCK, w).any(axis=1)  # [nby, w] minor-w
    rb = jnp.zeros((nby, wp), bool).at[:, :w].set(rowblk).reshape(
        nby, nbx, BLOCK
    )
    c = jnp.arange(BLOCK)[None, None, :]
    x1r = jnp.min(jnp.where(rb, c, BLOCK), axis=2)
    x2r = jnp.max(jnp.where(rb, c + 1, 0), axis=2)

    bx = jnp.arange(nbx)[None, :]
    by = jnp.arange(nby)[:, None]
    rects = jnp.stack(
        [bx * BLOCK + x1r, by * BLOCK + y1r, bx * BLOCK + x2r, by * BLOCK + y2r],
        axis=-1,
    ).astype(jnp.int32)

    # per-pixel sub-rect bounds: expand block rows by broadcast-reshape
    # (block-grid-sized tensors), block cols by MXU matmul; the final mask
    # compares stay in [hp, w] minor-w layout
    def rowexp(vals):  # [nby, nbx] -> [hp, nbx] f32
        return jnp.broadcast_to(
            vals[:, None, :].astype(jnp.float32), (nby, BLOCK, nbx)
        ).reshape(hp, nbx)

    x1p = _expand_cols(rowexp(rects[..., 0]), w)
    y1p = _expand_cols(rowexp(rects[..., 1]), w)
    x2p = _expand_cols(rowexp(rects[..., 2]), w)
    y2p = _expand_cols(rowexp(rects[..., 3]), w)
    chp = _expand_cols(rowexp(changed), w)
    ys = jnp.arange(hp, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    in_sub = (
        (ys >= y1p) & (ys < y2p) & (xs >= x1p) & (xs < x2p) & (chp > 0.5)
    )
    return changed, rects, in_sub[:h]


def block_any_px(px_hw, h: int, w: int, nby: int, nbx: int):
    """[h, w] bool -> [nby, nbx] per-16x16-block any, staged so the
    full-frame reduction keeps the pixel column minor (see change_analysis
    layout note)."""
    hp, wp = nby * BLOCK, nbx * BLOCK
    p = jnp.zeros((hp, w), bool).at[:h].set(px_hw)
    rowblk = p.reshape(nby, BLOCK, w).any(axis=1)  # [nby, w]
    q = jnp.zeros((nby, wp), bool).at[:, :w].set(rowblk)
    return q.reshape(nby, nbx, BLOCK).any(axis=2)


@functools.partial(jax.jit, static_argnames=("h", "w", "nby", "nbx", "rmax"))
def motion_search(frame, prev, rects, in_sub, changed, cands, h, w, nby, nbx, rmax):
    """First matching candidate per block (spec.find_mv order).

    cands: [C, 2] int32 (mx, my) in spec priority order.
    Returns choice [nby, nbx] int32 (C = no match).
    """
    c_count = cands.shape[0]
    prev_pad = jnp.pad(
        prev.astype(jnp.int16),
        ((rmax, rmax), (rmax, rmax), (0, 0)),
        constant_values=-1,  # never equals a real pixel
    )
    fr = frame.astype(jnp.int16)
    x1, y1, x2, y2 = rects[..., 0], rects[..., 1], rects[..., 2], rects[..., 3]

    def body(carry):
        best, ci = carry
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.lax.dynamic_slice(
            prev_pad, (rmax + my, rmax + mx, 0), (h, w, 3)
        )
        neq = jnp.any(win != fr, axis=-1)
        bad = block_any_px(neq & in_sub, h, w, nby, nbx)
        inb = (x1 + mx >= 0) & (x2 + mx <= w) & (y1 + my >= 0) & (y2 + my <= h)
        match = changed & inb & ~bad
        best = jnp.where(match & (best == c_count), ci, best)
        return best, ci + 1

    def cond(carry):
        best, ci = carry
        # stop early once every changed block has found a match (skipped
        # candidates cannot change already-resolved blocks)
        return (ci < c_count) & jnp.any(changed & (best == c_count))

    best0 = jnp.full((nby, nbx), c_count, jnp.int32)
    best, _ = jax.lax.while_loop(cond, body, (best0, jnp.int32(0)))
    return best


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap", "rmax"))
def motion_search_windowed(frame, prev, rects, valid, masks, cands, h, w, bcap, rmax):
    """Per-block windowed variant of motion_search for sparse change maps:
    gathers 16x16 windows per (block, candidate) instead of whole-frame
    shifted compares. Identical first-match policy/results.

    rects: [bcap,4]; valid: [bcap]; masks: [bcap,16,16] in-sub-rect masks.
    """
    c_count = cands.shape[0]
    fpad = jnp.pad(
        frame.astype(jnp.int16), ((0, BLOCK), (0, BLOCK), (0, 0)), constant_values=-2
    )
    ppad = jnp.pad(
        prev.astype(jnp.int16),
        ((rmax, rmax + BLOCK), (rmax, rmax + BLOCK), (0, 0)),
        constant_values=-1,
    )
    x1, y1, x2, y2 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    cur = jax.vmap(
        lambda xx, yy: jax.lax.dynamic_slice(fpad, (yy, xx, 0), (BLOCK, BLOCK, 3))
    )(x1, y1)

    def body(carry):
        best, ci = carry
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.vmap(
            lambda xx, yy: jax.lax.dynamic_slice(
                ppad, (rmax + yy + my, rmax + xx + mx, 0), (BLOCK, BLOCK, 3)
            )
        )(x1, y1)
        neq = jnp.any(win != cur, axis=-1)
        bad = jnp.any(neq & masks, axis=(1, 2))
        inb = (x1 + mx >= 0) & (x2 + mx <= w) & (y1 + my >= 0) & (y2 + my <= h)
        match = valid & inb & ~bad
        return jnp.where(match & (best == c_count), ci, best), ci + 1

    def cond(carry):
        best, ci = carry
        return (ci < c_count) & jnp.any(valid & (best == c_count))

    best0 = jnp.full((bcap,), c_count, jnp.int32)
    best, _ = jax.lax.while_loop(cond, body, (best0, jnp.int32(0)))
    return best


def _diag_windows(a, step: int, width: int):
    """out[..., r, j] = a[..., r, step*r + j] for j < width — pure reshape.

    a: [..., R, L] with step*(R-1) + width <= L. Flattening the R rows
    (stride L) and re-slicing at stride L+step shifts each row's origin by
    `step`, turning the per-row sliding window into a static slice: zero
    gather ops (TPU point/row gathers cost ~2 us per row; this is free).
    """
    *lead, rr, ll = a.shape
    assert step * (rr - 1) + width <= ll, (step, rr, width, ll)
    flat = a.reshape(*lead, rr * ll)
    s = ll + step
    pad = s * rr - rr * ll
    flat = jnp.concatenate(
        [flat, jnp.full((*lead, pad), -1, a.dtype)], axis=-1
    )
    return flat.reshape(*lead, rr, s)[..., :width]


def _shift_select(eq, r, width: int):
    """out[..., b, u] = eq[..., b, u + r[b]] for u < width, r in [0, BLOCK).

    The probe's position inside its 16x16 block only takes BLOCK values, so
    a per-row dynamic shift becomes BLOCK static slices blended by masks
    (XLA fuses them into one pass) — no gather.
    """
    out = jnp.zeros(eq.shape[:-1] + (width,), bool)
    for s in range(BLOCK):
        out = out | ((r == s)[..., None] & eq[..., s : s + width])
    return out


def _rarity_probes(fr2d, pv2d, diff, h: int, w: int, nby: int, nbx: int):
    """Two rarity-selected changed-pixel probe indices per block.

    A probe whose frame value is common in `prev` (background) matches at
    most offsets and prunes nothing; a block left unresolved by such probes
    keeps the candidate sweep alive for its full plausible set. Quantize to
    RGB555, find the top-4 dominant colors of a 4x-subsampled prev
    histogram, and per block prefer changed pixels outside that set —
    tie-broken by smallest (p1) / largest (p2) flat index. Returns
    (p1, p2) [nby, nbx] int32 flat indices (0 for unchanged blocks).
    """
    q = ((fr2d >> 3) & 0x1F) | ((fr2d >> 6) & 0x3E0) | ((fr2d >> 9) & 0x7C00)
    qp = ((pv2d >> 3) & 0x1F) | ((pv2d >> 6) & 0x3E0) | ((pv2d >> 9) & 0x7C00)
    # ::8 subsample: dominant-color ranking is robust to it, and the
    # scatter-add histogram is this function's dominant cost (prune-quality
    # knob only — never changes bytes)
    sub = qp[::8, ::8].reshape(-1)
    hist = jnp.zeros((32768,), jnp.int32).at[sub].add(1)
    _, doms = jax.lax.top_k(hist, 4)
    common = jnp.any(q[:, :, None] == doms[None, None, :], axis=-1)
    bits = max((h * w - 1).bit_length(), 1)
    big = jnp.int32(1) << (bits + 1)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    key1 = jnp.where(diff, (common.astype(jnp.int32) << bits) | idx, big)
    key2 = jnp.where(
        diff, (common.astype(jnp.int32) << bits) | (h * w - 1 - idx), big
    )

    def block_min(k):
        # two-stage block reduce, minor-w first (see change_analysis)
        pad = jnp.full((nby * BLOCK, w), big, jnp.int32).at[:h].set(k)
        rowmin = pad.reshape(nby, BLOCK, w).min(axis=1)  # [nby, w]
        q = jnp.full((nby, nbx * BLOCK), big, jnp.int32).at[:, :w].set(rowmin)
        return q.reshape(nby, nbx, BLOCK).min(axis=2)

    mask = (jnp.int32(1) << bits) - 1
    p1 = jnp.clip(block_min(key1) & mask, 0, h * w - 1)
    p2 = jnp.clip((h * w - 1) - (block_min(key2) & mask), 0, h * w - 1)
    return p1, p2


def _fold16(v):
    """24-bit packed pixel -> int16 prune key. Collisions only ADD plausible
    candidates (the exact verify rejects them), so folding is bitstream-
    neutral; it halves the traffic of the dense probe select-chains."""
    return (v ^ (v >> 13)).astype(jnp.int16)


def _probe_ok_dense(pv2d, fr_pack, probes2, h: int, w: int, nby: int,
                    nbx: int, msr_x: int, msr_y: int, mlow: int):
    """[nb, ncol] dual-probe plausibility rows, gather-free.

    probes2: (p1, p2) flat probe indices per block — BOTH probes are
    evaluated in one pass so the sliced prev tensors (the dominant traffic)
    are read once. Replaces per-block window gathers (~2 us/row on TPU:
    44 ms at 1080p) with dense reshape extractions whose cost depends only
    on the frame area:
      - the probe's block index is static per row, so each block's
        candidate window is a `_diag_windows` strided reshape;
      - the probe's position inside the block takes only BLOCK values, so
        a where-chain of BLOCK static slices selects the probe row/column
        and `_shift_select` aligns the compare result;
      - compares run on int16-folded values (`_fold16`) — prune-only, so
        fold collisions are bitstream-safe.
    Rows of unchanged blocks are garbage; callers mask with the change map.
    """
    nb = nby * nbx
    wsz = 2 * mlow + 1
    neg1 = jnp.int16(-1)
    pv16 = _fold16(pv2d)

    rxs, rys, frp = [], [], []
    for pflat in probes2:
        px = (pflat % w).reshape(nby, nbx)
        py = (pflat // w).reshape(nby, nbx)
        rxs.append(px - jnp.arange(nbx)[None, :] * BLOCK)  # in [0, BLOCK)
        rys.append(py - jnp.arange(nby)[:, None] * BLOCK)
        frp.append(_fold16(fr_pack[pflat]).reshape(nby, nbx))

    # ---- vertical candidates: dy in [-msr_y, msr_y) ----
    lc = max(h + 2 * msr_y, BLOCK * (nby - 1) + 2 * msr_y + BLOCK)
    pvt = jnp.full((nbx * BLOCK, lc), neg1).at[:w, msr_y : msr_y + h].set(
        pv16.T
    )
    t16 = pvt.reshape(nbx, BLOCK, lc)
    col_ok = None
    for rx, ry, fp in zip(rxs, rys, frp):
        # c1[by, bx, y] = pvT[bx*16 + rx[by,bx], y]: rx takes only BLOCK
        # values, so a where-chain of BLOCK static slices replaces the gather
        c1 = jnp.broadcast_to(t16[None, :, 0, :], (nby, nbx, lc))
        for s in range(1, BLOCK):
            c1 = jnp.where((rx == s)[..., None], t16[None, :, s, :], c1)
        vc = _diag_windows(
            c1.transpose(1, 0, 2), BLOCK, 2 * msr_y + BLOCK
        ).transpose(1, 0, 2)  # [nby, nbx, 2*msr_y + 16]
        eqc = vc == fp[..., None]
        ok = _shift_select(eqc, ry, 2 * msr_y).reshape(nb, 2 * msr_y)
        col_ok = ok if col_ok is None else (col_ok & ok)

    # ---- horizontal candidates: dx in [-msr_x, msr_x) ----
    lr = max(w + 2 * msr_x, BLOCK * (nbx - 1) + 2 * msr_x + BLOCK)
    pvh = jnp.full((nby * BLOCK, lr), neg1).at[:h, msr_x : msr_x + w].set(
        pv16
    )
    h16 = pvh.reshape(nby, BLOCK, lr)
    row_ok = None
    for rx, ry, fp in zip(rxs, rys, frp):
        r1 = jnp.broadcast_to(h16[:, None, 0, :], (nby, nbx, lr))
        for s in range(1, BLOCK):
            r1 = jnp.where((ry == s)[..., None], h16[:, None, s, :], r1)
        vr = _diag_windows(r1, BLOCK, 2 * msr_x + BLOCK)
        eqr = vr == fp[..., None]
        ok = _shift_select(eqr, rx, 2 * msr_x).reshape(nb, 2 * msr_x)
        row_ok = ok if row_ok is None else (row_ok & ok)

    # ---- low window: (dy, dx) in [-mlow, mlow]^2 (mlow <= 8) ----
    hb, wb = nby * BLOCK, nbx * BLOCK
    pvw = jnp.full((hb + 2 * BLOCK, wb + 2 * BLOCK), neg1).at[
        mlow : mlow + h, mlow : mlow + w
    ].set(pv16)
    ty = pvw.reshape(nby + 2, BLOCK, wb + 2 * BLOCK)
    w32 = jnp.concatenate([ty[:-2], ty[1:-1]], axis=1)  # [nby, 32, wb+32]
    tx = w32.reshape(nby, 2 * BLOCK, nbx + 2, BLOCK)
    w32x = jnp.concatenate([tx[..., :-2, :], tx[..., 1:-1, :]], axis=-1)
    win_ok = None
    for rx, ry, fp in zip(rxs, rys, frp):
        # [nby, 32, nbx, 32]; row u = pv2d[16*by + u - mlow], col e likewise
        eqw = w32x == fp[:, None, :, None]
        # ry-select rows (u = ry + d, d in [0, wsz)):
        wy = jnp.zeros((nby, wsz, nbx, 2 * BLOCK), bool)
        for s in range(BLOCK):
            wy = wy | ((ry == s)[:, None, :, None] & eqw[:, s : s + wsz])
        # rx-select cols (e = rx + i, i in [0, wsz)):
        ww = jnp.zeros((nby, wsz, nbx, wsz), bool)
        for s in range(BLOCK):
            ww = ww | ((rx == s)[:, None, :, None] & wy[..., s : s + wsz])
        ok = ww.transpose(0, 2, 1, 3).reshape(nb, wsz * wsz)
        win_ok = ok if win_ok is None else (win_ok & ok)

    return jnp.concatenate([col_ok, row_ok, win_ok], axis=1)


def _mv_cands_static(msr_x: int, msr_y: int, low_x: int, low_y: int):
    """Trace-time candidate list (python ints) for static-slice pre-sweeps.
    Must equal spec.mv_candidates for the same config — guaranteed by
    calling it."""
    import types

    cfg = types.SimpleNamespace(
        msr_x=msr_x, msr_y=msr_y, msr_low_x=low_x, msr_low_y=low_y
    )
    return mv_candidates(cfg)


def motion_search_pruned(frame, prev, rects, in_sub, changed, probes, cands,
                         h: int, w: int, nby: int, nbx: int, rmax: int,
                         cand_cols, msr_x: int, msr_y: int, low_x: int,
                         low_y: int, force_dense: bool = False):
    """First-match motion search: vectorized pre-sweep + probe pre-screen.

    Stage 1 (pre-sweep): the first PRE spec-order candidates are verified
    for every changed block in one vectorized pass — candidates are static
    python values, so each shifted compare is a static slice (no loop
    sequencing, ~25 us each at 1080p). Screen content (scrolls, window
    moves) usually resolves here.
    Stage 2: blocks still unresolved take a probe-pruned sweep over the
    remaining candidates. Tier by UNRESOLVED count (a 6000-changed-block
    scroll usually leaves <100 unresolved):
      - small tier (<= _PROBE_SMALL_CAP unresolved): per-block window
        gathers for dual probes AND for sweep verification (~20 us per
        candidate vs ~190 us whole-frame);
      - dense tier: rarity-selected dual probes (`_rarity_probes`) +
        gather-free probe matrix (`_probe_ok_dense`) + whole-frame verify.
    Identical choice to spec.find_mv (same order, full verification before
    acceptance): probe pruning is bitstream-neutral because a block that
    truly matches a candidate MV matches at every changed pixel, so a probe
    only removes candidates the full verify would reject anyway. Both sweeps
    track per-block LAST plausible indices so blocks with no remaining
    plausible candidate are dead and cannot keep the sweep alive.

    probes: pair of [nby, nbx] flat indices of changed pixels per block
    (first and last changed pixel; used by the small tier).
    cand_cols: [C] static column of each candidate in the concatenated
    [vert | horz | window] ok-matrix (host-computed).
    force_dense: static flag for vmapped callers (serving) — lax.cond
    flattens to a select under vmap, so the tier cond would run BOTH tiers
    per stream; dense-only keeps one code path.
    Returns choice [nby, nbx] int32 (C = no match).
    """
    mlow = max(low_x, low_y)
    c_count = cands.shape[0]
    cands_np = _mv_cands_static(msr_x, msr_y, low_x, low_y)
    assert len(cands_np) == c_count, (len(cands_np), c_count)
    nb = nby * nbx
    rects_f = rects.reshape(nb, 4)
    x1, y1, x2, y2 = (rects_f[:, 0], rects_f[:, 1], rects_f[:, 2],
                      rects_f[:, 3])

    # channel-packed pixels (packed value >= 0; pad sentinel -1 never matches)
    f32p = frame.astype(jnp.int32)
    p32p = prev.astype(jnp.int32)
    fr2d = f32p[..., 0] | (f32p[..., 1] << 8) | (f32p[..., 2] << 16)
    pv2d = p32p[..., 0] | (p32p[..., 1] << 8) | (p32p[..., 2] << 16)
    fr_pack = fr2d.reshape(-1)
    wsz = 2 * mlow + 1
    ncol = 2 * msr_y + 2 * msr_x + wsz * wsz
    pvT = jnp.pad(pv2d.T, ((0, 0), (msr_y, msr_y)), constant_values=-1)
    pvH = jnp.pad(pv2d, ((0, 0), (msr_x, msr_x)), constant_values=-1)
    pvW = jnp.pad(pv2d, ((mlow, mlow), (mlow, mlow)), constant_values=-1)

    def probe_rows(pflat):
        """[m] flat probe indices -> [m, ncol] plausibility rows."""
        px = pflat % w
        py = pflat // w
        fr_probe = fr_pack[pflat]  # [m]
        col = jax.vmap(
            lambda xx, yy: jax.lax.dynamic_slice(pvT, (xx, yy), (1, 2 * msr_y))[0]
        )(px, py)  # [m, 2*msr_y]: dy in [-msr_y, msr_y-1]
        row = jax.vmap(
            lambda xx, yy: jax.lax.dynamic_slice(pvH, (yy, xx), (1, 2 * msr_x))[0]
        )(px, py)  # [m, 2*msr_x]: dx in [-msr_x, msr_x-1]
        win = jax.vmap(
            lambda xx, yy: jax.lax.dynamic_slice(pvW, (yy, xx), (wsz, wsz))
        )(px, py)  # [m, wsz, wsz]: (dy, dx) in [-mlow, mlow]
        return jnp.concatenate(
            [col, row, win.reshape(pflat.shape[0], wsz * wsz)], axis=1
        ) == fr_probe[:, None]

    chb = changed.reshape(nb)
    pcap = min(_PROBE_SMALL_CAP, nb)

    # prev padded once for whole-frame verifies AND windowed gathers (the
    # +BLOCK slop lets 16x16 window slices anchored anywhere in-frame)
    pvP = jnp.pad(
        pv2d, ((rmax, rmax + BLOCK), (rmax, rmax + BLOCK)), constant_values=-1
    )

    def block_any(px_bool_hw):
        """[h, w] bool -> [nb] per-block any (pads with False)."""
        return block_any_px(px_bool_hw, h, w, nby, nbx).reshape(nb)

    def full_check(ci):
        """[nb] per-block exact-match verdict for candidate ci (whole-frame
        shifted compare; ~0.03 ms at 1080p). Traced ci."""
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.lax.dynamic_slice(pvP, (rmax + my, rmax + mx), (h, w))
        bad = block_any((win != fr2d) & in_sub)
        inb_ci = (
            (x1 + mx >= 0) & (x2 + mx <= w) & (y1 + my >= 0) & (y2 + my <= h)
        )
        return ~bad & inb_ci & chb

    # ---- stage 1: coarse-reject pre-sweep over static candidates ----
    # First-match order is preserved -> bitstream-neutral. Two tiers per
    # candidate: a row-subsampled fold16 compare REJECTS candidates cheaply
    # (mismatch on any compared pixel implies mismatch, so rejection is
    # sound; ~1/8 the traffic of the exact compare), then the exact
    # whole-frame verify runs only for candidates some block coarse-matched
    # (a scroll frame exact-verifies 1-2 of the 64, measured round 5).
    SUBS = 4  # coarse pass compares every 4th row
    hs = -(-h // SUBS)
    pv16P = _fold16(pvP)
    fr16sub = _fold16(fr2d)[::SUBS]
    sub_rows = nby * (BLOCK // SUBS)
    sub_mask = jnp.zeros((sub_rows, w), bool).at[:hs].set(in_sub[::SUBS])

    def full_check_static(ci: int):
        """Exact per-block verdict for a STATIC candidate (static slices)."""
        mx, my = cands_np[ci]
        win = jax.lax.slice(
            pvP, (rmax + my, rmax + mx), (rmax + my + h, rmax + mx + w)
        )
        bad = block_any((win != fr2d) & in_sub)
        inb_ci = (
            (x1 + mx >= 0) & (x2 + mx <= w)
            & (y1 + my >= 0) & (y2 + my <= h)
        )
        return ~bad & inb_ci & chb

    def coarse_match(ci: int):
        """Per-block PLAUSIBILITY for a static candidate: subsampled fold16
        compare (false positives possible, false negatives impossible)."""
        mx, my = cands_np[ci]
        win = jax.lax.slice(
            pv16P, (rmax + my, rmax + mx),
            (rmax + my + h, rmax + mx + w), (SUBS, 1),
        )
        neq = jnp.zeros((sub_rows, w), bool).at[:hs].set(win != fr16sub)
        # two-stage block reduce, minor-w first (see change_analysis)
        rowblk = (neq & sub_mask).reshape(
            nby, BLOCK // SUBS, w
        ).any(axis=1)  # [nby, w]
        q = jnp.zeros((nby, nbx * BLOCK), bool).at[:, :w].set(rowblk)
        bad = q.reshape(nby, nbx, BLOCK).any(axis=2).reshape(nb)
        inb_ci = (
            (x1 + mx >= 0) & (x2 + mx <= w)
            & (y1 + my >= 0) & (y2 + my <= h)
        )
        return ~bad & inb_ci & chb

    def presweep(base, lo: int, hi: int):
        """First-match merge of static candidates [lo, hi): coarse-reject,
        exact-verify survivors in spec order."""
        best = base
        for ci in range(lo, hi):
            need = coarse_match(ci) & (best == c_count)
            best = jax.lax.cond(
                jnp.any(need),
                lambda b, ci=ci, need=need: jnp.where(
                    full_check_static(ci) & need & (b == c_count), ci, b
                ),
                lambda b: b,
                best,
            )
        return best

    pre2 = min(64, c_count)
    best0 = jnp.full((nb,), c_count, jnp.int32)
    nch = chb.sum()
    coarse_gate = None
    if pre2 and force_dense:
        # vmapped callers (serving): lax.cond flattens to select under
        # vmap, so the cond-gated exact verifies would ALL run. Instead
        # the coarse verdicts prune the dense tier's plausibility matrix
        # and its while_loop exact-verifies survivors in spec order.
        coarse_gate = jnp.ones((nb, c_count), bool).at[:, :pre2].set(
            jnp.stack([coarse_match(ci) for ci in range(pre2)], axis=1)
        )
        verified_upto = jnp.int32(0)
    elif pre2:
        # small edits skip the pre-sweep entirely: the probe-pruned gather
        # tier verifies the same candidates in the same order (bytes
        # identical), at window-gather cost instead of 64 whole-frame
        # coarse compares
        best0 = jax.lax.cond(
            nch > 96, lambda: presweep(best0, 0, pre2), lambda: best0
        )
        verified_upto = jnp.where(nch > 96, pre2, 0)
    else:
        verified_upto = jnp.int32(0)
    unresolved = chb & (best0 == c_count)
    n_unres = unresolved.sum()

    mxs, mys = cands[:, 0], cands[:, 1]
    inb_all = (
        (x1[:, None] + mxs[None, :] >= 0)
        & (x2[:, None] + mxs[None, :] <= w)
        & (y1[:, None] + mys[None, :] >= 0)
        & (y2[:, None] + mys[None, :] <= h)
    )
    iota_c = jnp.arange(c_count, dtype=jnp.int32)
    idxc = jnp.arange(c_count + 1, dtype=jnp.int32)

    def sweep_tables(plaus):
        """(anyp-jump-table nxt [C+1], per-row last plausible [rows])."""
        anyp = jnp.any(plaus, axis=0)
        lastp = jnp.max(jnp.where(plaus, iota_c[None, :], -1), axis=1)
        nxt = jax.lax.cummin(
            jnp.concatenate([jnp.where(anyp, idxc[:c_count], c_count),
                             jnp.array([c_count], jnp.int32)]),
            axis=0, reverse=True,
        )
        return nxt, lastp

    # ---- small tier: probe + verify via per-block window gathers.
    # Cost scales with `pcap` (the probe gathers run for every padded row:
    # ~2 us each), so a cascade of capacities keeps 1-2-block edits from
    # paying the full 512-row gather bill. ----
    def small_tier(pcap):
        idx = jnp.cumsum(unresolved) - 1
        sel = jnp.full((pcap,), nb, jnp.int32).at[
            jnp.where(unresolved, idx, pcap)
        ].set(jnp.arange(nb, dtype=jnp.int32), mode="drop")
        row_valid = sel < nb
        selc = jnp.clip(sel, 0, nb - 1)
        ok = (
            probe_rows(probes[0].reshape(nb)[selc])
            & probe_rows(probes[1].reshape(nb)[selc])
            & row_valid[:, None]
        )
        bx1, by1 = x1[selc], y1[selc]
        bw_s, bh_s = x2[selc] - bx1, y2[selc] - by1
        plaus = (
            ok[:, cand_cols]
            & inb_all[selc]
            # pre-sweep already verified everything below verified_upto
            & (iota_c >= verified_upto)[None, :]
        )
        nxt, lastp = sweep_tables(plaus)

        # frame windows gathered once (padded +BLOCK so any anchor fits)
        fpadW = jnp.pad(
            fr2d, ((0, BLOCK), (0, BLOCK)), constant_values=-2
        )
        cur = jax.vmap(
            lambda xx, yy: jax.lax.dynamic_slice(fpadW, (yy, xx), (BLOCK, BLOCK))
        )(bx1, by1)  # [pcap, 16, 16]
        masks = (
            (jnp.arange(BLOCK)[None, :, None] < bh_s[:, None, None])
            & (jnp.arange(BLOCK)[None, None, :] < bw_s[:, None, None])
        )

        def verify(ci):
            mx, my = cands[ci, 0], cands[ci, 1]
            win = jax.vmap(
                lambda xx, yy: jax.lax.dynamic_slice(
                    pvP, (rmax + yy + my, rmax + xx + mx), (BLOCK, BLOCK)
                )
            )(bx1, by1)
            bad = jnp.any((win != cur) & masks, axis=(1, 2))
            col = jax.lax.dynamic_slice(plaus, (0, ci), (pcap, 1))[:, 0]
            return ~bad & col

        def body(carry):
            best, ci = carry
            match = verify(ci)
            best = jnp.where(match & (best == c_count), ci, best)
            return best, nxt[jnp.minimum(ci + 1, c_count)]

        def cond(carry):
            best, ci = carry
            return (ci < c_count) & jnp.any((best == c_count) & (lastp >= ci))

        bs0 = jnp.full((pcap,), c_count, jnp.int32)
        best_s, _ = jax.lax.while_loop(cond, body, (bs0, nxt[0]))
        return best0.at[jnp.where(row_valid, selc, nb)].set(
            best_s, mode="drop"
        )

    # ---- dense tier: rarity probes + gather-free matrix + whole-frame ----
    def dense_probe():
        if mlow > BLOCK // 2:  # static config guard: low window exceeds the
            # two-tile decomposition of _probe_ok_dense; fall back to the
            # single-probe gather pass
            return probe_rows(probes[0].reshape(nb)) & unresolved[:, None]
        diff = jnp.any(frame != prev, axis=-1)
        r1, r2 = _rarity_probes(fr2d, pv2d, diff, h, w, nby, nbx)
        ok = _probe_ok_dense(
            pv2d, fr_pack, (r1.reshape(nb), r2.reshape(nb)), h, w, nby, nbx,
            msr_x, msr_y, mlow,
        )
        return ok & unresolved[:, None]

    def dense_tier():
        plaus = (
            dense_probe()[:, cand_cols]
            & inb_all
            & unresolved[:, None]
            & (iota_c >= verified_upto)[None, :]
        )
        if coarse_gate is not None:
            plaus = plaus & coarse_gate
        nxt, lastp = sweep_tables(plaus)

        def verify(best, ci):
            col = jax.lax.dynamic_slice(plaus, (0, ci), (nb, 1))[:, 0]
            match = full_check(ci) & col
            return jnp.where(match & (best == c_count), ci, best)

        def body(carry):
            best, ci = carry
            best = verify(best, ci)
            return best, nxt[jnp.minimum(ci + 1, c_count)]

        def cond(carry):
            best, ci = carry
            return (ci < c_count) & jnp.any((best == c_count) & (lastp >= ci))

        best, _ = jax.lax.while_loop(cond, body, (best0, nxt[0]))
        return best

    if force_dense:
        tiered = dense_tier
    else:
        caps = sorted({min(96, pcap), pcap})
        tiered = dense_tier
        for cap in reversed(caps):
            def tiered(cap=cap, nxt_tier=tiered):
                return jax.lax.cond(
                    n_unres <= cap, lambda: small_tier(cap), nxt_tier
                )

    best = jax.lax.cond(jnp.any(unresolved), tiered, lambda: best0)
    return best.reshape(nby, nbx)


def mv_cand_cols(cands_np, msr_x: int, msr_y: int, mlow: int):
    """Static column index of each candidate in the concatenated
    [vertical | horizontal | window] probe ok-matrix (motion_search_pruned).

    An axis-aligned candidate maps to the vertical/horizontal stripe only
    when its displacement is inside that stripe's range; when the low
    window is LARGER than the search range (small-msr configs: msr < mlow)
    the leftover axis candidates live in the window part — the old
    unconditional `mx == 0 -> my + msr_y` mapping produced a negative
    column for them, silently pruning valid motion (latent since round 2;
    exposed by test_fuzz_jax_matches once the sweep used cand_cols for
    verification columns too)."""
    wsz = 2 * mlow + 1
    cols = []
    for mx, my in cands_np:
        if mx == 0 and -msr_y <= my < msr_y:
            cols.append(my + msr_y)
        elif my == 0 and -msr_x <= mx < msr_x:
            cols.append(2 * msr_y + mx + msr_x)
        else:
            assert abs(mx) <= mlow and abs(my) <= mlow, (mx, my)
            cols.append(2 * msr_y + 2 * msr_x + (my + mlow) * wsz + mx + mlow)
    return np.asarray(cols, np.int32)


def block_types_from(valid, found, rects_f, nb: int, nbx: int, h: int,
                     w: int, lin0=0):
    """Block types [nb] from the change map, motion verdicts and sub-rects
    (reference block-type assignment, `screencap.cpp:1033-1042`).
    lin0: global linear index of the first block (row-sharded callers)."""
    from screenpressor_tpu.config import BT_FULL_DATA, BT_PARTIAL_DATA

    bx = (lin0 + jnp.arange(nb)) % nbx
    by = (lin0 + jnp.arange(nb)) // nbx
    x_lo, y_lo = bx * BLOCK, by * BLOCK
    x_hi = jnp.minimum(x_lo + BLOCK, w)
    y_hi = jnp.minimum(y_lo + BLOCK, h)
    partial = valid & ~(
        (rects_f[:, 0] == x_lo) & (rects_f[:, 1] == y_lo)
        & (rects_f[:, 2] == x_hi) & (rects_f[:, 3] == y_hi)
    )
    return jnp.where(
        valid,
        jnp.where(partial, BT_PARTIAL_DATA, BT_FULL_DATA) + 2 * found,
        0,
    ).astype(jnp.int32)


def compact_block_records(bts, rects_f, mvs, nb: int, nbp: int, h: int,
                          w: int, nbx: int):
    """Block-level arrays -> the five global record arrays + counts.

    bts [nb] block types; rects_f [nb, 4] absolute sub-rects; mvs [nb, 2]
    chosen MVs (garbage where not motion). Shared by analyze_compact and
    the sp-sharded P pipeline (parallel/mesh.py), which computes bts/mvs
    per row shard, all_gathers the tiny block-level arrays, and runs this
    compaction replicated."""
    from screenpressor_tpu.config import (
        BT_FULL_MOTION,
        BT_PARTIAL_DATA,
        BT_PARTIAL_MOTION,
        BT_FULL_DATA,
        MAX_RUN,
    )

    valid = bts > 0
    bx = jnp.arange(nb) % nbx
    by = jnp.arange(nb) // nbx
    x_lo, y_lo = bx * BLOCK, by * BLOCK
    lin = jnp.arange(nb)
    xx1 = jnp.min(jnp.where(valid, lin, nb)).astype(jnp.int32)
    xx2 = jnp.max(jnp.where(valid, lin, -1)).astype(jnp.int32)

    # --- BT run-length records (greedy, 255 cap) over xx1..xx2 ---
    linp = jnp.arange(nbp)
    v = bts[jnp.clip(linp + xx1, 0, nb - 1)]
    lenr = xx2 - xx1 + 1
    inr = linp < lenr
    vm = jnp.where(inr, v, -1)
    prev_v = jnp.concatenate([jnp.full((1,), -2, vm.dtype), vm[:-1]])
    bnd = (vm != prev_v) & inr
    run_start = jax.lax.cummax(jnp.where(bnd, linp, -1), axis=0)
    new_rec = (bnd | (((linp - run_start) % MAX_RUN) == 0)) & inr
    n_bt = jnp.sum(new_rec).astype(jnp.int32)
    rid = jnp.cumsum(new_rec) - 1
    starts = jnp.full((nbp,), lenr, jnp.int32).at[
        jnp.where(new_rec, rid, nbp)
    ].set(linp, mode="drop")
    ends = jnp.concatenate([starts[1:], jnp.full((1,), lenr, jnp.int32)])
    ends = jnp.minimum(ends, lenr)
    bt_vals = v[jnp.clip(starts, 0, nbp - 1)]
    bt_recs = jnp.stack([bt_vals, ends - starts], axis=1)

    # --- per-kind compaction in block raster order ---
    is_partial = (bts == BT_PARTIAL_DATA) | (bts == BT_PARTIAL_MOTION)
    is_motion = (bts == BT_FULL_MOTION) | (bts == BT_PARTIAL_MOTION)
    is_data = (bts == BT_FULL_DATA) | (bts == BT_PARTIAL_DATA)
    rel = jnp.stack(
        [
            rects_f[:, 0] - x_lo,
            rects_f[:, 1] - y_lo,
            rects_f[:, 2] - 1 - x_lo,
            rects_f[:, 3] - 1 - y_lo,
        ],
        axis=1,
    )

    def compact(mask, vals, width):
        idx = jnp.cumsum(mask) - 1
        out = jnp.zeros((nbp, width), jnp.int32)
        return out.at[jnp.where(mask, idx, nbp)].set(vals, mode="drop")

    counts = jnp.stack(
        [
            jnp.int32(1),
            xx1,
            xx2,
            n_bt,
            jnp.sum(is_partial).astype(jnp.int32),
            jnp.sum(is_motion).astype(jnp.int32),
            jnp.sum(is_data).astype(jnp.int32),
        ]
    )
    return (
        bt_recs,
        compact(is_partial, rel, 4),
        compact(is_motion, mvs, 2),
        compact(is_data, rects_f, 4),
        counts,
    )


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y", "low_x",
    "low_y", "force_dense"))
def analyze_compact(frame, prev, cands, cand_cols, h: int, w: int, nby: int,
                    nbx: int, rmax: int, nbp: int, msr_x: int, msr_y: int,
                    low_x: int, low_y: int, force_dense: bool = False):
    """Full P-frame analysis + record compaction, one device call.

    Replaces the host loop of `analyze_p` (VERDICT round-1 weak #2): change
    map, sub-rects, windowed exact-match motion over every changed block, and
    compaction of all block-level record arrays, entirely on device.

    Returns (arrs, counts, is_flat_color):
      arrs: dict with capacity `nbp` (= next_pow2(nbx*nby)) record arrays
        bt [nbp,2], sxy [nbp,4], mv [nbp,2], data_rects [nbp,4]
      counts: int32 [7] = (any_change, xx1, xx2, n_bt, n_sxy, n_mv, n_data)
      is_flat_color: int32 [4] = (is_flat, r, g, b) of pixel (0,0)
    """
    from screenpressor_tpu.config import (
        BT_FULL_DATA,
        BT_FULL_MOTION,
        BT_PARTIAL_DATA,
        BT_PARTIAL_MOTION,
        MAX_RUN,
    )

    nb = nby * nbx
    changed, rects, in_sub = change_analysis(frame, prev, h, w, nby, nbx)
    rects_f = rects.reshape(nb, 4)
    valid = changed.reshape(nb)

    c_count = cands.shape[0]

    def run_search():
        # two changed probe pixels per block (min and max flat index);
        # two-stage block reduces, minor-w first (see change_analysis)
        diff = jnp.any(frame != prev, axis=-1)
        flat_idx = jnp.where(diff, jnp.arange(h * w).reshape(h, w), h * w)
        fpad = jnp.full((nby * BLOCK, w), h * w, jnp.int32).at[:h].set(
            flat_idx)
        rmin = fpad.reshape(nby, BLOCK, w).min(axis=1)
        q1 = jnp.full((nby, nbx * BLOCK), h * w, jnp.int32).at[:, :w].set(rmin)
        p1 = jnp.clip(q1.reshape(nby, nbx, BLOCK).min(axis=2), 0, h * w - 1)
        flat_idx2 = jnp.where(diff, jnp.arange(h * w).reshape(h, w), -1)
        fpad2 = jnp.full((nby * BLOCK, w), -1, jnp.int32).at[:h].set(
            flat_idx2)
        rmax2 = fpad2.reshape(nby, BLOCK, w).max(axis=1)
        q2 = jnp.full((nby, nbx * BLOCK), -1, jnp.int32).at[:, :w].set(rmax2)
        p2 = jnp.clip(q2.reshape(nby, nbx, BLOCK).max(axis=2), 0, h * w - 1)
        return motion_search_pruned(
            frame, prev, rects, in_sub, changed, (p1, p2), cands, h, w, nby,
            nbx, rmax, cand_cols, msr_x, msr_y, low_x, low_y, force_dense,
        ).reshape(nb)

    def with_changes():
        """Search + full record compaction (idle frames skip all of it —
        the ~50-op compaction chain costs ~4.6 ms of dependent small-op
        latency even when nothing changed)."""
        choice = run_search()
        found = valid & (choice < c_count)
        mvs = cands[jnp.clip(choice, 0, c_count - 1)]
        bts = block_types_from(valid, found, rects_f, nb, nbx, h, w)
        return compact_block_records(bts, rects_f, mvs, nb, nbp, h, w, nbx)

    def no_changes():
        return (
            jnp.zeros((nbp, 2), jnp.int32),
            jnp.zeros((nbp, 4), jnp.int32),
            jnp.zeros((nbp, 2), jnp.int32),
            jnp.zeros((nbp, 4), jnp.int32),
            jnp.asarray([0, nb, -1, 0, 0, 0, 0], jnp.int32),
        )

    bt_recs, sxy_recs, mv_recs, data_rects, counts = jax.lax.cond(
        valid.any(), with_changes, no_changes
    )
    c0 = frame.reshape(-1, 3)[0]
    is_flat = jnp.all(frame == c0[None, None, :]).astype(jnp.int32)
    flat_color = jnp.concatenate([is_flat[None], c0.astype(jnp.int32)])
    arrs = {"bt": bt_recs, "sxy": sxy_recs, "mv": mv_recs, "data_rects": data_rects}
    return arrs, counts, flat_color


def analyze_p(frame, prev, cfg: CodecConfig):
    """Device analysis; returns numpy (bts, rects dict, mvs dict) in the same
    form as `spec.blocks.analyze_p` (byte-equivalent policy)."""
    h, w = cfg.height, cfg.width
    nby, nbx = cfg.nby, cfg.nbx
    frame = jnp.asarray(frame)
    prev = jnp.asarray(prev)
    changed, rects, in_sub = change_analysis(frame, prev, h, w, nby, nbx)
    cands = np.asarray(mv_candidates(cfg), np.int32)
    rmax = int(max(cfg.msr_x, cfg.msr_y, cfg.msr_low_x, cfg.msr_low_y)) + BLOCK
    changed_np = np.asarray(changed)
    rects_np = np.asarray(rects)
    n_changed = int(changed_np.sum())
    if 0 < n_changed <= 128:
        # sparse change map: windowed per-block search
        from screenpressor_tpu.config import next_pow2

        bys, bxs = np.nonzero(changed_np)
        bcap = next_pow2(n_changed)
        r = np.zeros((bcap, 4), np.int32)
        r[:n_changed] = rects_np[bys, bxs]
        valid = np.zeros(bcap, bool)
        valid[:n_changed] = True
        bw = (r[:, 2] - r[:, 0])[:, None, None]
        bh = (r[:, 3] - r[:, 1])[:, None, None]
        masks = (np.arange(BLOCK)[None, :, None] < bh) & (
            np.arange(BLOCK)[None, None, :] < bw
        )
        best = np.asarray(
            motion_search_windowed(
                frame, prev, jnp.asarray(r), jnp.asarray(valid), jnp.asarray(masks),
                jnp.asarray(cands), h, w, bcap, rmax,
            )
        )
        choice_np = np.full((nby, nbx), len(cands), np.int32)
        choice_np[bys, bxs] = best[:n_changed]
    else:
        choice = motion_search(
            frame, prev, rects, in_sub, changed, jnp.asarray(cands), h, w, nby, nbx, rmax
        )
        choice_np = np.asarray(choice)

    bts = np.zeros(nby * nbx, np.int32)
    rect_d: dict[int, tuple] = {}
    mv_d: dict[int, tuple] = {}
    c_count = len(cands)
    for by, bx in zip(*np.nonzero(changed_np)):
        bi = int(by) * nbx + int(bx)
        x1, y1, x2, y2 = (int(v) for v in rects_np[by, bx])
        x_lo, y_lo = int(bx) * BLOCK, int(by) * BLOCK
        x_hi, y_hi = min(x_lo + BLOCK, w), min(y_lo + BLOCK, h)
        partial = (x1, y1, x2, y2) != (x_lo, y_lo, x_hi, y_hi)
        bt = 2 if partial else 1
        ci = int(choice_np[by, bx])
        if ci < c_count:
            bt += 2
            mv_d[bi] = (int(cands[ci, 0]), int(cands[ci, 1]))
        bts[bi] = bt
        rect_d[bi] = (x1, y1, x2, y2)
    return bts, rect_d, mv_d
