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


@functools.partial(jax.jit, static_argnames=("h", "w", "nby", "nbx"))
def change_analysis(frame, prev, h: int, w: int, nby: int, nbx: int):
    """-> (block_changed [nby,nbx], rects [nby,nbx,4] absolute sub-rects,
    subrect_mask [h,w])."""
    diff = jnp.any(frame != prev, axis=-1)  # [h, w]
    pad = jnp.zeros((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(diff)
    blocks = pad.reshape(nby, BLOCK, nbx, BLOCK)
    changed = blocks.any(axis=(1, 3))

    rowany = blocks.any(axis=3)  # [nby, BLOCK, nbx]
    colany = blocks.any(axis=1)  # [nby, nbx, BLOCK]
    r = jnp.arange(BLOCK)
    y1r = jnp.min(jnp.where(rowany, r[None, :, None], BLOCK), axis=1)
    y2r = jnp.max(jnp.where(rowany, r[None, :, None] + 1, 0), axis=1)
    x1r = jnp.min(jnp.where(colany, r[None, None, :], BLOCK), axis=2)
    x2r = jnp.max(jnp.where(colany, r[None, None, :] + 1, 0), axis=2)

    bx = jnp.arange(nbx)[None, :]
    by = jnp.arange(nby)[:, None]
    rects = jnp.stack(
        [bx * BLOCK + x1r, by * BLOCK + y1r, bx * BLOCK + x2r, by * BLOCK + y2r],
        axis=-1,
    ).astype(jnp.int32)

    # mask of pixels inside their block's sub-rect (changed blocks only);
    # broadcast per-block bounds to pixel grids (cheaper than jnp.repeat)
    ys = jnp.arange(nby * BLOCK).reshape(nby, BLOCK, 1, 1)
    xs = jnp.arange(nbx * BLOCK).reshape(1, 1, nbx, BLOCK)
    bb = lambda a: a[:, None, :, None]
    in_sub = (
        (ys >= bb(rects[..., 1]))
        & (ys < bb(rects[..., 3]))
        & (xs >= bb(rects[..., 0]))
        & (xs < bb(rects[..., 2]))
        & bb(changed)
    ).reshape(nby * BLOCK, nbx * BLOCK)
    return changed, rects, in_sub[:h, :w]


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
    mask_pad = jnp.zeros((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(in_sub)
    x1, y1, x2, y2 = rects[..., 0], rects[..., 1], rects[..., 2], rects[..., 3]

    def body(carry):
        best, ci = carry
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.lax.dynamic_slice(
            prev_pad, (rmax + my, rmax + mx, 0), (h, w, 3)
        )
        neq = jnp.any(win != fr, axis=-1)
        neq_pad = jnp.ones((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(neq)
        bad = (neq_pad & mask_pad).reshape(nby, BLOCK, nbx, BLOCK).any(axis=(1, 3))
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


def motion_search_pruned(frame, prev, rects, in_sub, changed, probes, cands,
                         h: int, w: int, nby: int, nbx: int, rmax: int,
                         cand_cols, msr_x: int, msr_y: int, mlow: int):
    """First-match motion search with a probe pre-screen.

    For each (candidate, block) a single changed probe pixel is compared
    first; the expensive whole-frame shifted compare runs only for
    candidates some unresolved block could still match. The probe matrix is
    built from three contiguous windows per block (a prev-frame column for
    vertical candidates, a row for horizontal ones, a dense patch for the
    low window) — contiguous slices lower ~30x better than a [C, nb]
    random gather on TPU. Identical choice to spec.find_mv (same order,
    full verification before acceptance).

    probes: pair of [nby, nbx] flat indices of changed pixels per block
    (first and last changed pixel). Probe pruning is bitstream-neutral:
    a block that truly matches a candidate MV matches at every changed
    pixel, so a probe can only remove candidates the full verify would
    reject anyway — single vs dual probes changes speed, never the choice.
    cand_cols: [C] static column of each candidate in the concatenated
    [vert | horz | window] ok-matrix (host-computed).
    Returns choice [nby, nbx] int32 (C = no match).

    Perf: the probe matrix is built from three contiguous windows per
    probed block (vmapped dynamic_slice = TPU gather, ~30 ms at [nb, ~3k]
    scale for 1080p). Two tiers keep that off the critical path for small
    edits: when <= _PROBE_SMALL_CAP blocks changed, only those blocks are
    gathered (dual probe, ~n_ch/nb of the cost) and scattered back; dense
    frames (scroll) fall back to a single full-scale probe pass.
    """
    c_count = cands.shape[0]
    nb = nby * nbx
    x1, y1, x2, y2 = rects[..., 0], rects[..., 1], rects[..., 2], rects[..., 3]

    # channel-packed pixels (packed value >= 0; pad sentinel -1 never matches)
    f32p = frame.astype(jnp.int32)
    p32p = prev.astype(jnp.int32)
    fr_pack = (
        f32p[..., 0] | (f32p[..., 1] << 8) | (f32p[..., 2] << 16)
    ).reshape(-1)
    pv2d = (p32p[..., 0] | (p32p[..., 1] << 8) | (p32p[..., 2] << 16))
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

    def small_probe():
        idx = jnp.cumsum(chb) - 1
        sel = jnp.full((pcap,), nb, jnp.int32).at[
            jnp.where(chb, idx, pcap)
        ].set(jnp.arange(nb, dtype=jnp.int32), mode="drop")
        ok_rows_valid = sel < nb
        selc = jnp.clip(sel, 0, nb - 1)
        oks = (
            probe_rows(probes[0].reshape(nb)[selc])
            & probe_rows(probes[1].reshape(nb)[selc])
            & ok_rows_valid[:, None]
        )
        return jnp.zeros((nb, ncol), bool).at[
            jnp.where(ok_rows_valid, selc, nb)
        ].set(oks, mode="drop")

    def full_probe():
        return probe_rows(probes[0].reshape(nb)) & chb[:, None]

    ok_all = jax.lax.cond(chb.sum() <= pcap, small_probe, full_probe)

    def plausible_of(ci):
        """probe & bounds & changed mask [nby, nbx] for one candidate."""
        mx, my = cands[ci, 0], cands[ci, 1]
        colidx = jnp.where(
            mx == 0, my + msr_y,
            jnp.where(
                my == 0, 2 * msr_y + mx + msr_x,
                2 * msr_y + 2 * msr_x + (my + mlow) * wsz + mx + mlow,
            ),
        )
        pok = jax.lax.dynamic_slice(ok_all, (0, colidx), (nb, 1))[:, 0]
        inb = (
            (x1.reshape(nb) + mx >= 0) & (x2.reshape(nb) + mx <= w)
            & (y1.reshape(nb) + my >= 0) & (y2.reshape(nb) + my <= h)
        )
        return (pok & inb).reshape(nby, nbx)

    prev_pad = jnp.pad(
        prev.astype(jnp.int16),
        ((rmax, rmax), (rmax, rmax), (0, 0)),
        constant_values=-1,
    )
    fr = frame.astype(jnp.int16)
    mask_pad = jnp.zeros((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(in_sub)

    # jump table: next candidate index >= c with ANY probe-plausible block,
    # so the verify loop iterates plausible candidates only (a typing frame
    # with no match runs ~0 iterations instead of len(cands)). Conservative
    # (ignores rect bounds): a visited candidate that only bounds-fails
    # verifies to no match, harmlessly.
    anyp = jnp.any(ok_all, axis=0)[cand_cols]  # [C]
    idxc = jnp.arange(c_count + 1, dtype=jnp.int32)
    nxt = jax.lax.cummin(
        jnp.concatenate([jnp.where(anyp, idxc[:c_count], c_count),
                         jnp.array([c_count], jnp.int32)]),
        axis=0, reverse=True,
    )  # [c_count + 1]

    def verify(best, ci):
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.lax.dynamic_slice(prev_pad, (rmax + my, rmax + mx, 0), (h, w, 3))
        neq = jnp.any(win != fr, axis=-1)
        neq_pad = jnp.ones((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(neq)
        bad = (neq_pad & mask_pad).reshape(nby, BLOCK, nbx, BLOCK).any(axis=(1, 3))
        match = plausible_of(ci) & ~bad
        return jnp.where(match & (best == c_count), ci, best)

    def body(carry):
        best, ci = carry
        best = verify(best, ci)
        return best, nxt[jnp.minimum(ci + 1, c_count)]

    def cond(carry):
        best, ci = carry
        return (ci < c_count) & jnp.any(changed & (best == c_count))

    best0 = jnp.full((nby, nbx), c_count, jnp.int32)
    best, _ = jax.lax.while_loop(cond, body, (best0, nxt[0]))
    return best


def mv_cand_cols(cands_np, msr_x: int, msr_y: int, mlow: int):
    """Static column index of each candidate in the concatenated
    [vertical | horizontal | window] probe ok-matrix (motion_search_pruned)."""
    wsz = 2 * mlow + 1
    cols = []
    for mx, my in cands_np:
        if mx == 0:
            cols.append(my + msr_y)
        elif my == 0:
            cols.append(2 * msr_y + mx + msr_x)
        else:
            cols.append(2 * msr_y + 2 * msr_x + (my + mlow) * wsz + mx + mlow)
    return np.asarray(cols, np.int32)


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y", "mlow"))
def analyze_compact(frame, prev, cands, cand_cols, h: int, w: int, nby: int,
                    nbx: int, rmax: int, nbp: int, msr_x: int, msr_y: int,
                    mlow: int):
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
        # two changed probe pixels per block (min and max flat index)
        diff = jnp.any(frame != prev, axis=-1)
        flat_idx = jnp.where(diff, jnp.arange(h * w).reshape(h, w), h * w)
        fpad = jnp.full((nby * BLOCK, nbx * BLOCK), h * w, jnp.int32).at[
            :h, :w
        ].set(flat_idx)
        blocks4 = fpad.reshape(nby, BLOCK, nbx, BLOCK)
        p1 = jnp.clip(blocks4.min(axis=(1, 3)), 0, h * w - 1)
        flat_idx2 = jnp.where(diff, jnp.arange(h * w).reshape(h, w), -1)
        fpad2 = jnp.full((nby * BLOCK, nbx * BLOCK), -1, jnp.int32).at[
            :h, :w
        ].set(flat_idx2)
        p2 = jnp.clip(
            fpad2.reshape(nby, BLOCK, nbx, BLOCK).max(axis=(1, 3)), 0, h * w - 1
        )
        return motion_search_pruned(
            frame, prev, rects, in_sub, changed, (p1, p2), cands, h, w, nby,
            nbx, rmax, cand_cols, msr_x, msr_y, mlow,
        ).reshape(nb)

    # idle frames skip the probe matrix and the search entirely
    choice = jax.lax.cond(
        valid.any(),
        run_search,
        lambda: jnp.full((nb,), c_count, jnp.int32),
    )
    found = valid & (choice < c_count)
    mvs = cands[jnp.clip(choice, 0, c_count - 1)]

    bx = jnp.arange(nb) % nbx
    by = jnp.arange(nb) // nbx
    x_lo, y_lo = bx * BLOCK, by * BLOCK
    x_hi = jnp.minimum(x_lo + BLOCK, w)
    y_hi = jnp.minimum(y_lo + BLOCK, h)
    partial = valid & ~(
        (rects_f[:, 0] == x_lo) & (rects_f[:, 1] == y_lo)
        & (rects_f[:, 2] == x_hi) & (rects_f[:, 3] == y_hi)
    )
    bts = jnp.where(
        valid,
        jnp.where(partial, BT_PARTIAL_DATA, BT_FULL_DATA) + 2 * found,
        0,
    ).astype(jnp.int32)

    lin = jnp.arange(nb)
    any_ch = valid.any()
    xx1 = jnp.min(jnp.where(valid, lin, nb)).astype(jnp.int32)
    xx2 = jnp.max(jnp.where(valid, lin, -1)).astype(jnp.int32)

    # --- BT run-length records (greedy, 255 cap) over xx1..xx2, relative ---
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

    sxy_recs = compact(is_partial, rel, 4)
    mv_recs = compact(is_motion, mvs, 2)
    data_rects = compact(is_data, rects_f, 4)

    counts = jnp.stack(
        [
            any_ch.astype(jnp.int32),
            xx1,
            xx2,
            n_bt,
            jnp.sum(is_partial).astype(jnp.int32),
            jnp.sum(is_motion).astype(jnp.int32),
            jnp.sum(is_data).astype(jnp.int32),
        ]
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
