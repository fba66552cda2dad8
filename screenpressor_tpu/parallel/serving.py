"""Batched multi-stream encoding (the conferencing configuration).

Encodes S same-sized streams per device call: analysis, classification, lane
dealing, BSAC model scans and rANS packing are vmapped over the stream axis;
per-stream model tables and previous frames stay device-resident (HBM), so
serving N streams costs one batched dispatch instead of N (BASELINE.md
"64 concurrent 30fps streams/chip"). The reference's analog is running N
independent codec instances on N thread pools.

Streams use a fixed lane count (`CodecConfig.k_fixed`) so one static scan
shape serves the whole batch; bitstreams remain standard SPTC1 (the lane
policy is config-derived) and decode with any backend configured with the
same k_fixed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_FLAT, ALG_I, CodecConfig, next_pow2, pad_cap
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.classify import classify_i
from screenpressor_tpu.jx.tables import renew_tables, renew_tables_cached
from screenpressor_tpu.spec.codec import FTYPE_I, FTYPE_P, apply_loss


# Batched Pallas section kernels carry one stream's table block (3 MB)
# double-buffered in+out across the stream grid, plus XLA pins the small
# per-stream outputs in VMEM — measured 19.7 MB at the 64-stream 360p
# profile vs the compiler's 16 MB default scoped-VMEM reservation (v5e has
# 128 MB total). jitopts.kernel_jit raises the cap for the jits that wrap
# section kernels.
from screenpressor_tpu.jx.jitopts import batch_kernel_jit as _kernel_jit


@functools.partial(jax.jit, donate_argnums=0)
def _renew_rows(tables_b, fresh, sel):
    """Reset the selected streams' table rows to the fresh state in ONE
    device call (the per-leaf jnp.where tree costs ~25 dispatches — at
    ~3-5 ms/dispatch over a tunnel that dominates every keyframe/flat step
    of a staggered-kf serving batch). Donates the old batch buffers (the
    color tables are the big HBM tenant: ~3 MB/stream/session)."""
    return jax.tree.map(
        lambda b, n: jnp.where(sel.reshape((-1,) + (1,) * n.ndim), n[None], b),
        tables_b, fresh,
    )


@functools.partial(jax.jit, static_argnames=("loss",))
def _batched_loss(frames, loss: int):
    from screenpressor_tpu.jx.codec import apply_loss_device

    return jax.vmap(lambda f: apply_loss_device(f, loss))(frames)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _batched_counts(frames, own, h, w):
    """I-frame record classification for the streams selected by `own`.

    lax.map + cond so non-keyframe streams skip classify_i entirely: on a
    staggered-keyframe step only 1-2 of S streams keyframe, and a vmapped
    whole-frame classify for all S costs ~1.1 s at 64x360p (measured) while
    the two real ones cost ~30 ms."""

    def one(args):
        frame, ow = args

        def run():
            records, n_rec, lits, n_lit = classify_i(frame, h, w)
            bm = jc.color_touched_bitmap(lits, n_lit)
            return records, n_rec, lits, n_lit, bm

        shapes = jax.eval_shape(run)
        records, n_rec, lits, n_lit, bm = jax.lax.cond(
            ow, run,
            lambda: jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes),
        )
        flat = ow & jnp.all(frame == frame[0, 0])
        return (records, n_rec, lits, n_lit, flat, frame[0, 0], bm,
                bm.sum().astype(jnp.int32))

    return jax.lax.map(one, (frames, own))


def _encode_i_one(records, n_rec, lits, n_lit, sk, tables, k, t_rec, t_col,
                  pack_cap, col_w=None, col_bm=None):
    """One stream's I-frame section encode (vmapped by the wrappers below).
    sk: stream must neither emit sections nor touch its tables."""
    n_rec = jnp.where(sk, 0, n_rec)
    n_lit = jnp.where(sk, 0, n_lit)
    rec_dealt = jc.deal_device(records, n_rec, k, t_rec)
    lens_rec = jc.lane_lens_device(n_rec, k)
    col_dealt = jc.deal_device(lits, n_lit, k, t_col)
    lens_col = jc.lane_lens_device(n_lit, k)
    bufs, starts, tables = jc.encode_sections_auto(
        [rec_dealt, col_dealt], [lens_rec, lens_col], tables,
        (("rec", k, t_rec), ("col", k, t_col)), batched=True,
        col_w=col_w, col_bm=col_bm,
    )
    buf_rec, buf_col = bufs
    start_rec, start_col = starts
    kts = (("rec", k, t_rec), ("col", k, t_col))
    packed = _pack_sections_device(
        {"rec": buf_rec, "col": buf_col},
        {"rec": start_rec, "col": start_col},
        {"rec": lens_rec, "col": lens_col},
        kts, pack_cap,
    )
    return (
        (buf_rec, start_rec, lens_rec, buf_col, start_col, lens_col),
        tables, packed,
    )


@functools.partial(_kernel_jit, static_argnames=("k", "t_rec", "t_col",
                                                 "pack_cap", "col_w"))
def _batched_encode_i(records_b, n_rec_b, lits_b, n_lit_b, skip, tables_b,
                      k, t_rec, t_col, pack_cap, col_w=None, col_bm_b=None):
    """Full-batch I encode (the sharded path: every [S, ...] operand keeps
    its stream-axis sharding; a dynamic gather would insert collectives)."""

    if col_bm_b is None:
        def one(records, n_rec, lits, n_lit, sk, tables):
            return _encode_i_one(records, n_rec, lits, n_lit, sk, tables,
                                 k, t_rec, t_col, pack_cap, col_w)

        return jax.vmap(one)(records_b, n_rec_b, lits_b, n_lit_b, skip,
                             tables_b)

    def one(records, n_rec, lits, n_lit, sk, tables, bm):
        return _encode_i_one(records, n_rec, lits, n_lit, sk, tables,
                             k, t_rec, t_col, pack_cap, col_w, bm)

    return jax.vmap(one)(records_b, n_rec_b, lits_b, n_lit_b, skip,
                         tables_b, col_bm_b)


@functools.partial(_kernel_jit, static_argnames=("k", "t_rec", "t_col",
                                                 "pack_cap", "col_w"))
def _batched_encode_i_compact(records_b, n_rec_b, lits_b, n_lit_b, cmeta,
                              tables_b, k, t_rec, t_col, pack_cap,
                              col_w=None, col_bm_b=None):
    """Compacted I encode for staggered-keyframe steps: on a steady-state
    step only 1-2 of S streams keyframe, and the full-batch vmap would run
    the whole record/color scan for all S streams (measured ~100 ms of the
    64x360p serving step). Gathers just the keyframing streams (idx,
    pow2-padded; pad marks duplicated padding rows), encodes them from
    freshly renewed tables (an I-frame always starts renewed — no table
    gather needed), and scatters the updated table rows back into the full
    batch (padding rows dropped via out-of-bounds scatter, so duplicate
    indices never race)."""
    pad, idx = cmeta[:, 0].astype(bool), cmeta[:, 1]
    c = idx.shape[0]
    s = n_rec_b.shape[0]
    rec_s, nrec_s = records_b[idx], n_rec_b[idx]
    lit_s, nlit_s = lits_b[idx], n_lit_b[idx]
    fresh = renew_tables()
    tabs_s = jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape), fresh)

    bm_s = None if col_bm_b is None else col_bm_b[idx]

    if bm_s is None:
        def one(records, n_rec, lits, n_lit, sk, tables):
            return _encode_i_one(records, n_rec, lits, n_lit, sk, tables,
                                 k, t_rec, t_col, pack_cap, col_w)

        res, tabs2, packed = jax.vmap(one)(rec_s, nrec_s, lit_s, nlit_s,
                                           pad, tabs_s)
    else:
        def one(records, n_rec, lits, n_lit, sk, tables, bm):
            return _encode_i_one(records, n_rec, lits, n_lit, sk, tables,
                                 k, t_rec, t_col, pack_cap, col_w, bm)

        res, tabs2, packed = jax.vmap(one)(rec_s, nrec_s, lit_s, nlit_s,
                                           pad, tabs_s, bm_s)
    idx_drop = jnp.where(pad, s, idx)
    tables_out = jax.tree.map(
        lambda b, sm: b.at[idx_drop].set(sm, mode="drop"), tables_b, tabs2
    )
    return res, tables_out, packed


@functools.partial(jax.jit, static_argnames=("h", "w", "nby", "nbx"))
def _batched_analysis(frames, prevs, h, w, nby, nbx):
    """Change map + sub-rects + flat flags for a stream batch (the per-block
    sub-rect masks needed by whole-frame motion are built lazily elsewhere)."""
    from screenpressor_tpu.config import BLOCK

    def one(fr, pv):
        diff = jnp.any(fr != pv, axis=-1)
        pad = jnp.zeros((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(diff)
        blocks = pad.reshape(nby, BLOCK, nbx, BLOCK)
        changed = blocks.any(axis=(1, 3))
        rowany = blocks.any(axis=3)
        colany = blocks.any(axis=1)
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
        flat = jnp.all(fr == fr[0, 0])
        return changed, rects, flat

    return jax.vmap(one)(frames, prevs)


@functools.partial(jax.jit, static_argnames=("h", "w", "nby", "nbx", "rmax"))
def _batched_motion_full(frames, prevs, rects_b, changed_b, cands, h, w, nby, nbx, rmax):
    """Whole-frame shifted-compare motion search vmapped over streams (for
    dense change maps where per-block window gathers would dominate)."""
    from screenpressor_tpu.config import BLOCK
    from screenpressor_tpu.jx.blocks import motion_search

    def one(fr, pv, rects, changed):
        ys = jnp.arange(nby * BLOCK).reshape(nby, BLOCK, 1, 1)
        xs = jnp.arange(nbx * BLOCK).reshape(1, 1, nbx, BLOCK)
        bb = lambda a: a[:, None, :, None]
        in_sub = (
            (ys >= bb(rects[..., 1]))
            & (ys < bb(rects[..., 3]))
            & (xs >= bb(rects[..., 0]))
            & (xs < bb(rects[..., 2]))
            & bb(changed)
        ).reshape(nby * BLOCK, nbx * BLOCK)[:h, :w]
        return motion_search(fr, pv, rects, in_sub, changed, cands, h, w, nby, nbx, rmax)

    return jax.vmap(one)(frames, prevs, rects_b, changed_b)


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap", "rmax"))
def _batched_motion(frames, prevs, rects, sids, valid, masks, cands, h, w, bcap, rmax):
    """Windowed first-match motion search over blocks from many streams.
    rects/sids/valid/masks: [bcap] block list with stream ids."""
    from screenpressor_tpu.config import BLOCK

    c_count = cands.shape[0]
    fpad = jnp.pad(
        frames.astype(jnp.int16), ((0, 0), (0, BLOCK), (0, BLOCK), (0, 0)),
        constant_values=-2,
    )
    ppad = jnp.pad(
        prevs.astype(jnp.int16),
        ((0, 0), (rmax, rmax + BLOCK), (rmax, rmax + BLOCK), (0, 0)),
        constant_values=-1,
    )
    x1, y1, x2, y2 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    cur = jax.vmap(
        lambda sid, xx, yy: jax.lax.dynamic_slice(
            fpad, (sid, yy, xx, 0), (1, BLOCK, BLOCK, 3)
        )[0]
    )(sids, x1, y1)

    def step(best, ci):
        mx, my = cands[ci, 0], cands[ci, 1]
        win = jax.vmap(
            lambda sid, xx, yy: jax.lax.dynamic_slice(
                ppad, (sid, rmax + yy + my, rmax + xx + mx, 0), (1, BLOCK, BLOCK, 3)
            )[0]
        )(sids, x1, y1)
        neq = jnp.any(win != cur, axis=-1)
        bad = jnp.any(neq & masks, axis=(1, 2))
        inb = (x1 + mx >= 0) & (x2 + mx <= w) & (y1 + my >= 0) & (y2 + my <= h)
        match = valid & inb & ~bad
        return jnp.where(match & (best == c_count), ci, best), None

    best0 = jnp.full((bcap,), c_count, jnp.int32)
    best, _ = jax.lax.scan(step, best0, jnp.arange(c_count, dtype=jnp.int32))
    return best


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def _batched_classify_blocks(frames, prevs, rects, sids, h, w, bcap):
    """P-block classification for a cross-stream block list."""
    from screenpressor_tpu.config import BLOCK
    from screenpressor_tpu.jx.pframe import _classify_one_block, _win17

    fp = jnp.pad(frames.astype(jnp.int32), ((0, 0), (1, BLOCK + 1), (1, BLOCK + 1), (0, 0)))
    pp = jnp.pad(prevs.astype(jnp.int32), ((0, 0), (1, BLOCK + 1), (1, BLOCK + 1), (0, 0)))

    def per_block(rect, sid):
        x1, y1, x2, y2 = rect[0], rect[1], rect[2], rect[3]
        cw = jax.lax.dynamic_slice(fp, (sid, y1, x1, 0), (1, BLOCK + 1, BLOCK + 1, 3))[0]
        pw = jax.lax.dynamic_slice(pp, (sid, y1, x1, 0), (1, BLOCK + 1, BLOCK + 1, 3))[0]
        return _classify_one_block(cw, pw, x1, y1, x2 - x1, y2 - y1)

    return jax.vmap(per_block)(rects, sids)


@functools.partial(_kernel_jit, static_argnames=("kts",))
def _batched_encode_sections(recs_cap, ns, tables_b, kts):
    def one(recs_s, ns_s, tables):
        bufs, starts, lens_out = {}, {}, {}
        for name, k, t in kts:
            n = ns_s[name]
            dealt = jc.deal_device(recs_s[name], n, k, t)
            lens = jc.lane_lens_device(n, k)
            nsub = len(jc.CODECS[name].kinds)
            cum, freq, act, tables = jc.model_scan(dealt, lens, tables, name, k, t)
            buf, start = jc.rans_pack(cum, freq, act, 2 * t * nsub + 8)
            bufs[name], starts[name], lens_out[name] = buf, start, lens
        return (bufs, starts, lens_out), tables

    return jax.vmap(one)(recs_cap, ns, tables_b)




@functools.partial(jax.jit, static_argnames=(
    "h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y", "low_x", "low_y"))
def _batched_analyze(frames, prevs, cands, cols, h, w, nby, nbx, rmax, nbp,
                     msr_x, msr_y, low_x, low_y):
    """Per-stream analysis via lax.map (scan), NOT vmap: a conferencing
    batch is dominated by idle / tiny-change streams, and lax.map keeps
    analyze_compact's runtime branches real per stream — the no-change
    early-out, the small/dense probe tiers, and the pre-sweep's
    probe-skip — where vmap would flatten every cond to a select and run
    the dense-probe passes for all S streams on every step. Busy streams
    serialize, but each stream's analysis is already frame-wide parallel."""
    from screenpressor_tpu.jx import blocks as jb2

    def one(fp):
        f, pv = fp
        arrs, counts, flat = jb2.analyze_compact(
            f, pv, cands, cols, h, w, nby, nbx, rmax, nbp, msr_x, msr_y,
            low_x, low_y,
        )
        return arrs, counts, flat

    return jax.lax.map(one, (frames, prevs))


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y", "low_x", "low_y"))
def _batched_analyze_dense(frames, prevs, cands, cols, h, w, nby, nbx, rmax,
                           nbp, msr_x, msr_y, low_x, low_y):
    """Vmapped analysis for busy batches (measured at 64x360p: 88 ms vs the
    serial map's 250 ms on an all-streams-typing step). force_dense keeps a
    single probe tier so vmap doesn't run both as selects; MV choice is
    bitstream-identical to the tiered path (first-match order preserved —
    see motion_search_pruned). The encoder picks this variant when the
    previous step had many active streams (_DENSE_BATCH_MIN)."""
    from screenpressor_tpu.jx import blocks as jb2

    def one(f, pv):
        return jb2.analyze_compact(
            f, pv, cands, cols, h, w, nby, nbx, rmax, nbp, msr_x, msr_y,
            low_x, low_y, force_dense=True,
        )

    return jax.vmap(one)(frames, prevs)


# switch to the vmapped dense analysis when at least this many streams were
# active on the previous step (sticky heuristic; mispredicts cost time only,
# never bytes — both paths make identical MV choices)
_DENSE_BATCH_MIN = 16


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def _batched_classify_assemble(frames, prevs, rects_b, n_data_b, h, w, bcap):
    """lax.map for the same reason as _batched_analyze: streams with no
    data blocks (idle / motion-only) skip classification entirely instead
    of paying the shared-bcap work under a vmap select."""
    from screenpressor_tpu.jx.pframe import classify_assemble

    def one(args):
        f, pv, rects, nd = args

        def run():
            return classify_assemble(f, pv, rects[:bcap], nd, h, w, bcap)

        shapes = jax.eval_shape(run)
        return jax.lax.cond(
            nd > 0,
            run,
            lambda: jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes
            ),
        )

    return jax.lax.map(one, (frames, prevs, rects_b, n_data_b))


@functools.partial(jax.jit, static_argnames=("h", "w", "bcap"))
def _batched_classify_eager(frames, prevs, rects_b, counts_b, flat_b, own_b,
                            h, w, bcap):
    """Classify dispatched BEFORE the analysis counts are pulled: the
    per-stream data-block count comes from the device-resident analysis
    counts (counts_b[:, 0]=any_change, [:, 6]=n_data; flat_b[:, 0]=flat),
    masked by the host ownership vector. With a running-bucket bcap this
    removes one tunnel sync per serving step (the dominant per-step cost on
    a tunnel-attached rig is ~50 ms per fresh device->host pull)."""
    from screenpressor_tpu.jx.pframe import classify_assemble

    bcap = min(bcap, rects_b.shape[1])  # never beyond the frame's blocks
    nd_eff = jnp.where(
        own_b & (counts_b[:, 0] != 0) & (flat_b[:, 0] == 0),
        counts_b[:, 6], 0,
    ).astype(jnp.int32)

    def one(args):
        f, pv, rects, nd = args

        def run():
            return classify_assemble(f, pv, rects[:bcap], nd, h, w, bcap)

        shapes = jax.eval_shape(run)
        return jax.lax.cond(
            nd > 0,
            run,
            lambda: jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes
            ),
        )

    return jax.lax.map(one, (frames, prevs, rects_b, nd_eff))


def _pack_sections_device(bufs, starts, lens_l, kts, pack_cap: int):
    """Concatenate one stream's used section bytes (section-major, lane
    slices in lane order — the exact container layout) into a [pack_cap]
    buffer on device, so the host pulls payload bytes in the SAME device_get
    as the starts/lens metadata instead of a second gather dispatch+pull."""
    from screenpressor_tpu.jx.transfer import gather_segments

    flat = jnp.concatenate([bufs[nm].reshape(-1) for nm, _, _ in kts])
    src0_l, len_l = [], []
    base = 0
    for nm, k, _ in kts:
        cap = bufs[nm].shape[1]
        sizes = jnp.where(lens_l[nm] > 0, cap - starts[nm], 0)
        src0_l.append(base + jnp.arange(k, dtype=jnp.int32) * cap + starts[nm])
        len_l.append(sizes.astype(jnp.int32))
        base += k * cap
    src0 = jnp.concatenate(src0_l)
    seg_lens = jnp.concatenate(len_l)
    dst0 = jnp.cumsum(seg_lens) - seg_lens
    segs = jnp.stack([src0, dst0, seg_lens], axis=1).astype(jnp.int32)
    return gather_segments(flat, segs, pack_cap)


@functools.partial(_kernel_jit, static_argnames=("kts", "sec_caps", "thr",
                                                 "pack_cap", "col_w"))
def _batched_sections_raw(sources, tables_b, kts, sec_caps, hdr_vals_b, thr,
                          pack_cap, col_w=None, col_bm_b=None):
    from screenpressor_tpu.jx.pframe import encode_sections_raw

    # slice the record sources to their per-step caps INSIDE the jit (five
    # host-side device slices would be five extra tunnel dispatches)
    recs_cap = {
        name: sources[name][:, :cap]
        for (name, _, _), cap in zip(kts, sec_caps)
    }

    def one(rc, t, hv, bm):
        # per-section counts live in the header vector (hv[2:7]); caps are
        # the already-bucketed record array shapes
        caps = tuple(rc[name].shape[0] for name, _, _ in kts)
        bufs, starts, lens_out, stats, sel = encode_sections_raw(
            rc, hv, t, kts, caps, thr, batched=True, col_w=col_w, col_bm=bm
        )
        packed = _pack_sections_device(bufs, starts, lens_out, kts, pack_cap)
        # single pull-ready metadata vector (per-section starts+lens, then
        # stats) — assembling it host-side from the dict outputs costs ~16
        # small dispatches per step on a tunnel rig
        meta = jnp.concatenate(
            [jnp.concatenate([starts[nm].reshape(-1).astype(jnp.int32),
                              lens_out[nm].reshape(-1).astype(jnp.int32)])
             for nm, _, _ in kts]
            + [stats.reshape(-1).astype(jnp.int32)]
        )
        return bufs, starts, lens_out, meta, sel, packed

    if col_bm_b is None:
        # static None must not become a vmapped operand
        return jax.vmap(lambda rc, t, hv: one(rc, t, hv, None))(
            recs_cap, tables_b, hdr_vals_b)
    return jax.vmap(one)(recs_cap, tables_b, hdr_vals_b, col_bm_b)


def _tight_pull(buf_list, starts_list, lens_list, extra_parts=()):
    """Pull only the used bytes of capacity-padded lane buffers.

    buf_list: device arrays [S, K, cap] (section-major); starts/lens: host
    numpy [S, K] each. extra_parts: (device_flat_uint8, length) tuples
    appended verbatim (e.g. raw frames). Returns (tight np.uint8,
    offs: list of [S, K] destination offsets per section,
    sizes: list of [S, K] per-lane byte sizes, extra_offs)."""
    from screenpressor_tpu.jx.transfer import gather_segments, pow2_bucket

    seg_src, seg_len = [], []
    flat_parts = []
    base = 0
    sizes_out = []
    for buf, starts, lens in zip(buf_list, starts_list, lens_list):
        s_, k_, cap = buf.shape
        sizes = np.where(lens > 0, cap - starts, 0).astype(np.int64)
        src = base + (np.arange(s_ * k_, dtype=np.int64) * cap).reshape(s_, k_) + starts
        seg_src.append(src.reshape(-1))
        seg_len.append(sizes.reshape(-1))
        sizes_out.append(sizes)
        flat_parts.append(buf.reshape(-1))
        base += s_ * k_ * cap
    extra_offs = []
    for part, ln in extra_parts:
        seg_src.append(np.asarray([base], np.int64))
        seg_len.append(np.asarray([ln], np.int64))
        flat_parts.append(part)
        base += part.shape[0]
    srcs = np.concatenate(seg_src)
    lens_all = np.concatenate(seg_len)
    dsts = np.concatenate([[0], np.cumsum(lens_all)[:-1]]).astype(np.int64)
    total = int(lens_all.sum())
    segs = np.stack([srcs, dsts, lens_all], axis=1).astype(np.int32)
    scap = pow2_bucket(max(len(segs), 1))
    segs_p = np.zeros((scap, 3), np.int32)
    segs_p[: len(segs)] = segs
    tight = np.asarray(
        gather_segments(
            jnp.concatenate(flat_parts), jnp.asarray(segs_p),
            pow2_bucket(max(total, 1)),
        )
    )[:total]
    # split dst offsets back per section
    offs = []
    pos = 0
    for sizes in sizes_out:
        cnt = sizes.size
        offs.append(dsts[pos : pos + cnt].reshape(sizes.shape))
        pos += cnt
    for part, ln in extra_parts:
        extra_offs.append(int(dsts[pos]))
        pos += 1
    return tight, offs, sizes_out, extra_offs


def _section_bytes(tight, offs, sizes, i):
    """Container section payload for stream i: status byte + minimal-width
    size table + lanes (bs.pack_section layout)."""
    k = sizes.shape[1]
    w = bs.size_width(int(sizes[i].max(initial=0)))
    off = int(offs[i, 0])
    end = off + int(sizes[i].sum())
    return (bytes([bs.section_status_byte(k, w)])
            + sizes[i].astype(f"<u{w}").tobytes() + tight[off:end].tobytes())


# process-wide warm-start cache for the running shape buckets, keyed by
# (h, w, k_fixed, n_streams) — see BatchedEncoder.__init__
_BUCKET_CACHE: dict = {}


class BatchedEncoder:
    """Encode a batch of streams in lockstep (keyframes synchronized by the
    shared config; flat/no-change shortcuts applied per stream).

    All heavy state ([S] previous frames, [S] table sets) is device-resident.
    """

    def __init__(self, n_streams: int, cfg: CodecConfig, sharding=None,
                 kf_offsets=None):
        """sharding: optional jax.sharding.Sharding for the stream axis
        (e.g. NamedSharding(mesh, P("dp"))) — every [S, ...] device array is
        placed with it, so the vmapped phase jits compile SPMD across the
        mesh with zero cross-stream collectives (streams are independent;
        SURVEY.md §2.5).

        kf_offsets: optional [S] ints staggering each stream's keyframe
        phase: stream i keyframes when (fn + kf_offsets[i]) % kf_interval
        == 0. A real conferencing fleet has staggered joins — lockstep
        keyframes would periodically stall every stream at once. Mixed
        batches dispatch the I path and the P path with complementary
        per-stream masks."""
        if cfg.k_fixed is None:
            cfg = dataclasses.replace(cfg, k_fixed=min(cfg.k_max, 256))
        self.cfg = cfg
        self.s = n_streams
        self.sharding = sharding
        self.kf_offsets = (np.zeros(n_streams, np.int64) if kf_offsets is None
                           else np.asarray(kf_offsets, np.int64))
        assert self.kf_offsets.shape == (n_streams,)
        t = renew_tables()
        self.tables_b = jax.tree.map(
            lambda a: self._dput(jnp.broadcast_to(a, (n_streams,) + a.shape)), t
        )
        self.prev: np.ndarray | None = None
        self.fn = 0
        self.last_flat = np.zeros(n_streams, bool)
        self.flat_color = np.zeros((n_streams, 3), np.uint8)
        # running shape buckets (grow-only): data-block classify capacity
        # and the device-side payload pack capacity. Undersized steps are
        # detected from the pulled counts and redone/fallen back — steady
        # state is two tunnel pulls per P-batch. The buckets persist in a
        # process-wide cache keyed by the codec geometry, so a new session
        # starts warm (no re-grow redos / recompiles).
        bkey = (cfg.height, cfg.width, cfg.k_fixed, n_streams)
        self._bucket_key = bkey
        cached = _BUCKET_CACHE.get(bkey, (256, 4096, 65536))
        self._bcap, self._pack_cap, self._pack_cap_i = cached
        # active-stream count of the previous step (vmapped-vs-serial
        # analysis heuristic; see _batched_analyze_dense)
        self._last_active = 0

    def _dput(self, a):
        x = jnp.asarray(a)
        return x if self.sharding is None else jax.device_put(x, self.sharding)

    def _renew_streams(self, mask: np.ndarray):
        if not mask.any():
            return
        self.tables_b = _renew_rows(
            self.tables_b, renew_tables_cached(), jnp.asarray(mask)
        )

    def encode(self, frames, force_key: bool = False):
        """frames: [S, H, W, 3] uint8 (numpy or device-resident jax array)
        -> list of (payload bytes, ftype). Device-resident batches skip the
        host->device upload entirely (the production model: frames arrive on
        device over PCIe/ICI; a dev-tunnel upload would measure the link)."""
        return self.encode_finish(self.encode_begin(frames, force_key))

    def encode_begin(self, frames, force_key: bool = False):
        """Dispatch the table-free front half of a step (analysis +
        classification for P streams, record/literal counting for I streams)
        WITHOUT any tunnel pull, and return a pending handle for
        encode_finish.

        A serving loop calls encode_begin(batch[t+1]) before
        encode_finish(pending[t]): step t+1's device compute is then already
        queued while the host sits in step t's pulls and payload assembly,
        so the chip never idles on tunnel RTT or host-side work
        (cross-batch pipelining, DESIGN.md serving). Only the phases before
        the first pull run here — they depend only on the frame pair, never
        on the adaptive tables that step t's back half still has to update.
        At most one encode may be pending at a time."""
        cfg = self.cfg
        s, h, w = self.s, cfg.height, cfg.width
        assert frames.shape == (s, h, w, 3)
        if isinstance(frames, np.ndarray):
            frames = self._dput(apply_loss(np.asarray(frames, np.uint8), cfg.loss))
        elif cfg.loss:
            frames = _batched_loss(frames, cfg.loss)
        if force_key or self.prev is None or self.fn == 0:
            key_mask = np.ones(s, bool)
        elif cfg.kf_interval > 0:
            key_mask = ((self.fn + self.kf_offsets) % cfg.kf_interval) == 0
        else:
            key_mask = np.zeros(s, bool)
        self.fn += 1
        # staged pipelines: each stage returns (pull_tree, cont) and the
        # driver advances every pipeline with ONE device_get per round, so a
        # mixed I/P batch (staggered keyframes hit one most steps) costs the
        # same two tunnel syncs as a pure-P batch.
        pipes = []
        if (~key_mask).any() and self.prev is not None:
            pipes.append(self._p_stage1(frames, ~key_mask))
        if key_mask.any():
            pipes.append(self._i_stage1(frames, key_mask))
        pend = self._prime(pipes)
        self.prev = frames
        return pend

    def encode_finish(self, pend):
        """Drive a pending encode (from encode_begin) to completion:
        performs the tunnel pulls, the adaptive-table section dispatches and
        the host-side payload assembly. Returns the encode() result list."""
        outs = self._drain(*pend)
        if len(outs) == 1:
            return outs[0]
        return [a if a is not None else b for a, b in zip(outs[1], outs[0])]

    @staticmethod
    def _prime(pipes):
        """Start each pipeline up to its first pull request (dispatch-only;
        no tunnel sync). Order matters: earlier pipelines resume first each
        round (the I stage reads the table tree the P stage's section
        dispatch wrote)."""
        pipes = list(pipes)
        outs = [None] * len(pipes)
        trees = [None] * len(pipes)
        for j, p in enumerate(pipes):
            try:
                trees[j] = p.send(None)
            except StopIteration as e:
                outs[j] = e.value
                pipes[j] = None
        return pipes, trees, outs

    @staticmethod
    def _drain(pipes, trees, outs):
        """Advance primed pipelines to completion; each `yield tree` is a
        pull request and every round issues ONE device_get for all live
        pipelines."""
        while any(p is not None for p in pipes):
            pulled = jax.device_get(trees)
            for j, p in enumerate(pipes):
                if p is None:
                    continue
                try:
                    trees[j] = p.send(pulled[j])
                except StopIteration as e:
                    outs[j] = e.value
                    pipes[j] = None
                    trees[j] = None
        return outs

    def _i_stage1(self, frames: np.ndarray, own: np.ndarray):
        """I-encode the streams selected by `own` (generator pipeline for
        _drive; each yield is a pull request). Other entries are None and
        their tables/state are untouched (skip-masked device calls)."""
        cfg = self.cfg
        s, h, w = self.s, cfg.height, cfg.width
        dev_frames = frames
        (records_b, n_rec_d, lits_b, n_lit_d, flat_d, c0_d, col_bm_b,
         nt_d) = _batched_counts(
            dev_frames, self._dput(jnp.asarray(own)), h, w)

        n_rec, n_lit, flat, c0, nt = yield (n_rec_d, n_lit_d, flat_d, c0_d,
                                            nt_d)
        flat = np.asarray(flat)

        # flat shortcut per stream (reference `IsFlat` semantics)
        renew_flat = np.zeros(s, bool)
        out: list = [None] * s
        for i in range(s):
            if not own[i]:
                continue
            if flat[i]:
                color = tuple(int(v) for v in c0[i])
                if not (self.last_flat[i] and (self.flat_color[i] == color).all()):
                    renew_flat[i] = True
                    self.flat_color[i] = color
                self.last_flat[i] = True
                out[i] = (bytes([bs.header_byte(ALG_FLAT), *color]), FTYPE_I)
            else:
                self.last_flat[i] = False

        coded = own & ~flat
        coded_idx = np.nonzero(coded)[0]
        # the compact path renews the coded streams' table rows itself
        # (fresh tables broadcast inside _batched_encode_i_compact)
        compact = self.sharding is None and 0 < len(coded_idx) < s
        renew_mask = renew_flat if compact else (renew_flat | coded)
        self._renew_streams(jnp.asarray(renew_mask))

        if not coded.any():
            return out
        k = cfg.k_fixed
        t_rec = jc._pad_steps(int(-(-max(n_rec[coded].max(), 1) // k)))
        t_col = jc._pad_steps(int(-(-max(n_lit[coded].max(), 1) // k)))
        col_w = jc.col_compact_bucket(int(max(np.asarray(nt)[coded].max(), 1)))
        col_bm_arg = col_bm_b if col_w is not None else None
        pack_cap = self._pack_cap_i
        if compact:
            ccap = next_pow2(len(coded_idx))
            idx_g = np.resize(coded_idx, ccap).astype(np.int32)
            pad = np.arange(ccap) >= len(coded_idx)
            cmeta = np.stack([pad, idx_g], axis=1).astype(np.int32)
            res, self.tables_b, packed = _batched_encode_i_compact(
                records_b, n_rec_d, lits_b, n_lit_d, self._dput(cmeta),
                self.tables_b, k, t_rec, t_col, pack_cap,
                col_w=col_w, col_bm_b=col_bm_arg,
            )
            packed_rows = packed  # already compact (coded rows + pads)
            row_of = {int(st): j for j, st in enumerate(coded_idx)}
        else:
            res, self.tables_b, packed = _batched_encode_i(
                records_b, n_rec_d, lits_b, n_lit_d, self._dput(~coded),
                self.tables_b, k, t_rec, t_col, pack_cap,
                col_w=col_w, col_bm_b=col_bm_arg,
            )
            # pull the packed payloads of the coded streams only
            packed_rows = packed[jnp.asarray(coded_idx)]
            row_of = None
        buf_rec, start_rec_d, lens_rec_d, buf_col, start_col_d, lens_col_d = res

        start_rec, lens_rec, start_col, lens_col, rows = yield (
            start_rec_d, lens_rec_d, start_col_d, lens_col_d, packed_rows,
        )
        # sizes arrays are indexed by stream in the full path and by
        # compact row in the compact path
        srow = row_of if row_of is not None else {int(i): int(i) for i in coded_idx}
        prow = {int(st): j for j, st in enumerate(coded_idx)}
        caps = (buf_rec.shape[2], buf_col.shape[2])
        sizes_rec = np.where(lens_rec > 0, caps[0] - start_rec, 0)
        sizes_col = np.where(lens_col > 0, caps[1] - start_col, 0)
        tot = sizes_rec.sum(axis=1) + sizes_col.sum(axis=1)
        used = np.asarray([tot[srow[int(i)]] for i in coded_idx], np.int64)
        if int(used.max(initial=0)) > pack_cap:
            self._pack_cap_i = int(next_pow2(int(used.max())))
            _BUCKET_CACHE[self._bucket_key] = (
                self._bcap, self._pack_cap, self._pack_cap_i,
            )
            tight, offs, sizes, _ = _tight_pull(
                [buf_rec, buf_col], [start_rec, start_col],
                [lens_rec, lens_col],
            )

            def payload_of(i):
                j = srow[i]
                return (_section_bytes(tight, offs[0], sizes[0], j)
                        + _section_bytes(tight, offs[1], sizes[1], j))
        else:

            def payload_of(i):
                j = srow[i]
                row = rows[prow[i]]
                sr, sc = sizes_rec[j], sizes_col[j]
                wr = bs.size_width(int(sr.max(initial=0)))
                wc = bs.size_width(int(sc.max(initial=0)))
                nrec_bytes = int(sr.sum())
                return b"".join([
                    bytes([bs.section_status_byte(k, wr)]),
                    sr.astype(f"<u{wr}").tobytes(),
                    row[:nrec_bytes].tobytes(),
                    bytes([bs.section_status_byte(k, wc)]),
                    sc.astype(f"<u{wc}").tobytes(),
                    row[nrec_bytes : nrec_bytes + int(sc.sum())].tobytes(),
                ])

        for i in coded_idx:
            out[i] = (
                bytes([bs.header_byte(ALG_I)])
                + bs.pack_varint(int(n_rec[i]), int(n_lit[i]))
                + payload_of(i),
                FTYPE_I,
            )
        return out

    # ------------------------------------------------------------------ P --
    def _p_stage1(self, frames: np.ndarray, own: np.ndarray):
        """Vmapped phase pipeline over the streams selected by `own` (same
        architecture as the single-stream batch path in jx.codec):
        analysis+compaction, eagerly-dispatched data-block classification,
        section encode with device-side raw select and payload packing.
        Generator pipeline for _drive: two yields = two tunnel pulls per
        step. Non-owned entries return None with state untouched."""
        from screenpressor_tpu.config import ALG_P, ALG_RAW
        from screenpressor_tpu.jx.pframe import (
            _SECTION_NAMES,
            _cands_rmax,
            classify_assemble,
            encode_sections_raw,
        )
        from screenpressor_tpu.jx import blocks as jb2

        cfg = self.cfg
        s, h, w = self.s, cfg.height, cfg.width
        nby, nbx = cfg.nby, cfg.nbx
        nbp = next_pow2(nbx * nby)
        k = cfg.k_fixed
        dev_frames = frames
        dev_prevs = self.prev
        cands, cols, rmax, lows = _cands_rmax(cfg)
        from screenpressor_tpu.jx.codec import _phase_timer
        mark = _phase_timer()

        import os as _os
        deep = _os.environ.get("SPTC_TIMING") == "2"
        analyze = (_batched_analyze_dense
                   if self._last_active >= _DENSE_BATCH_MIN
                   else _batched_analyze)
        arrs, counts, flat4 = analyze(
            dev_frames, dev_prevs, cands, cols, h, w, nby, nbx, rmax, nbp,
            cfg.msr_x, cfg.msr_y, lows[0], lows[1],
        )
        if deep:
            jax.block_until_ready(counts)
            mark("serve A analyze (sync)")
        # phase B dispatched eagerly (before any pull) with the running
        # block-capacity bucket: one tunnel sync covers analysis AND
        # classification counts. Overflow (a bigger change than any prior
        # step) is detected from the pulled counts and redone below.
        own_d = self._dput(jnp.asarray(own))
        bcap = self._bcap
        pix_cap, lit_cap, plc_d, col_bm_b = _batched_classify_eager(
            dev_frames, dev_prevs, arrs["data_rects"], counts, flat4, own_d,
            h, w, bcap,
        )
        if deep:
            jax.block_until_ready(plc_d)
            mark("serve B classify (sync)")
        ch, plc = yield (jnp.concatenate([counts, flat4], axis=1), plc_d)
        ch = np.asarray(ch)  # [S, 11]
        plc = np.asarray(plc)
        mark("serve A+B analyze+classify pull")

        out: list = [None] * s
        renew_mask = np.zeros(s, bool)
        active = np.zeros(s, bool)
        hdr = bytes([bs.header_byte(ALG_P)])
        for i in range(s):
            if not own[i]:
                continue
            if ch[i, 7]:  # flat
                color = tuple(int(v) for v in ch[i, 8:11])
                if not (self.last_flat[i] and (self.flat_color[i] == np.asarray(color, np.uint8)).all()):
                    renew_mask[i] = True
                    self.flat_color[i] = color
                self.last_flat[i] = True
                out[i] = (bytes([bs.header_byte(ALG_FLAT), *color]), FTYPE_I)
                continue
            self.last_flat[i] = False
            if not ch[i, 0]:
                out[i] = (hdr + bytes([0]), FTYPE_P)
                continue
            active[i] = True
        self._renew_streams(jnp.asarray(renew_mask))
        self._last_active = int(active.sum())
        if not active.any():
            return out

        # phase B counts arrived with phase A's pull; redo classification
        # only when this step's change exceeds the running bucket
        n_data = np.where(active, ch[:, 6], 0).astype(np.int32)
        if int(n_data.max()) > bcap:
            self._bcap = bcap = next_pow2(int(n_data.max()))
            _BUCKET_CACHE[self._bucket_key] = (
                self._bcap, self._pack_cap, self._pack_cap_i)
            pix_cap, lit_cap, plc_d, col_bm_b = _batched_classify_eager(
                dev_frames, dev_prevs, arrs["data_rects"], counts, flat4,
                own_d, h, w, bcap,
            )
            plc = np.asarray(jax.device_get(plc_d))
            mark("serve B reclassify (bcap grow)")
        n_pix, n_lit = plc[:, 0].astype(np.int64), plc[:, 1].astype(np.int64)

        # phase C: sections with per-stream skip (ns=0) + raw select
        nums = {
            "bt": np.where(active, ch[:, 3], 0),
            "sxy": np.where(active, ch[:, 4], 0),
            "mv": np.where(active, ch[:, 5], 0),
            "rec": np.where(active, n_pix, 0),
            "col": np.where(active, n_lit, 0),
        }
        sources = {
            "bt": arrs["bt"], "sxy": arrs["sxy"], "mv": arrs["mv"],
            "rec": pix_cap, "col": lit_cap,
        }
        kts, sec_caps = [], []
        for name in _SECTION_NAMES:
            nmax = int(nums[name].max())
            t = jc._pad_steps(-(-max(nmax, 1) // k)) if nmax else 1
            kts.append((name, k, t))
            sec_caps.append(min(pad_cap(nmax), sources[name].shape[1]))
        raw_threshold = 1 + w * h * 3
        hdr_vals_b = self._dput(np.stack(
            [ch[:, 1], ch[:, 2], nums["bt"], nums["sxy"], nums["mv"],
             nums["rec"], nums["col"], n_data], axis=1).astype(np.int32))
        pack_cap = self._pack_cap
        # compact color-table bucket: one static choice for the whole batch
        # (the vmapped transform compacts per stream; the bucket must bound
        # every stream's touched rows)
        n_ctouch = int(np.where(active, plc[:, 2], 1).max()) if (
            plc.shape[1] > 2) else 1
        col_w = jc.col_compact_bucket(max(n_ctouch, 1))
        bufs, starts, lens_l, meta, self.tables_b, packed = (
            _batched_sections_raw(
                sources, self.tables_b, tuple(kts), tuple(sec_caps),
                hdr_vals_b, raw_threshold, pack_cap, col_w=col_w,
                col_bm_b=col_bm_b if col_w is not None else None,
            )
        )

        mark("serve C sections dispatch")
        # ONE pull: starts/lens/stats metadata AND the device-packed payload
        # bytes together (each fresh pull costs ~50 ms on the tunnel rig);
        # the metadata vector is concatenated inside the section jit
        small, packed_h = yield (meta, packed)
        mark("serve C pull (meta+packed)")
        pos = 0
        starts_h, lens_h = {}, {}
        for nm, kk, _ in kts:
            starts_h[nm] = small[:, pos : pos + kk]; pos += kk
            lens_h[nm] = small[:, pos : pos + kk]; pos += kk
        stats_h = small[:, pos : pos + 2]
        is_raw = (stats_h[:, 1] != 0) & active
        sec_sizes = []  # per section: [S, k] used-byte counts
        for j, (nm, kk, _) in enumerate(kts):
            cap = bufs[nm].shape[2]
            sec_sizes.append(
                np.where(lens_h[nm] > 0, cap - starts_h[nm], 0).astype(np.int64)
            )
        tot_bytes = sum(ss.sum(axis=1) for ss in sec_sizes)  # [S]
        overflow = active & ~is_raw & (tot_bytes > pack_cap)

        if overflow.any():
            from screenpressor_tpu.jx.transfer import pow2_bucket

            # running pack bucket overflowed: exact tight gather fallback
            # (also grows the bucket for subsequent steps)
            self._pack_cap = pow2_bucket(
                int(tot_bytes[active & ~is_raw].max())
            )
            _BUCKET_CACHE[self._bucket_key] = (
                self._bcap, self._pack_cap, self._pack_cap_i)
            extra = [(dev_frames[i].reshape(-1), h * w * 3)
                     for i in np.nonzero(is_raw)[0]]
            tight, offs, sizes, extra_offs = _tight_pull(
                [bufs[nm] for nm, _, _ in kts],
                [starts_h[nm] for nm, _, _ in kts],
                [lens_h[nm] for nm, _, _ in kts],
                extra,
            )
            mark("serve D fallback tight pull (pack_cap grow)")
            raw_pos = {int(i): j for j, i in enumerate(np.nonzero(is_raw)[0])}

            def payload_of(i):
                return b"".join(
                    _section_bytes(tight, offs[j], sizes[j], i)
                    for j in range(len(kts))
                )

            def raw_bytes(i):
                off = extra_offs[raw_pos[i]]
                return tight[off : off + h * w * 3].tobytes()
        else:
            sec_payoff = np.zeros((s, len(kts) + 1), np.int64)
            for j, ss in enumerate(sec_sizes):
                sec_payoff[:, j + 1] = sec_payoff[:, j] + ss.sum(axis=1)

            def payload_of(i):
                # per section: status byte + minimal-width size table
                # (host-known) + the device-packed lane payload chunk
                parts = []
                for j, (nm, kk, _) in enumerate(kts):
                    sz = sec_sizes[j][i]
                    wd = bs.size_width(int(sz.max(initial=0)))
                    parts.append(bytes([bs.section_status_byte(kk, wd)]))
                    parts.append(sz.astype(f"<u{wd}").tobytes())
                    parts.append(
                        packed_h[i, sec_payoff[i, j] : sec_payoff[i, j + 1]]
                        .tobytes()
                    )
                return b"".join(parts)

            def raw_bytes(i):
                # raw frames are rare (photo-class content): pull directly
                return np.asarray(dev_frames[i]).tobytes()

        for i in range(s):
            if not active[i]:
                continue
            if is_raw[i]:
                out[i] = (
                    bytes([bs.header_byte(ALG_RAW)]) + raw_bytes(i),
                    FTYPE_I,
                )
                continue
            data = b"".join(
                [
                    hdr,
                    bytes([1]),
                    bs.pack_varint(
                        int(ch[i, 1]), int(ch[i, 2]), int(nums["bt"][i]),
                        int(nums["sxy"][i]), int(nums["mv"][i]),
                        int(nums["rec"][i]), int(nums["col"][i]),
                        int(n_data[i]),
                    ),
                    payload_of(i),
                ]
            )
            assert len(data) == int(stats_h[i, 0]), (len(data), stats_h[i, 0])
            out[i] = (data, FTYPE_P)
        mark("serve E assembly")
        return out


# ---------------------------------------------------------------------------
# Batched multi-stream decoding (VERDICT round-1 missing #3)
# ---------------------------------------------------------------------------


@functools.partial(_kernel_jit, static_argnames=("h", "w", "k", "t_rec", "t_col", "lr", "lc"))
def _batched_decode_i(pay, meta, tables_b, h, w, k, t_rec, t_col, lr, lc):
    """pay: [S, k*(lr+lc)] uint8, each stream's record + literal lane
    payloads flattened stream-major; meta: [S, 3] int32 (n_rec, n_lit,
    skip). Two uploads instead of five (tunnel dispatch economy)."""
    from screenpressor_tpu.jx.iframe import decode_i_device

    pay_rec = pay[:, : k * lr].reshape(-1, k, lr)
    pay_col = pay[:, k * lr :].reshape(-1, k, lc)
    n_rec_b, n_lit_b = meta[:, 0], meta[:, 1]
    skip = meta[:, 2].astype(bool)

    def one(pr, pc, n_rec, n_lit, sk, tables):
        n_rec = jnp.where(sk, 0, n_rec)
        n_lit = jnp.where(sk, 0, n_lit)
        frame, total, tables = decode_i_device(
            pr, pc, n_rec, n_lit, tables, h, w, k, t_rec, k, t_col,
            batched=True,
        )
        ok = sk | (total == h * w)
        return frame, ok, tables

    return jax.vmap(one)(pay_rec, pay_col, n_rec_b, n_lit_b, skip, tables_b)


@functools.partial(_kernel_jit, static_argnames=("h", "w", "k", "t_rec", "t_col", "lr", "lc"))
def _batched_decode_i_compact(pay, meta, prevs, tables_b, h, w, k,
                              t_rec, t_col, lr, lc):
    """Compacted I decode (mirror of _batched_encode_i_compact): the
    payload/count arrays arrive already compacted to the coded-I streams
    (pow2-padded, pad marks padding rows), each decodes from freshly
    renewed tables, and both the decoded frames and the updated table rows
    scatter back into the full batch (pads dropped out-of-bounds).
    pay: [C, k*(lr+lc)] uint8 flattened payloads; meta: [C, 4] int32
    (n_rec, n_lit, pad, idx) — two uploads instead of six.
    Returns ([S] frames with I rows replaced, [S] int32 error word,
    updated full table tree)."""
    from screenpressor_tpu.jx.iframe import decode_i_device

    pay_rec = pay[:, : k * lr].reshape(-1, k, lr)
    pay_col = pay[:, k * lr :].reshape(-1, k, lc)
    n_rec_s, n_lit_s = meta[:, 0], meta[:, 1]
    pad = meta[:, 2].astype(bool)
    idx = meta[:, 3]
    c = idx.shape[0]
    s = prevs.shape[0]
    fresh = renew_tables()
    tabs_s = jax.tree.map(lambda a: jnp.broadcast_to(a, (c,) + a.shape), fresh)

    def one(pr, pc, n_rec, n_lit, sk, tables):
        n_rec = jnp.where(sk, 0, n_rec)
        n_lit = jnp.where(sk, 0, n_lit)
        frame, total, tables = decode_i_device(
            pr, pc, n_rec, n_lit, tables, h, w, k, t_rec, k, t_col,
            batched=True,
        )
        ok = sk | (total == h * w)
        return frame, ok, tables

    frames_s, ok_s, tabs2 = jax.vmap(one)(
        pay_rec, pay_col, n_rec_s, n_lit_s, pad, tabs_s
    )
    idx_drop = jnp.where(pad, s, idx)
    frames = prevs.at[idx_drop].set(frames_s, mode="drop")
    err = jnp.zeros((s,), jnp.int32).at[idx_drop].set(
        (~ok_s).astype(jnp.int32), mode="drop"
    )
    tables_out = jax.tree.map(
        lambda b, sm: b.at[idx_drop].set(sm, mode="drop"), tables_b, tabs2
    )
    return frames, err, tables_out


@functools.partial(_kernel_jit, static_argnames=("h", "w", "nbx", "nby", "kts", "caps", "lls", "mcap", "bcap"))
def _batched_decode_p(pay_flat, meta, prevs, tables_b,
                      h, w, nbx, nby, kts, caps, lls, mcap, bcap):
    """Batched P decode with the motion gather fallback lifted ABOVE the
    stream vmap: under vmap apply_motion's per-stream lax.cond flattens to
    a select, so the rare per-pixel gather (for >MOTION_DISTINCT_CAP
    distinct or >rpad MVs) would run for all S streams every step — a
    measured ~150 ms of the 196 ms step decode at 64x360p. At top level the
    cond stays a real branch and the steady state never pays it.

    The host hands over exactly TWO arrays — pay_flat [S, sum(k*L)]
    (every section's [k, L] lane payload flattened per stream, stream-major
    so a dp sharding on axis 0 keeps stream locality; per-section L in
    static lls) and meta [S, 8] int32 (per-section counts, xx1, xx2,
    n_data) — because each host->device upload is its own ~3-5 ms dispatch
    on a tunnel rig."""
    from screenpressor_tpu.jx.pframe import (
        _SECTION_NAMES,
        apply_motion_gather,
        apply_motion_loop,
        decode_p_resolve,
        reconstruct_blocks,
    )

    s = prevs.shape[0]
    payloads_b = {}
    base = 0
    for (name, k, _), ll in zip(kts, lls):
        n = k * ll
        payloads_b[name] = pay_flat[:, base : base + n].reshape(s, k, ll)
        base += n
    ns_b = {name: meta[:, j] for j, name in enumerate(_SECTION_NAMES)}
    xx1_b, xx2_b, n_data_b = meta[:, 5], meta[:, 6], meta[:, 7]

    def one_resolve(payloads, ns, xx1, xx2, n_data, prev, tables):
        return decode_p_resolve(
            payloads, ns, xx1, xx2, n_data, prev, tables,
            h, w, nbx, nby, kts, caps, mcap, bcap, batched=True,
        )

    parts, err, tables2 = jax.vmap(one_resolve)(
        payloads_b, ns_b, xx1_b, xx2_b, n_data_b, prevs, tables_b
    )
    mo_rects, mo_mvs, d_rects, pt, rlg, lt = parts
    moved, resolved = jax.vmap(
        lambda pv, r, m: apply_motion_loop(pv, pv, r, m, h, w, mcap)
    )(prevs, mo_rects, mo_mvs)
    moved = jax.lax.cond(
        jnp.any(~resolved),
        lambda o: jax.vmap(
            lambda oo, pv, r, m, res: apply_motion_gather(
                oo, pv, r, m, res, h, w, mcap
            )
        )(o, prevs, mo_rects, mo_mvs, resolved),
        lambda o: o,
        moved,
    )
    frames = jax.vmap(
        lambda base, pv, a, b, c, d: reconstruct_blocks(
            base, pv, a, b, c, d, h, w, bcap
        )
    )(moved, prevs, d_rects, pt, rlg, lt)
    return frames, err, tables2


class BatchedDecoder:
    """Decode a batch of SPTC streams per call with device-resident per-stream
    state ([S] previous frames + [S] table sets in HBM).

    The batch may mix frame kinds (flat / raw / no-change / coded I / coded
    P); coded I and coded P streams are decoded in two vmapped device calls
    with per-stream skip masks, everything else is composed host-side.
    Counterpart of BatchedEncoder; accepts its streams (same k_fixed policy).
    """

    def __init__(self, n_streams: int, cfg: CodecConfig, sharding=None):
        """sharding: optional stream-axis Sharding (see BatchedEncoder)."""
        if cfg.k_fixed is None:
            cfg = dataclasses.replace(cfg, k_fixed=min(cfg.k_max, 256))
        self.cfg = cfg
        self.s = n_streams
        self.sharding = sharding
        t = renew_tables()
        self.tables_b = jax.tree.map(
            lambda a: self._dput(jnp.broadcast_to(a, (n_streams,) + a.shape)), t
        )
        self.prev = None  # device [S, H, W, 3] uint8
        self.last_flat = np.zeros(n_streams, bool)
        self.flat_color = np.zeros((n_streams, 3), np.uint8)
        # deferred (device err words, p_mask) from a device_out decode
        self._pending_err = None

    def _dput(self, a):
        x = jnp.asarray(a)
        return x if self.sharding is None else jax.device_put(x, self.sharding)

    def _renew_streams(self, mask: np.ndarray):
        if not mask.any():
            return
        self.tables_b = _renew_rows(
            self.tables_b, renew_tables_cached(), jnp.asarray(mask)
        )

    def decode(self, payloads, device_out: bool = False):
        """payloads: list of S frame byte strings -> [S, H, W, 3] frames."""
        from screenpressor_tpu.config import ALG_P, ALG_RAW, next_pow2
        from screenpressor_tpu.jx.iframe import parse_i_header
        from screenpressor_tpu.jx.pframe import (
            _SECTION_NAMES,
            parse_p_header,
        )

        self.validate()  # resolve the previous step's deferred error check
        cfg = self.cfg
        s, h, w = self.s, cfg.height, cfg.width
        assert len(payloads) == s
        k = cfg.k_fixed
        from screenpressor_tpu.jx.codec import _phase_timer
        mark = _phase_timer()

        renew_mask = np.zeros(s, bool)
        override = np.zeros(s, bool)       # frame comes from host/flat/prev
        override_val = np.zeros((s, h, w, 3), np.uint8)
        use_prev = np.zeros(s, bool)       # no-change P streams
        i_parse = [None] * s
        p_parse = [None] * s
        for i, data in enumerate(payloads):
            if not data:
                raise bs.CorruptStreamError(f"stream {i}: empty frame")
            alg = bs.parse_header_byte(data[0])
            if alg == ALG_FLAT:
                if len(data) < 4:
                    raise bs.CorruptStreamError(f"stream {i}: truncated flat")
                color = np.frombuffer(data[1:4], np.uint8)
                if not (self.last_flat[i] and (self.flat_color[i] == color).all()):
                    renew_mask[i] = True
                    self.flat_color[i] = color
                self.last_flat[i] = True
                override[i] = True
                override_val[i] = color
                continue
            self.last_flat[i] = False
            if alg == ALG_RAW:
                npix = h * w * 3
                if len(data) < 1 + npix:
                    raise bs.CorruptStreamError(f"stream {i}: truncated raw")
                override[i] = True
                override_val[i] = np.frombuffer(data, np.uint8, npix, 1).reshape(h, w, 3)
                renew_mask[i] = True
                continue
            if alg == ALG_I:
                renew_mask[i] = True
                i_parse[i] = parse_i_header(data, 1, cfg)
                continue
            if alg != ALG_P:
                raise bs.CorruptStreamError(f"stream {i}: unknown algorithm {alg}")
            if self.prev is None:
                raise bs.CorruptStreamError(f"stream {i}: P-frame before keyframe")
            parsed = parse_p_header(data, 1, cfg)
            if parsed is None:
                use_prev[i] = True
            else:
                p_parse[i] = parsed

        i_idx = [i for i, x in enumerate(i_parse) if x is not None]
        # the compact path renews the coded-I streams' table rows itself
        compact_i = self.sharding is None and 0 < len(i_idx) < s
        if compact_i:
            rm = renew_mask.copy()
            rm[np.asarray(i_idx)] = False
            self._renew_streams(rm)
        else:
            self._renew_streams(renew_mask)
        if self.prev is None:
            self.prev = self._dput(jnp.zeros((s, h, w, 3), jnp.uint8))
        frames = None
        checks = []

        # ---- coded I streams (one vmapped call over the compacted coded
        # rows on a staggered-keyframe step, full batch on the sharded path) ----
        if i_idx:
            t_rec = t_col = 1
            lr = lc = 4
            for x in i_parse:
                if x is None:
                    continue
                pay_rec, pay_col, n_rec, n_lit = x[0], x[1], x[2], x[3]
                t_rec = max(t_rec, jc._pad_steps(-(-max(n_rec, 1) // k)))
                t_col = max(t_col, jc._pad_steps(-(-max(n_lit, 1) // k)))
                lr = max(lr, pay_rec.shape[1])
                lc = max(lc, pay_col.shape[1])
            lr, lc = next_pow2(lr), next_pow2(lc)
            if compact_i:
                c = next_pow2(len(i_idx))
                pr = np.zeros((c, k, lr), np.uint8)
                pc = np.zeros((c, k, lc), np.uint8)
                meta_i = np.zeros((c, 4), np.int32)
                meta_i[:, 2] = np.arange(c) >= len(i_idx)  # pad rows
                meta_i[:, 3] = np.resize(np.asarray(i_idx, np.int64), c)
                for j, i in enumerate(i_idx):
                    x = i_parse[i]
                    pr[j, :, : x[0].shape[1]] = np.asarray(x[0])
                    pc[j, :, : x[1].shape[1]] = np.asarray(x[1])
                    meta_i[j, 0], meta_i[j, 1] = x[2], x[3]
                pay = np.concatenate(
                    [pr.reshape(c, -1), pc.reshape(c, -1)], axis=1)
                mark("serve dec I stage")
                frames, err_i, self.tables_b = _batched_decode_i_compact(
                    self._dput(pay), self._dput(meta_i),
                    self.prev, self.tables_b, h, w, k, t_rec, t_col, lr, lc,
                )
                checks.append(err_i)
            else:
                pr = np.zeros((s, k, lr), np.uint8)
                pc = np.zeros((s, k, lc), np.uint8)
                meta_i = np.zeros((s, 3), np.int32)
                meta_i[:, 2] = 1  # skip by default
                for i, x in enumerate(i_parse):
                    if x is None:
                        continue
                    meta_i[i, 2] = 0
                    pr[i, :, : x[0].shape[1]] = np.asarray(x[0])
                    pc[i, :, : x[1].shape[1]] = np.asarray(x[1])
                    meta_i[i, 0], meta_i[i, 1] = x[2], x[3]
                pay = np.concatenate(
                    [pr.reshape(s, -1), pc.reshape(s, -1)], axis=1)
                skip = meta_i[:, 2].astype(bool)
                mark("serve dec I stage")
                dec_frames, ok, self.tables_b = _batched_decode_i(
                    self._dput(pay), self._dput(meta_i), self.tables_b,
                    h, w, k, t_rec, t_col, lr, lc,
                )
                checks.append(
                    (~ok).astype(jnp.int32) * jnp.asarray(~skip, jnp.int32))
                frames = dec_frames

        # ---- coded P streams (one vmapped call, skip-masked) ----
        if any(x is not None for x in p_parse):
            maxn = {name: 1 for name in _SECTION_NAMES}
            maxl = {name: 4 for name in _SECTION_NAMES}
            max_mv = max_data = 1
            for x in p_parse:
                if x is None:
                    continue
                pl, ns, kts, caps, (xx1, xx2, n_mv, n_data) = x
                for j, name in enumerate(_SECTION_NAMES):
                    maxn[name] = max(maxn[name], int(ns[name]))
                    maxl[name] = max(maxl[name], pl[name].shape[1])
                max_mv = max(max_mv, n_mv)
                max_data = max(max_data, n_data)
            kts = tuple(
                (name, k, jc._pad_steps(-(-maxn[name] // k))) for name in _SECTION_NAMES
            )
            caps = tuple(next_pow2(maxn[name]) for name in _SECTION_NAMES)
            lls = tuple(next_pow2(maxl[name]) for name in _SECTION_NAMES)
            mcap, bcap = next_pow2(max_mv), next_pow2(max_data)
            pay_b = {
                name: np.zeros((s, k, ll), np.uint8)
                for name, ll in zip(_SECTION_NAMES, lls)
            }
            # two uploads total: flat payload bytes + int32 meta (counts,
            # xx range, data blocks) — see _batched_decode_p
            meta = np.zeros((s, 8), np.int32)
            meta[:, 6] = -1  # skip streams: empty xx range
            p_mask = np.zeros(s, bool)
            for i, x in enumerate(p_parse):
                if x is None:
                    continue
                p_mask[i] = True
                pl, ns, _kts, _caps, (xx1, xx2, n_mv, n_data) = x
                for j, name in enumerate(_SECTION_NAMES):
                    a = np.asarray(pl[name])
                    pay_b[name][i, :, : a.shape[1]] = a
                    meta[i, j] = int(ns[name])
                meta[i, 5], meta[i, 6], meta[i, 7] = xx1, xx2, n_data
            pay_flat = np.concatenate(
                [pay_b[name].reshape(s, -1) for name in _SECTION_NAMES], axis=1
            )
            mark("serve dec P stage")
            p_frames, err, self.tables_b = _batched_decode_p(
                self._dput(pay_flat), self._dput(meta),
                self.prev, self.tables_b,
                h, w, cfg.nbx, cfg.nby, kts, caps, lls, mcap, bcap,
            )
            checks.append(err * jnp.asarray(p_mask, jnp.int32))
            pm = jnp.asarray(p_mask).reshape(s, 1, 1, 1)
            frames = p_frames if frames is None else jnp.where(pm, p_frames, frames)
        else:
            p_mask = np.zeros(s, bool)

        # ---- compose overrides / no-change streams ----
        if frames is None:
            frames = self.prev
        if use_prev.any() and frames is not self.prev:
            sel_prev = jnp.asarray(use_prev).reshape(s, 1, 1, 1)
            frames = jnp.where(sel_prev, self.prev, frames)
        if override.any():
            ov = jnp.asarray(override).reshape(s, 1, 1, 1)
            frames = jnp.where(ov, jnp.asarray(override_val), frames)

        mark("serve dec P dispatch")
        self.prev = frames
        if checks:
            errs_d = jnp.stack(checks)  # [n_checks, S] device error words
            if device_out:
                # serving mode: defer the blocking error pull — it would
                # otherwise sync on the whole step's decode compute
                # (measured ~0.3 s/step at 64x360p). Start the host copy
                # now; the NEXT decode()/validate() resolves it with ~zero
                # wait. A corrupt stream therefore raises one step late in
                # device_out mode (the session state is poisoned either
                # way; api-level crash-latch semantics are unchanged).
                try:
                    errs_d.copy_to_host_async()
                except Exception:
                    pass
                self._pending_err = (errs_d, p_mask)
            else:
                self._raise_errs(np.asarray(jax.device_get(errs_d)), p_mask)
        mark("serve dec checks pull")
        if device_out:
            return frames
        return np.asarray(frames)

    def _raise_errs(self, errs: np.ndarray, p_mask: np.ndarray):
        """Raise for the FIRST failing stream by index (round-2 weak #9:
        never max-conflate the batch)."""
        from screenpressor_tpu.jx.pframe import raise_p_error

        if not errs.any():
            return
        sidx = int(np.nonzero(errs.any(axis=0))[0][0])
        bad = int(errs[:, sidx].max())
        if bad == 1 and not p_mask[sidx]:
            raise bs.CorruptStreamError(
                f"stream {sidx}: records do not tile frame")
        try:
            raise_p_error(bad)
        except bs.CorruptStreamError as e:
            raise bs.CorruptStreamError(f"stream {sidx}: {e}") from None

    def validate(self):
        """Resolve a deferred error check from a prior device_out decode.
        Called automatically at the start of the next decode(); call
        explicitly after the last step of a serving session."""
        pend = self._pending_err
        self._pending_err = None
        if pend is not None:
            errs_d, p_mask = pend
            self._raise_errs(np.asarray(jax.device_get(errs_d)), p_mask)


def serve_pipelined(enc: BatchedEncoder, batches, dec: BatchedDecoder | None = None,
                    device_out: bool = True):
    """Drive a serving loop with one-step encoder lookahead.

    Yields, per input batch and in order, `(outs, decoded)` where `outs` is
    the encode() result list and `decoded` is dec's frame batch for it
    (None when dec is None). Step t+1's analysis/classification device work
    is dispatched BEFORE step t's tunnel pulls and host payload assembly,
    so sync latency and host time hide behind queued device compute. Output
    bytes are identical to calling enc.encode()/dec.decode() step by step
    (the lookahead phases depend only on the frame pair, not the adaptive
    tables).
    """
    pend = None
    for frames in batches:
        nxt = enc.encode_begin(frames)
        if pend is not None:
            outs = enc.encode_finish(pend)
            dec_frames = (None if dec is None else
                          dec.decode([p for p, _ in outs], device_out=device_out))
            yield outs, dec_frames
        pend = nxt
    if pend is not None:
        outs = enc.encode_finish(pend)
        dec_frames = (None if dec is None else
                      dec.decode([p for p, _ in outs], device_out=device_out))
        yield outs, dec_frames
