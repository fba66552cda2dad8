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
)
from screenpressor_tpu.jx import blocks as jb
from screenpressor_tpu.jx import coder as jc
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
def reconstruct_blocks(prev, rects, ptypes, rlens, lits, h: int, w: int, bcap: int):
    """Rebuild all data blocks and scatter into a copy of prev.

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
    out = prev.astype(jnp.int32).reshape(h * w, 3)
    out = out.at[flat_idx.reshape(-1)].set(
        grids.reshape(-1, 3), mode="drop"
    )
    return out.reshape(h, w, 3).astype(jnp.uint8)


_SECTION_NAMES = ("bt", "sxy", "mv", "rec", "col")
_SECTION_WIDTHS = {"bt": 2, "sxy": 4, "mv": 2, "rec": 2, "col": 3}


@functools.partial(jax.jit, static_argnames=("kts",))
def encode_sections_device(recs_cap, ns, tables, kts):
    """Fused encode of all five P sections.

    recs_cap: dict name -> [cap, W] capacity record arrays; ns: dict of traced
    counts; kts: tuple of (name, k, t) statics. Returns (bufs, starts, lens
    dicts, tables)."""
    bufs, starts, lens_out = {}, {}, {}
    for name, k, t in kts:
        n = ns[name]
        dealt = jc.deal_device(recs_cap[name], n, k, t)
        lens = jc.lane_lens_device(n, k)
        nsub = len(jc.CODECS[name].kinds)
        cum, freq, act, tables = jc.model_scan(dealt, lens, tables, name, k, t)
        buf, start = jc.rans_pack(cum, freq, act, 2 * t * nsub + 8)
        bufs[name], starts[name], lens_out[name] = buf, start, lens
    return bufs, starts, lens_out, tables


@functools.partial(jax.jit, static_argnames=("kts", "caps"))
def decode_sections_device(payloads, ns, tables, kts, caps):
    """Fused decode of all five P sections -> global record arrays."""
    out = {}
    for (name, k, t), cap in zip(kts, caps):
        n = ns[name]
        lens = jc.lane_lens_device(n, k)
        scan_out, tables = jc.decode_section_scan(payloads[name], lens, tables, name, k, t)
        out[name] = jc.undeal_device(scan_out, n, k, cap)
    return out, tables


@functools.partial(jax.jit, static_argnames=("h", "w", "mcap", "bcap"))
def rebuild_frame_device(prev, mo_rects, mo_mvs, d_rects, d_pt, d_rl, d_lt,
                         h: int, w: int, mcap: int, bcap: int):
    """Fused motion-apply + data-block reconstruction."""
    out = apply_motion(prev, prev, mo_rects, mo_mvs, h, w, mcap)
    out = reconstruct_blocks(out, d_rects, d_pt, d_rl, d_lt, h, w, bcap)
    return out


@functools.partial(jax.jit, static_argnames=("h", "w", "mcap"))
def apply_motion(frame, prev, rects, mvs, h: int, w: int, mcap: int):
    """Copy motion blocks from prev (shifted) into frame.
    rects [mcap,4]; mvs [mcap,2]; padded rows must have x2<=x1."""
    # pad bottom/right so fixed 16x16 slices never get start-clamped
    prev32 = jnp.pad(prev.astype(jnp.int32), ((0, BLOCK), (0, BLOCK), (0, 0)))

    def per_block(rect, mv):
        x1, y1 = rect[0], rect[1]
        sx, sy = x1 + mv[0], y1 + mv[1]
        return jax.lax.dynamic_slice(
            prev32, (jnp.maximum(sy, 0), jnp.maximum(sx, 0), 0), (BLOCK, BLOCK, 3)
        )

    wins = jax.vmap(per_block)(rects, mvs)
    ry = jnp.arange(BLOCK)[None, :, None]
    rx = jnp.arange(BLOCK)[None, None, :]
    bw = (rects[:, 2] - rects[:, 0])[:, None, None]
    bh = (rects[:, 3] - rects[:, 1])[:, None, None]
    ys = rects[:, 1][:, None, None] + ry
    xs = rects[:, 0][:, None, None] + rx
    valid = (ry < bh) & (rx < bw)
    flat_idx = jnp.where(valid, ys * w + xs, h * w)
    out = frame.astype(jnp.int32).reshape(h * w, 3)
    out = out.at[flat_idx.reshape(-1)].set(wins.reshape(-1, 3), mode="drop")
    return out.reshape(h, w, 3).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Frame encode / decode
# ---------------------------------------------------------------------------


def encode_p(frame, prev, tables, cfg: CodecConfig):
    h, w = cfg.height, cfg.width
    frame = np.asarray(frame)
    prev = np.asarray(prev)
    bts, rect_d, mv_d = jb.analyze_p(frame, prev, cfg)
    hdr = bytes([bs.header_byte(ALG_P)])
    if not bts.any():
        return hdr + bytes([0]), tables

    changed = np.nonzero(bts)[0]
    xx1, xx2 = int(changed[0]), int(changed[-1])
    bt_recs = rle_blocks(bts, xx1, xx2)

    sxy_recs, mv_recs = [], []
    data_bis = []
    for bi in changed:
        bi = int(bi)
        bt = int(bts[bi])
        x1, y1, x2, y2 = rect_d[bi]
        bx, by = bi % cfg.nbx, bi // cfg.nbx
        if bt in (BT_PARTIAL_DATA, BT_PARTIAL_MOTION):
            sxy_recs.append(
                (x1 - bx * BLOCK, y1 - by * BLOCK, x2 - 1 - bx * BLOCK, y2 - 1 - by * BLOCK)
            )
        if bt in (BT_FULL_MOTION, BT_PARTIAL_MOTION):
            mv_recs.append(mv_d[bi])
        if bt in (BT_FULL_DATA, BT_PARTIAL_DATA):
            data_bis.append(bi)

    pix_recs = np.zeros((0, 2), np.int32)
    lit_recs = np.zeros((0, 3), np.int32)
    if data_bis:
        bcap = next_pow2(len(data_bis))
        rects = np.zeros((bcap, 4), np.int32)
        for i, bi in enumerate(data_bis):
            rects[i] = rect_d[bi]
        ptypes, rlens, n_recs, lits, is_lit = classify_blocks(
            jnp.asarray(frame), jnp.asarray(prev), jnp.asarray(rects), h, w, bcap
        )
        ptypes, rlens = np.asarray(ptypes), np.asarray(rlens)
        n_recs, lits, is_lit = np.asarray(n_recs), np.asarray(lits), np.asarray(is_lit)
        prs, lrs = [], []
        for i in range(len(data_bis)):
            nr = int(n_recs[i])
            prs.append(np.stack([ptypes[i, :nr], rlens[i, :nr]], axis=1))
            lrs.append(lits[i][is_lit[i]])
        pix_recs = np.concatenate(prs, axis=0) if prs else pix_recs
        lit_recs = np.concatenate(lrs, axis=0) if lrs else lit_recs

    rec_arrays = {
        "bt": np.asarray([list(r) for r in bt_recs], np.int32).reshape(-1, 2),
        "sxy": np.asarray([list(r) for r in sxy_recs], np.int32).reshape(-1, 4),
        "mv": np.asarray([list(r) for r in mv_recs], np.int32).reshape(-1, 2),
        "rec": np.asarray(pix_recs, np.int32).reshape(-1, 2),
        "col": np.asarray(lit_recs, np.int32).reshape(-1, 3),
    }
    kts = []
    recs_cap, ns = {}, {}
    for name in _SECTION_NAMES:
        arr = rec_arrays[name]
        n = len(arr)
        k = cfg.lanes(n)
        t = jc._pad_steps(-(-n // k)) if n else 1
        kts.append((name, k, t))
        cap = next_pow2(max(n, 1))
        pad = np.zeros((cap, _SECTION_WIDTHS[name]), np.int32)
        pad[:n] = arr
        recs_cap[name] = jnp.asarray(pad)
        ns[name] = jnp.int32(n)
    bufs, starts, lens_l, tables = encode_sections_device(recs_cap, ns, tables, tuple(kts))
    bufs, starts, lens_l = jax.device_get((bufs, starts, lens_l))
    sections = []
    for name, k, t in kts:
        blobs = [
            bytes(bufs[name][i, starts[name][i] :].tobytes()) if lens_l[name][i] > 0 else b""
            for i in range(k)
        ]
        sections.append(bs.pack_section(blobs))

    data = b"".join(
        [
            hdr,
            bytes([1]),
            bs.pack_u32(
                xx1, xx2, len(bt_recs), len(sxy_recs), len(mv_recs),
                len(pix_recs), len(lit_recs),
            ),
        ]
        + sections
    )
    return data, tables


def decode_p(data: bytes, pos: int, prev, tables, cfg: CodecConfig):
    h, w = cfg.height, cfg.width
    if pos >= len(data):
        raise bs.CorruptStreamError("truncated P-frame")
    flags = data[pos]
    pos += 1
    if not flags & 1:
        return jnp.asarray(prev), tables
    (xx1, xx2, n_bt, n_sxy, n_mv, n_pix, n_lit), pos = bs.read_u32(data, pos, 7)

    counts = {"bt": n_bt, "sxy": n_sxy, "mv": n_mv, "rec": n_pix, "col": n_lit}
    kts, caps = [], []
    payloads, ns = {}, {}
    for name in _SECTION_NAMES:
        n = counts[name]
        k = cfg.lanes(n)
        blobs, pos = bs.unpack_section(data, pos, k)
        t = jc._pad_steps(-(-n // k)) if n else 1
        kts.append((name, k, t))
        caps.append(next_pow2(max(n, 1)))
        max_len = max(max((len(b) for b in blobs), default=0), 4)
        pay = np.zeros((k, next_pow2(max_len)), np.uint8)
        for i, b in enumerate(blobs):
            pay[i, : len(b)] = np.frombuffer(b, np.uint8)
        payloads[name] = jnp.asarray(pay)
        ns[name] = jnp.int32(n)
    recs, tables = decode_sections_device(payloads, ns, tables, tuple(kts), tuple(caps))
    recs = jax.device_get(recs)
    bt_recs = recs["bt"][:n_bt]
    sxy_recs = recs["sxy"][:n_sxy]
    mv_recs = recs["mv"][:n_mv]
    pix_recs = recs["rec"][:n_pix]
    lit_recs = recs["col"][:n_lit]

    nb = cfg.nbx * cfg.nby
    bts = np.zeros(nb, np.int32)
    x = xx1
    for bt, n in bt_recs:
        if x + n > xx2 + 1:
            raise bs.CorruptStreamError("block-type runs overflow xx range")
        bts[x : x + n] = bt
        x += n
    if x != xx2 + 1:
        raise bs.CorruptStreamError("block-type runs do not cover xx range")

    # resolve rects and per-block record slices
    si = mi = 0
    data_rects, data_slices = [], []
    mo_rects, mo_mvs = [], []
    pix_cursor = 0
    lit_cursor = 0
    areas = pix_recs[:, 1] if n_pix else np.zeros((0,), np.int32)
    pix_lit_flags = (pix_recs[:, 0] == PT_LITERAL) if n_pix else np.zeros((0,), bool)
    for bi in np.nonzero(bts)[0]:
        bi = int(bi)
        bt = int(bts[bi])
        bx, by = bi % cfg.nbx, bi // cfg.nbx
        x_lo, y_lo = bx * BLOCK, by * BLOCK
        x_hi, y_hi = min(x_lo + BLOCK, w), min(y_lo + BLOCK, h)
        if bt in (BT_PARTIAL_DATA, BT_PARTIAL_MOTION):
            sx1, sy1, sx2, sy2 = (int(v) for v in sxy_recs[si])
            si += 1
            rect = (x_lo + sx1, y_lo + sy1, x_lo + sx2 + 1, y_lo + sy2 + 1)
        else:
            rect = (x_lo, y_lo, x_hi, y_hi)
        x1, y1, x2, y2 = rect
        if not (x_lo <= x1 < x2 <= x_hi and y_lo <= y1 < y2 <= y_hi):
            raise bs.CorruptStreamError("sub-rect outside block")
        if bt in (BT_FULL_MOTION, BT_PARTIAL_MOTION):
            mx, my = (int(v) for v in mv_recs[mi])
            mi += 1
            if x1 + mx < 0 or y1 + my < 0 or x2 + mx > w or y2 + my > h:
                raise bs.CorruptStreamError("motion vector out of bounds")
            mo_rects.append(rect)
            mo_mvs.append((mx, my))
        else:
            area = (x2 - x1) * (y2 - y1)
            covered = 0
            start = pix_cursor
            while covered < area:
                if pix_cursor >= n_pix:
                    raise bs.CorruptStreamError("pixel records exhausted")
                covered += int(areas[pix_cursor])
                pix_cursor += 1
            if covered != area:
                raise bs.CorruptStreamError("pixel records do not tile block")
            nlit = int(pix_lit_flags[start:pix_cursor].sum())
            data_rects.append(rect)
            data_slices.append((start, pix_cursor, lit_cursor, lit_cursor + nlit))
            lit_cursor += nlit

    mcap = next_pow2(max(len(mo_rects), 1))
    mr = np.zeros((mcap, 4), np.int32)
    mm = np.zeros((mcap, 2), np.int32)
    if mo_rects:
        mr[: len(mo_rects)] = mo_rects
        mm[: len(mo_mvs)] = mo_mvs
    bcap = next_pow2(max(len(data_rects), 1))
    dr = np.zeros((bcap, 4), np.int32)
    pt = np.zeros((bcap, AREA), np.int32)
    rl = np.zeros((bcap, AREA), np.int32)
    lt = np.zeros((bcap, AREA, 3), np.int32)
    for i, (rect, (rs, re, ls, le)) in enumerate(zip(data_rects, data_slices)):
        dr[i] = rect
        nr = re - rs
        pt[i, :nr] = pix_recs[rs:re, 0]
        rl[i, :nr] = pix_recs[rs:re, 1]
        block_lits = lit_recs[ls:le] if le > ls else np.zeros((0, 3), np.int32)
        lit_map = np.nonzero(pix_recs[rs:re, 0] == PT_LITERAL)[0]
        lt[i, lit_map] = block_lits
    out = rebuild_frame_device(
        jnp.asarray(prev), jnp.asarray(mr), jnp.asarray(mm), jnp.asarray(dr),
        jnp.asarray(pt), jnp.asarray(rl), jnp.asarray(lt), h, w, mcap, bcap,
    )
    return out, tables
