"""P-frame encode/decode — numpy specification.

Reference analogs: `CompressP`/`DecompressP` (`screencap.cpp:1091-1432`),
P-frame pixel predictors (`GetPixelTypeP`/`PixelTypeFitsP`,
`screencap.cpp:525-604`). SPTC1 differences (FORMAT.md): sectioned layout,
blocks are independent (out-of-subrect neighbors read the previous frame),
and the MV same-flag chains lane-locally.
"""

from __future__ import annotations

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
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LEFT,
    PT_LITERAL,
    PT_PREVFRAME,
)
from screenpressor_tpu.spec import blocks as blk
from screenpressor_tpu.spec.classify import run_tables, segment
from screenpressor_tpu.spec.coder import (
    BTCodec,
    ColCodec,
    MVCodec,
    RecCodec,
    SxyCodec,
    decode_section,
    encode_section,
)
from screenpressor_tpu.spec.tables import TableSet


def _block_neighbors(cur32, prev32, rect):
    """Neighbor planes for a sub-rect in block raster order.

    Returns (vals, avail) dicts keyed by ptype for 1,2,3,4,5 plus scan-prev.
    In-sub-rect neighbors read the current block; everything else reads the
    previous frame (FORMAT.md block-independence rule).
    """
    x1, y1, x2, y2 = rect
    bw, bh = x2 - x1, y2 - y1
    c = cur32[y1:y2, x1:x2]

    left = np.empty((bh, bw, 3), np.int32)
    left[:, 1:] = c[:, :-1]
    left[:, 0] = prev32[y1:y2, x1 - 1] if x1 > 0 else 0
    avail_l = np.ones((bh, bw), bool)
    if x1 == 0:
        avail_l[:, 0] = False

    above = np.empty((bh, bw, 3), np.int32)
    above[1:] = c[:-1]
    above[0] = prev32[y1 - 1, x1:x2] if y1 > 0 else 0
    avail_a = np.ones((bh, bw), bool)
    if y1 == 0:
        avail_a[0] = False

    al = np.empty((bh, bw, 3), np.int32)
    al[1:, 1:] = c[:-1, :-1]
    if y1 > 0:
        al[0, 1:] = prev32[y1 - 1, x1 : x2 - 1]
    if x1 > 0:
        al[1:, 0] = prev32[y1 : y2 - 1, x1 - 1]
    if x1 > 0 and y1 > 0:
        al[0, 0] = prev32[y1 - 1, x1 - 1]
    avail_al = avail_l & avail_a

    pf = prev32[y1:y2, x1:x2]
    flat = c.reshape(-1, 3)
    scanprev = np.empty_like(flat)
    scanprev[1:] = flat[:-1]
    scanprev[0] = 0
    return c, left, above, al, pf, scanprev, avail_l, avail_a, avail_al


def classify_block_p(cur32, prev32, rect):
    """Sub-rect -> (records [(ptype, n)], literals [(r,g,b)])."""
    x1, y1, x2, y2 = rect
    bw, bh = x2 - x1, y2 - y1
    n = bw * bh
    c, left, above, al, pf, scanprev, avail_l, avail_a, avail_al = _block_neighbors(
        cur32, prev32, rect
    )
    eq = lambda a, b: (a == b).all(axis=-1)
    fits = np.zeros((n, 6), bool)
    f0 = eq(c.reshape(-1, 3), scanprev)
    f0[0] = False
    fits[:, PT_LITERAL] = f0
    fits[:, PT_LEFT] = (eq(c, left) & avail_l).reshape(-1)
    fits[:, PT_ABOVE] = (eq(c, above) & avail_a).reshape(-1)
    fits[:, PT_PREVFRAME] = eq(c, pf).reshape(-1)
    fits[:, PT_GRADIENT] = (eq(c, left + above - al) & avail_al).reshape(-1)
    fits[:, PT_ABOVELEFT] = (eq(c, al) & avail_al).reshape(-1)

    st = np.full(n, PT_LITERAL, np.int32)
    for p in (PT_GRADIENT, PT_ABOVE, PT_ABOVELEFT, PT_PREVFRAME, PT_LEFT):
        st = np.where(fits[:, p], p, st)

    runs = run_tables(fits)
    segs = segment(st, runs, n)
    flat = c.reshape(-1, 3)
    records = [(t, ln) for _, t, ln in segs]
    literals = [tuple(int(v) for v in flat[s]) for s, t, _ in segs if t == PT_LITERAL]
    return records, literals


def reconstruct_block_p(out32, prev32, rect, records, literals, lit_base):
    """Rebuild a data block's sub-rect in place; returns literals consumed."""
    x1, y1, x2, y2 = rect
    bw, bh = x2 - x1, y2 - y1
    n = bw * bh
    pt = np.empty(n, np.int32)
    litidx = np.full(n, -1, np.int64)
    i = 0
    li = lit_base
    for t, ln in records:
        pt[i : i + ln] = t
        if t == PT_LITERAL:
            litidx[i : i + ln] = li
            li += 1
        i += ln
    assert i == n, (i, n)
    lits = np.asarray(literals, np.int32).reshape(-1, 3)
    pt = pt.reshape(bh, bw)
    litidx = litidx.reshape(bh, bw)

    for ry in range(bh):
        y = y1 + ry
        above = (
            out32[y - 1, x1:x2]
            if ry > 0
            else (prev32[y - 1, x1:x2] if y > 0 else np.zeros((bw, 3), np.int32))
        )
        al = np.empty((bw, 3), np.int32)
        al[1:] = above[:-1]
        # aboveleft of the sub-rect's left column is outside the sub-rect ->
        # previous frame (same rule the encoder used in _block_neighbors)
        al[0] = prev32[y - 1, x1 - 1] if (x1 > 0 and y > 0) else 0
        left_edge = prev32[y, x1 - 1] if x1 > 0 else np.zeros(3, np.int32)

        row_pt = pt[ry]
        known = np.zeros((bw, 3), np.int32)
        reset = np.zeros(bw, bool)
        m0 = row_pt == PT_LITERAL
        known[m0] = lits[litidx[ry][m0]]
        reset |= m0
        m2 = row_pt == PT_ABOVE
        known[m2] = above[m2]
        reset |= m2
        m3 = row_pt == PT_PREVFRAME
        known[m3] = prev32[y, x1:x2][m3]
        reset |= m3
        m5 = row_pt == PT_ABOVELEFT
        known[m5] = al[m5]
        reset |= m5
        d = np.zeros((bw, 3), np.int32)
        m4 = row_pt == PT_GRADIENT
        d[m4] = (above - al)[m4]
        # left-propagating types at the sub-rect's left edge reset from prev
        if row_pt[0] == PT_LEFT:
            known[0] = left_edge
            reset[0] = True
        elif row_pt[0] == PT_GRADIENT:
            known[0] = left_edge + above[0] - al[0]
            reset[0] = True
        lr = np.maximum.accumulate(np.where(reset, np.arange(bw), -1))
        dm = np.where(reset[:, None], 0, d)
        cs = np.cumsum(dm, axis=0)
        # every row starts with a reset (row_pt[0] is one of 0/2/3/5 or the
        # left-edge rule above), so lr >= 0 everywhere
        assert lr[0] >= 0
        row = known[lr] + cs - cs[lr]
        out32[y, x1:x2] = row
    return li - lit_base


def _expand_propagated_lit(records):
    """Propagate ptype-0 extension semantics: all pixels of a ptype-0 run
    carry the record's literal (run extends on scan-prev equality)."""
    # handled inside reconstruct via litidx fill; nothing to do
    return records


def encode_p(frame: np.ndarray, prev: np.ndarray, tables: TableSet, cfg: CodecConfig) -> bytes:
    h, w, _ = frame.shape
    bts, rects, mvs = blk.analyze_p(frame, prev, cfg)
    hdr = bytes([bs.header_byte(ALG_P)])
    if not bts.any():
        return hdr + bytes([0])  # no changes

    changed = np.nonzero(bts)[0]
    xx1, xx2 = int(changed[0]), int(changed[-1])
    bt_recs = blk.rle_blocks(bts, xx1, xx2)

    cur32 = frame.astype(np.int32)
    prev32 = prev.astype(np.int32)
    sxy_recs, mv_recs, pix_recs, lit_recs = [], [], [], []
    for bi in changed:
        bi = int(bi)
        bt = int(bts[bi])
        x1, y1, x2, y2 = rects[bi]
        bx, by = bi % cfg.nbx, bi // cfg.nbx
        if bt in (BT_PARTIAL_DATA, BT_PARTIAL_MOTION):
            sxy_recs.append(
                (x1 - bx * BLOCK, y1 - by * BLOCK, x2 - 1 - bx * BLOCK, y2 - 1 - by * BLOCK)
            )
        if bt in (BT_FULL_MOTION, BT_PARTIAL_MOTION):
            mv_recs.append(mvs[bi])
        if bt in (BT_FULL_DATA, BT_PARTIAL_DATA):
            recs, lits = classify_block_p(cur32, prev32, rects[bi])
            pix_recs.extend(recs)
            lit_recs.extend(lits)

    n_data = sum(1 for bi in changed if int(bts[bi]) in (BT_FULL_DATA, BT_PARTIAL_DATA))

    sections = []
    for recs, codec in (
        (bt_recs, BTCodec()),
        (sxy_recs, SxyCodec()),
        (mv_recs, MVCodec()),
        (pix_recs, RecCodec()),
        (lit_recs, ColCodec()),
    ):
        k = cfg.lanes(len(recs))
        sections.append(bs.pack_section(encode_section(recs, k, tables, codec)))

    return b"".join(
        [
            hdr,
            bytes([1]),
            bs.pack_varint(xx1, xx2, len(bt_recs), len(sxy_recs), len(mv_recs), len(pix_recs), len(lit_recs), n_data),
        ]
        + sections
    )


def decode_p(data: bytes, pos: int, prev: np.ndarray, tables: TableSet, cfg: CodecConfig) -> np.ndarray:
    if pos >= len(data):
        raise bs.CorruptStreamError("truncated P-frame")
    flags = data[pos]
    pos += 1
    if not flags & 1:
        return prev.copy()
    (xx1, xx2, n_bt, n_sxy, n_mv, n_pix, n_lit, n_data), pos = bs.read_varint(data, pos, 8)

    recs_by = []
    for n_recs, codec in (
        (n_bt, BTCodec()),
        (n_sxy, SxyCodec()),
        (n_mv, MVCodec()),
        (n_pix, RecCodec()),
        (n_lit, ColCodec()),
    ):
        k = cfg.lanes(n_recs)
        blobs, pos = bs.unpack_section(data, pos, k)
        recs_by.append(decode_section(blobs, n_recs, k, tables, codec))
    bt_recs, sxy_recs, mv_recs, pix_recs, lit_recs = recs_by

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
    if int(np.sum((bts == BT_FULL_DATA) | (bts == BT_PARTIAL_DATA))) != n_data:
        raise bs.CorruptStreamError("data block count mismatch")

    h, w = cfg.height, cfg.width
    out32 = prev.astype(np.int32)
    prev32 = prev.astype(np.int32)
    si = mi = pi = li = 0
    for bi in np.nonzero(bts)[0]:
        bi = int(bi)
        bt = int(bts[bi])
        bx, by = bi % cfg.nbx, bi // cfg.nbx
        x_lo, y_lo = bx * BLOCK, by * BLOCK
        x_hi, y_hi = min(x_lo + BLOCK, w), min(y_lo + BLOCK, h)
        if bt in (BT_PARTIAL_DATA, BT_PARTIAL_MOTION):
            sx1, sy1, sx2, sy2 = sxy_recs[si]
            si += 1
            rect = (x_lo + sx1, y_lo + sy1, x_lo + sx2 + 1, y_lo + sy2 + 1)
        else:
            rect = (x_lo, y_lo, x_hi, y_hi)
        x1, y1, x2, y2 = rect
        if not (x_lo <= x1 < x2 <= x_hi and y_lo <= y1 < y2 <= y_hi):
            raise bs.CorruptStreamError("sub-rect outside block")
        if bt in (BT_FULL_MOTION, BT_PARTIAL_MOTION):
            mx, my = mv_recs[mi]
            mi += 1
            sx, sy = x1 + mx, y1 + my
            if sx < 0 or sy < 0 or sx + (x2 - x1) > w or sy + (y2 - y1) > h:
                raise bs.CorruptStreamError("motion vector out of bounds")
            out32[y1:y2, x1:x2] = prev32[sy : sy + y2 - y1, sx : sx + x2 - x1]
        else:
            area = (x2 - x1) * (y2 - y1)
            covered = 0
            recs = []
            while covered < area:
                if pi >= len(pix_recs):
                    raise bs.CorruptStreamError("pixel records exhausted")
                recs.append(pix_recs[pi])
                covered += pix_recs[pi][1]
                pi += 1
            if covered != area:
                raise bs.CorruptStreamError("pixel records do not tile block")
            li += reconstruct_block_p(out32, prev32, rect, recs, lit_recs, li)
    return out32.astype(np.uint8)
