"""P-frame block analysis — numpy specification.

Change map over 16x16 blocks, minimal changed sub-rect, exact-match motion
search. Reference analogs: `DecideBlockTypes` (`screencap.cpp:928-1087`),
`FindMV`/`SameBlocks` (`screencap.cpp:684-825`). The reference's sequential
heuristics (last-MV chain, upper-block MV, work stealing) are replaced by a
static prioritized candidate list so the JAX implementation can evaluate all
candidates as batched comparisons.
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu.config import (
    BLOCK,
    BT_FULL_DATA,
    BT_PARTIAL_DATA,
    CodecConfig,
)


def change_mask(frame: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """[H, W] bool per-pixel difference."""
    return (frame != prev).any(axis=2)


def block_changed(diff: np.ndarray, nby: int, nbx: int) -> np.ndarray:
    h, w = diff.shape
    padded = np.zeros((nby * BLOCK, nbx * BLOCK), bool)
    padded[:h, :w] = diff
    return padded.reshape(nby, BLOCK, nbx, BLOCK).any(axis=(1, 3))


def subrect(diff: np.ndarray, bx: int, by: int, w: int, h: int):
    """Minimal changed sub-rect of block (bx, by): (x1, y1, x2, y2) exclusive.
    Reference: the directional scans of `screencap.cpp:991-1032`."""
    x_lo, x_hi = bx * BLOCK, min(bx * BLOCK + BLOCK, w)
    y_lo, y_hi = by * BLOCK, min(by * BLOCK + BLOCK, h)
    d = diff[y_lo:y_hi, x_lo:x_hi]
    ys, xs = np.nonzero(d)
    assert len(ys) > 0
    return (
        x_lo + int(xs.min()),
        y_lo + int(ys.min()),
        x_lo + int(xs.max()) + 1,
        y_lo + int(ys.max()) + 1,
    )


def mv_candidates(cfg: CodecConfig):
    """Static prioritized candidate list (FORMAT.md 'Motion search')."""
    # negative displacements reach -msr, positive stop at msr-1 (the
    # reference's scan bounds, `screencap.cpp:684-814`; also keeps mv+256
    # inside the 512-symbol alphabet at msr=256)
    cands = []
    for d in range(1, cfg.msr_y + 1):
        cands.append((0, -d))
        if d < cfg.msr_y:
            cands.append((0, d))
    for d in range(1, cfg.msr_x + 1):
        cands.append((-d, 0))
    for d in range(1, cfg.msr_x):
        cands.append((d, 0))
    seen = {(0, 0)} | set(cands)
    for dy in range(-cfg.msr_low_y, cfg.msr_low_y + 1):
        for dx in range(-cfg.msr_low_x, cfg.msr_low_x + 1):
            if (dx, dy) not in seen:
                cands.append((dx, dy))
                seen.add((dx, dy))
    return cands


def find_mv(frame, prev, rect, cands):
    """First candidate whose shifted prev-frame region equals the changed
    sub-rect byte-exactly (`SameBlocks`, `screencap.cpp:817-825`)."""
    x1, y1, x2, y2 = rect
    h, w, _ = frame.shape
    blk = frame[y1:y2, x1:x2]
    bw, bh = x2 - x1, y2 - y1
    for mx, my in cands:
        sx, sy = x1 + mx, y1 + my
        if sx < 0 or sy < 0 or sx + bw > w or sy + bh > h:
            continue
        if (prev[sy : sy + bh, sx : sx + bw] == blk).all():
            return (mx, my)
    return None


def analyze_p(frame: np.ndarray, prev: np.ndarray, cfg: CodecConfig):
    """Full P-frame analysis.

    Returns (bts [nby*nbx], rects {bi: (x1,y1,x2,y2)}, mvs {bi: (mx,my)})
    with block types per FORMAT.md; bts is all-zero when nothing changed.
    """
    h, w, _ = frame.shape
    nbx, nby = cfg.nbx, cfg.nby
    diff = change_mask(frame, prev)
    bc = block_changed(diff, nby, nbx)
    bts = np.zeros(nby * nbx, np.int32)
    rects: dict[int, tuple] = {}
    mvs: dict[int, tuple] = {}
    if not bc.any():
        return bts, rects, mvs
    cands = mv_candidates(cfg)
    for by, bx in zip(*np.nonzero(bc)):
        bi = int(by) * nbx + int(bx)
        rect = subrect(diff, int(bx), int(by), w, h)
        x_lo, y_lo = int(bx) * BLOCK, int(by) * BLOCK
        x_hi, y_hi = min(x_lo + BLOCK, w), min(y_lo + BLOCK, h)
        partial = rect != (x_lo, y_lo, x_hi, y_hi)
        bt = BT_PARTIAL_DATA if partial else BT_FULL_DATA
        mv = find_mv(frame, prev, rect, cands)
        if mv is not None:
            bt += 2
            mvs[bi] = mv
        bts[bi] = bt
        rects[bi] = rect
    return bts, rects, mvs


def rle_blocks(bts: np.ndarray, xx1: int, xx2: int, max_run: int = 255):
    """(bt, n) runs over linear block indices xx1..xx2 inclusive."""
    recs = []
    x = xx1
    while x <= xx2:
        bt = int(bts[x])
        n = 1
        while x + n <= xx2 and int(bts[x + n]) == bt and n < max_run:
            n += 1
        recs.append((bt, n))
        x += n
    return recs
