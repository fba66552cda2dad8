"""Pixel classification and greedy RLE segmentation — numpy specification.

Predictors and run semantics per FORMAT.md "Pixel model". Reference analogs:
`GetPixelType`/`PixelTypeFits` (`screencap.cpp:502-604`), `ClassifyPixelsI`
(`screencap.cpp:876-919`). Unlike the reference (per-thread row bands), runs
here are global in raster order; the segmentation is computed from vectorized
predicate planes + run-length jump tables so the JAX implementation can use
the identical O(n log n) parallel formulation.
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu.config import (
    MAX_RUN,
    PT_ABOVE,
    PT_ABOVELEFT,
    PT_GRADIENT,
    PT_LEFT,
    PT_LITERAL,
    PT_PREVFRAME,
)


def neighbor_planes(frame: np.ndarray):
    """(left, above, aboveleft) planes in raster layout [N, 3] int32.
    left[i] = pix[i-1] (raster wrap); above/aboveleft valid for y >= 1;
    aboveleft(y, 0) = pix[y-1][X-1] = pix[i-1] (FORMAT.md)."""
    h, w, _ = frame.shape
    pix = frame.reshape(h * w, 3).astype(np.int32)
    left = np.empty_like(pix)
    left[1:] = pix[:-1]
    left[0] = 0
    above = np.empty_like(pix)
    above[w:] = pix[:-w]
    above[:w] = 0
    aboveleft = np.empty_like(pix)
    aboveleft[1:] = pix[:-1]  # default: raster-prev (covers x == 0)
    xs = np.arange(h * w) % w
    inner = (np.arange(h * w) >= w + 1) & (xs > 0)
    aboveleft[inner] = pix[np.arange(h * w)[inner] - w - 1]
    return pix, left, above, aboveleft


def fits_planes_i(frame: np.ndarray) -> np.ndarray:
    """fits[N, 6] bool: can pixel i extend/start a run of each ptype.
    Types 0 and 1 share the equals-raster-previous predicate; 2/4/5 require
    y >= 1. Type 3 is unused for I-frames."""
    h, w, _ = frame.shape
    n = h * w
    pix, left, above, aboveleft = neighbor_planes(frame)
    ys = np.arange(n) // w
    has_above = ys >= 1
    eq = lambda a, b: (a == b).all(axis=1)
    fits = np.zeros((n, 6), bool)
    f_left = eq(pix, left)
    f_left[0] = False
    fits[:, PT_LITERAL] = f_left
    fits[:, PT_LEFT] = f_left
    fits[:, PT_ABOVE] = eq(pix, above) & has_above
    fits[:, PT_GRADIENT] = eq(pix, left + above - aboveleft) & has_above
    fits[:, PT_ABOVELEFT] = eq(pix, aboveleft) & has_above
    return fits


def start_types_i(fits: np.ndarray, w: int) -> np.ndarray:
    """Record-start ptype per pixel: priority 1,5,2,4 else 0
    (`GetPixelType`, `screencap.cpp:502-521`)."""
    n = fits.shape[0]
    t = np.full(n, PT_LITERAL, np.int32)
    for p in (PT_GRADIENT, PT_ABOVE, PT_ABOVELEFT, PT_LEFT):  # ascending priority
        t = np.where(fits[:, p], p, t)
    t[0] = PT_LITERAL
    return t


def run_tables(fits: np.ndarray) -> np.ndarray:
    """r[t][i] = length of the true-streak of fits[:, t] starting at i
    (0 if fits[i, t] is false). Vectorized next-false scan."""
    n, nt = fits.shape
    out = np.zeros((nt, n), np.int32)
    idx = np.arange(n + 1)
    for t in range(nt):
        f = np.concatenate([fits[:, t], [False]])
        nf = np.where(~f, idx, n + 1)
        nf = np.minimum.accumulate(nf[::-1])[::-1]  # next false at or after i
        out[t] = nf[:n] - idx[:n]
    return out


def segment(start_types: np.ndarray, runs: np.ndarray, n: int,
            max_run: int = MAX_RUN, tile: int | None = None):
    """Greedy maximal-run segmentation with runs breaking at tile
    boundaries (encoder policy — config.seg_tile — shared by all
    implementations so streams are byte-identical; decoders accept any
    valid segmentation). Returns list[(start, ptype, n)]."""
    from screenpressor_tpu.config import SEG_TILE

    if tile is None:
        tile = SEG_TILE
    recs = []
    i = 0
    while i < n:
        t = int(start_types[i])
        ext = int(runs[t][i + 1]) if i + 1 < n else 0
        ln = 1 + min(ext, max_run - 1)
        ln = min(ln, n - i, tile - (i % tile))
        recs.append((i, t, ln))
        i += ln
    return recs


def classify_i(frame: np.ndarray):
    """Frame -> (records [(ptype, n)], literals [(r, g, b)])."""
    h, w, _ = frame.shape
    fits = fits_planes_i(frame)
    st = start_types_i(fits, w)
    runs = run_tables(fits)
    from screenpressor_tpu.config import seg_tile

    segs = segment(st, runs, h * w, tile=seg_tile(h * w, w))
    pix = frame.reshape(h * w, 3)
    records = [(t, ln) for _, t, ln in segs]
    literals = [tuple(int(v) for v in pix[s]) for s, t, _ in segs if t == PT_LITERAL]
    return records, literals


# ---------------------------------------------------------------------------
# Reconstruction (decoder side) — affine row scan
# ---------------------------------------------------------------------------


def expand_records(records, n: int):
    """records -> per-pixel (ptype, literal_index) arrays; literal_index is
    the running index into the literal list for ptype-0 record starts, -1
    elsewhere. Run pixels after the first carry the same ptype."""
    pt = np.empty(n, np.int32)
    lit = np.full(n, -1, np.int64)
    is_start = np.zeros(n, bool)
    i = 0
    li = 0
    for t, ln in records:
        pt[i : i + ln] = t
        is_start[i] = True
        if t == PT_LITERAL:
            lit[i] = li
            li += 1
        i += ln
    assert i == n, (i, n)
    return pt, lit, is_start


def reconstruct_i(records, literals, h: int, w: int) -> np.ndarray:
    """Rebuild the frame from records via the affine row recurrence
    v[x] = reset ? known[x] : v[x-1] + d[x] (DESIGN.md)."""
    n = h * w
    pt, lit, _ = expand_records(records, n)
    lits = np.asarray(literals, np.int32).reshape(-1, 3)
    out = np.zeros((h, w, 3), np.int32)
    carry = np.zeros(3, np.int32)  # v[-1] of current row = last pixel prev row
    for y in range(h):
        row_pt = pt[y * w : (y + 1) * w]
        row_lit = lit[y * w : (y + 1) * w]
        above = out[y - 1] if y > 0 else np.zeros((w, 3), np.int32)
        aboveleft = np.empty_like(above)
        aboveleft[1:] = above[:-1]
        aboveleft[0] = carry  # aboveleft(y,0) = pix[y-1][X-1]
        # literal value propagated across each ptype-0 run:
        known = np.zeros((w, 3), np.int32)
        reset = np.zeros(w, bool)
        lit_mask = row_pt == PT_LITERAL
        if lit_mask.any():
            # each ptype-0 pixel uses its record's literal; record starts have
            # lit >= 0 and the run's other pixels propagate (handled by the
            # scan below via d=0 after a reset at the record start)
            start_mask = lit_mask & (row_lit >= 0)
            known[start_mask] = lits[row_lit[start_mask]]
            reset |= start_mask
        m2 = row_pt == PT_ABOVE
        known[m2] = above[m2]
        reset |= m2
        m5 = row_pt == PT_ABOVELEFT
        known[m5] = aboveleft[m5]
        reset |= m5
        d = np.zeros((w, 3), np.int32)
        m4 = row_pt == PT_GRADIENT
        d[m4] = above[m4] - aboveleft[m4]
        # ptype 1 and non-start ptype-0 pixels: propagate with d = 0
        # affine scan with carry-in as virtual reset at x = -1
        lr = np.maximum.accumulate(np.where(reset, np.arange(w), -1))
        dm = np.where(reset[:, None], 0, d)
        cs = np.cumsum(dm, axis=0)
        base = np.where(
            (lr >= 0)[:, None], known[np.maximum(lr, 0)], carry[None, :]
        )
        cs_at_lr = np.where((lr >= 0)[:, None], cs[np.maximum(lr, 0)], 0)
        row = base + cs - cs_at_lr
        out[y] = row
        carry = row[-1]
    assert (out >= 0).all() and (out <= 255).all()
    return out.astype(np.uint8)
