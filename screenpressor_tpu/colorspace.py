"""Pixel-format conversion: RGB16 (arbitrary 555/565 masks), RGB24, RGB32
<-> internal RGB24 planes [H, W, 3] uint8.

Reference analog: `ScreenCodec` conversion loops (`screencap.cpp:1652-1678`
inbound, `:1711-1738` outbound; mask->shift extraction `:1575-1583`; alpha
forced to 255 on RGB32 output `:1721`).
"""

from __future__ import annotations

import numpy as np


def mask_shift(mask: int) -> int:
    if mask == 0:
        raise ValueError("zero channel mask")
    s = 0
    while not (mask >> s) & 1:
        s += 1
    return s


def rgb16_to_rgb24(frame16: np.ndarray, rmask: int, gmask: int, bmask: int) -> np.ndarray:
    """[H, W] uint16 -> [H, W, 3] uint8 (raw channel bits, no scaling —
    matches the reference, which round-trips the masked bits verbatim)."""
    rs, gs, bs = mask_shift(rmask), mask_shift(gmask), mask_shift(bmask)
    w = frame16.astype(np.uint32)
    out = np.empty(frame16.shape + (3,), np.uint8)
    out[..., 0] = (w & rmask) >> rs
    out[..., 1] = (w & gmask) >> gs
    out[..., 2] = (w & bmask) >> bs
    return out


def rgb24_to_rgb16(frame: np.ndarray, rmask: int, gmask: int, bmask: int) -> np.ndarray:
    rs, gs, bs = mask_shift(rmask), mask_shift(gmask), mask_shift(bmask)
    r = frame[..., 0].astype(np.uint32) << rs
    g = frame[..., 1].astype(np.uint32) << gs
    b = frame[..., 2].astype(np.uint32) << bs
    return (r + g + b).astype(np.uint16)


def rgb32_to_rgb24(frame32: np.ndarray) -> np.ndarray:
    """[H, W, 4] -> [H, W, 3]; alpha dropped."""
    return np.ascontiguousarray(frame32[..., :3])


def rgb24_to_rgb32(frame: np.ndarray) -> np.ndarray:
    """[H, W, 3] -> [H, W, 4]; alpha forced to 255."""
    out = np.empty(frame.shape[:2] + (4,), np.uint8)
    out[..., :3] = frame
    out[..., 3] = 255
    return out
