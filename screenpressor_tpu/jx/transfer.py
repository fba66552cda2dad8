"""Device<->host transfer compaction.

The rANS pack buffers are capacity-padded ([K, cap] with data right-aligned
per lane); pulling them verbatim moves mostly zeros over the (slow) host
link. `gather_segments` compacts any set of (src, dst, len) byte ranges from
a flat device buffer into one tight array on device, so a whole batch of
frames costs ONE device->host pull of approximately the real compressed
size. The inverse direction (scattering tight host bytes into padded lane
buffers) uses the same primitive with src/dst swapped.

Reference analog: none — this is rig plumbing (the reference is a local
CPU codec); it exists because TPU hosts reach the device through PCIe/ICI
and per-transfer latency dominates small pulls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("out_size",))
def gather_segments(flat_src, segs, out_size: int):
    """flat_src: [N] uint8; segs: [S, 3] int32 rows (src0, dst0, len) with
    dst ranges contiguous, sorted, and non-overlapping (rows with len == 0
    are ignored; padded rows must have len == 0). Returns [out_size] uint8
    with out[dst0+j] = flat_src[src0+j] for j < len."""
    src0, dst0, lens = segs[:, 0], segs[:, 1], segs[:, 2]
    s = segs.shape[0]
    # segment id per output byte: scatter segment indices at dst starts, cummax
    sid0 = jnp.full((out_size,), -1, jnp.int32).at[
        jnp.where(lens > 0, dst0, out_size)
    ].max(jnp.arange(s, dtype=jnp.int32), mode="drop")
    sid = jax.lax.cummax(sid0, axis=0)
    sidc = jnp.clip(sid, 0, s - 1)
    off = jnp.arange(out_size) - dst0[sidc]
    valid = (sid >= 0) & (off < lens[sidc])
    idx = jnp.clip(src0[sidc] + off, 0, flat_src.shape[0] - 1)
    return jnp.where(valid, flat_src[idx], 0).astype(jnp.uint8)


def pow2_bucket(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


class SegmentPlan:
    """Host-side layout builder for one batched gather."""

    def __init__(self):
        self.segs: list[tuple[int, int, int]] = []
        self.total = 0

    def add(self, src0: int, length: int) -> int:
        """Appends a segment; returns its destination offset."""
        dst = self.total
        if length > 0:
            self.segs.append((src0, dst, length))
            self.total += length
        return dst

    def run(self, flat_src) -> np.ndarray:
        """Executes the gather on device and pulls the tight bytes."""
        if self.total == 0:
            return np.zeros((0,), np.uint8)
        scap = pow2_bucket(max(len(self.segs), 1))
        segs = np.zeros((scap, 3), np.int32)
        segs[: len(self.segs)] = self.segs
        out = gather_segments(flat_src, jnp.asarray(segs), pow2_bucket(self.total))
        return np.asarray(out)[: self.total]
