"""Scalar rANS primitives (numpy/python oracle).

Semantics of the public-domain byte-aligned rANS used by the reference
(`rans_byte.h:47-146`): 32-bit state, L = 2^23, one-byte renormalization,
12-bit probabilities. Encoding runs in reverse and emits bytes backward;
a flushed stream is 4 state bytes (LE) followed by code bytes in decode order.
"""

from __future__ import annotations

from screenpressor_tpu.config import PROB_BITS, PROB_SCALE, RANS_L

MASK = PROB_SCALE - 1
# Encoder renormalization bound factor: x_max = freq << X_MAX_SHIFT
X_MAX_SHIFT = 23 - PROB_BITS + 8  # = 19


class RansEncoder:
    """Encode symbols in *reverse* order; `bytes_out()` returns the blob
    (state || code bytes) in decode order."""

    def __init__(self) -> None:
        self.x = RANS_L
        self._rev: list[int] = []  # bytes in emission order (reverse of decode)

    def put(self, cum: int, freq: int) -> None:
        assert 0 < freq and cum + freq <= PROB_SCALE, (cum, freq)
        x = self.x
        x_max = freq << X_MAX_SHIFT
        while x >= x_max:
            self._rev.append(x & 0xFF)
            x >>= 8
        self.x = ((x // freq) << PROB_BITS) + (x % freq) + cum

    def bytes_out(self) -> bytes:
        x = self.x
        head = bytes(((x >> 0) & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, (x >> 24) & 0xFF))
        return head + bytes(reversed(self._rev))


class RansDecoder:
    def __init__(self, blob: bytes) -> None:
        assert len(blob) >= 4
        self.x = blob[0] | (blob[1] << 8) | (blob[2] << 16) | (blob[3] << 24)
        self.blob = blob
        self.pos = 4

    def get(self) -> int:
        """Current someFreq in [0, PROB_SCALE)."""
        return self.x & MASK

    def advance(self, cum: int, freq: int) -> None:
        x = self.x
        x = freq * (x >> PROB_BITS) + (x & MASK) - cum
        while x < RANS_L:
            x = (x << 8) | self.blob[self.pos]
            self.pos += 1
        self.x = x
