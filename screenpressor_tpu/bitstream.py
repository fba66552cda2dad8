"""SPTC1 container packing/parsing (host side).

Framing per FORMAT.md. Reference analog: frame header nibbles and section
layout of `screencap.cpp:1436-1557` (flat/I/P framing) — redesigned so every
entropy section carries explicit per-lane sizes for parallel decode.
"""

from __future__ import annotations

import struct

from screenpressor_tpu.config import (
    ALG_FLAT,
    ALG_I,
    ALG_P,
    SPTC_VERSION_NIBBLE,
)


def header_byte(alg: int) -> int:
    return (SPTC_VERSION_NIBBLE << 4) | alg


def parse_header_byte(b: int) -> int:
    if (b >> 4) != SPTC_VERSION_NIBBLE:
        raise BadVersionError(b >> 4)
    return b & 0x0F


class BadVersionError(Exception):
    """Reference analog: `BadVersionException` (`screencap.h:86-90`)."""

    def __init__(self, version: int):
        super().__init__(f"unsupported bitstream version nibble {version:#x}")
        self.version = version


class CorruptStreamError(Exception):
    pass


def pack_section(blobs: list[bytes]) -> bytes:
    k = len(blobs)
    klog = max(0, (k - 1).bit_length())
    if (1 << klog) != k:
        raise ValueError(f"lane count {k} not a power of two")
    out = [bytes([klog])]
    out.append(struct.pack(f"<{k}I", *(len(b) for b in blobs)))
    out.extend(blobs)
    return b"".join(out)


def unpack_section(data: bytes, pos: int, expected_k: int) -> tuple[list[bytes], int]:
    if pos >= len(data):
        raise CorruptStreamError("truncated section header")
    k = 1 << data[pos]
    if k != expected_k:
        raise CorruptStreamError(f"lane count mismatch: stream {k}, policy {expected_k}")
    pos += 1
    need = 4 * k
    if pos + need > len(data):
        raise CorruptStreamError("truncated lane size table")
    sizes = struct.unpack_from(f"<{k}I", data, pos)
    pos += need
    blobs = []
    for s in sizes:
        if pos + s > len(data):
            raise CorruptStreamError("truncated lane payload")
        blobs.append(data[pos : pos + s])
        pos += s
    return blobs, pos


def pack_u32(*vals: int) -> bytes:
    return struct.pack(f"<{len(vals)}I", *vals)


def read_u32(data: bytes, pos: int, n: int = 1):
    if pos + 4 * n > len(data):
        raise CorruptStreamError("truncated header")
    vals = struct.unpack_from(f"<{n}I", data, pos)
    return (vals[0] if n == 1 else vals), pos + 4 * n


def pack_u16(*vals: int) -> bytes:
    return struct.pack(f"<{len(vals)}H", *vals)


def read_u16(data: bytes, pos: int, n: int = 1):
    if pos + 2 * n > len(data):
        raise CorruptStreamError("truncated header")
    vals = struct.unpack_from(f"<{n}H", data, pos)
    return (vals[0] if n == 1 else vals), pos + 2 * n
