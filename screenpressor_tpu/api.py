"""Host-facing codec API (placeholder until spec/jx codecs land).

Reference analog: `ScreenCodec` + `CodecInst` (`screencap.h:519-541`,
`screenpressor.cpp`).
"""

from __future__ import annotations

import enum


class PixelFormat(enum.Enum):
    RGB16 = 16
    RGB24 = 24
    RGB32 = 32


class Encoder:  # pragma: no cover - implemented with the frame pipeline
    def __init__(self, *a, **k):
        raise NotImplementedError("landing with the frame pipeline milestone")


class Decoder:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("landing with the frame pipeline milestone")
