"""Per-stream codec session — numpy specification.

State machine semantics mirror the reference (`CScreenCapt::CompressFrame` /
`DecompressFrame`, `screencap.cpp:1456-1557`): flat-frame shortcut, keyframe
policy, RenewI model resets for seekability, bit-truncation loss, previous
frame buffer. Works on internal RGB24 planes [H, W, 3] uint8.
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_FLAT, ALG_I, ALG_P, ALG_RAW, CodecConfig
from screenpressor_tpu.spec.iframe import decode_i, encode_i
from screenpressor_tpu.spec.pframe import decode_p, encode_p
from screenpressor_tpu.spec.tables import TableSet

FTYPE_I = 0
FTYPE_P = 1


def apply_loss(frame: np.ndarray, loss: int) -> np.ndarray:
    """Bit-truncation loss with half-step correction
    (`SetupLossMask`/`DoLoss`, `screencap.cpp:127-139,853-861`)."""
    if loss <= 0:
        return frame
    mask = 0xFF & ~((1 << loss) - 1)
    corr = (1 << loss) >> 1
    return ((frame & mask) | corr).astype(np.uint8)


def is_flat(frame: np.ndarray) -> bool:
    """Single-color frame check (`IsFlat`, `screencap.cpp:1436-1444`)."""
    return bool((frame == frame.reshape(-1, 3)[0]).all())


class SpecEncoder:
    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg
        self.tables = TableSet()
        self.prev: np.ndarray | None = None
        self.fn = 0
        self.last_was_flat = False
        self.last_flat_color: tuple | None = None

    def encode(self, frame: np.ndarray, force_key: bool = False) -> tuple[bytes, int]:
        """-> (payload bytes, frame type 0=I / 1=P)."""
        cfg = self.cfg
        assert frame.shape == (cfg.height, cfg.width, 3) and frame.dtype == np.uint8
        frame = apply_loss(frame, cfg.loss)

        if is_flat(frame):
            color = tuple(int(v) for v in frame.reshape(-1, 3)[0])
            if not (self.last_was_flat and color == self.last_flat_color):
                self.prev = frame.copy()
                self.tables.renew()
                self.last_flat_color = color
            self.last_was_flat = True
            self.fn += 1
            return bytes([bs.header_byte(ALG_FLAT), *color]), FTYPE_I
        self.last_was_flat = False

        keyframe = (
            force_key
            or self.prev is None
            or self.fn == 0
            or (cfg.kf_interval > 0 and self.fn % cfg.kf_interval == 0)
        )
        self.fn += 1
        raw_size = 1 + cfg.width * cfg.height * 3
        if keyframe:
            self.tables.renew()
            data = encode_i(frame, self.tables, cfg)
            ftype = FTYPE_I
        else:
            data = encode_p(frame, self.prev, self.tables, cfg)
            ftype = FTYPE_P
        if len(data) >= raw_size:
            # incompressible: raw escape (model reset on both sides keeps
            # encoder/decoder state consistent without undoing the attempt)
            self.tables.renew()
            data = bytes([bs.header_byte(ALG_RAW)]) + frame.tobytes()
            ftype = FTYPE_I
        self.prev = frame.copy()
        return data, ftype


class SpecDecoder:
    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg
        self.tables = TableSet()
        self.prev: np.ndarray | None = None
        self.last_was_flat = False
        self.last_flat_color: tuple | None = None

    def decode(self, data: bytes) -> np.ndarray:
        cfg = self.cfg
        if not data:
            raise bs.CorruptStreamError("empty frame")
        alg = bs.parse_header_byte(data[0])
        if alg == ALG_FLAT:
            if len(data) < 4:
                raise bs.CorruptStreamError("truncated flat frame")
            color = (data[1], data[2], data[3])
            frame = np.empty((cfg.height, cfg.width, 3), np.uint8)
            frame[:] = color
            if not (self.last_was_flat and color == self.last_flat_color):
                self.prev = frame.copy()
                self.tables.renew()
                self.last_flat_color = color
            self.last_was_flat = True
            return frame
        self.last_was_flat = False
        if alg == ALG_I:
            self.tables.renew()
            frame = decode_i(data, 1, self.tables, cfg)
            self.prev = frame.copy()
            return frame
        if alg == ALG_RAW:
            n = cfg.height * cfg.width * 3
            if len(data) < 1 + n:
                raise bs.CorruptStreamError("truncated raw frame")
            frame = np.frombuffer(data, np.uint8, n, 1).reshape(
                cfg.height, cfg.width, 3
            ).copy()
            self.tables.renew()
            self.prev = frame.copy()
            return frame
        if alg == ALG_P:
            if self.prev is None:
                raise bs.CorruptStreamError("P-frame before any I-frame")
            frame = decode_p(data, 1, self.prev, self.tables, cfg)
            self.prev = frame.copy()
            return frame
        raise bs.CorruptStreamError(f"unknown frame algorithm {alg}")
