"""Per-stream codec session — JAX backend.

Same state machine as `spec/codec.py` (flat shortcut, keyframe policy, RenewI
resets, loss, prev buffer) with all heavy passes on device. Bitstreams are
byte-identical to the numpy spec backend.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_FLAT, ALG_I, ALG_P, ALG_RAW, CodecConfig
from screenpressor_tpu.jx.iframe import decode_i, encode_i
from screenpressor_tpu.jx.pframe import decode_p, encode_p
from screenpressor_tpu.jx.tables import renew_tables
from screenpressor_tpu.spec.codec import FTYPE_I, FTYPE_P, apply_loss, is_flat


class JaxEncoder:
    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg
        self.tables = renew_tables()
        self.prev: np.ndarray | None = None
        self.fn = 0
        self.last_was_flat = False
        self.last_flat_color: tuple | None = None

    def encode(self, frame: np.ndarray, force_key: bool = False):
        cfg = self.cfg
        frame = apply_loss(np.asarray(frame, np.uint8), cfg.loss)

        if is_flat(frame):
            color = tuple(int(v) for v in frame.reshape(-1, 3)[0])
            if not (self.last_was_flat and color == self.last_flat_color):
                self.prev = frame.copy()
                self.tables = renew_tables()
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
            self.tables = renew_tables()
            data, self.tables = encode_i(frame, self.tables, cfg)
            ftype = FTYPE_I
        else:
            data, self.tables = encode_p(frame, self.prev, self.tables, cfg)
            ftype = FTYPE_P
        if len(data) >= raw_size:
            self.tables = renew_tables()
            data = bytes([bs.header_byte(ALG_RAW)]) + frame.tobytes()
            ftype = FTYPE_I
        self.prev = frame.copy()
        return data, ftype


class JaxDecoder:
    def __init__(self, cfg: CodecConfig):
        self.cfg = cfg
        self.tables = renew_tables()
        self.prev = None  # device array [H, W, 3] uint8
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
            frame = jnp.broadcast_to(
                jnp.asarray(color, jnp.uint8), (cfg.height, cfg.width, 3)
            )
            if not (self.last_was_flat and color == self.last_flat_color):
                self.prev = frame
                self.tables = renew_tables()
                self.last_flat_color = color
            self.last_was_flat = True
            return np.asarray(frame)
        self.last_was_flat = False
        if alg == ALG_I:
            self.tables = renew_tables()
            frame, self.tables = decode_i(data, 1, self.tables, cfg)
            self.prev = frame
            return np.asarray(frame)
        if alg == ALG_RAW:
            n = cfg.height * cfg.width * 3
            if len(data) < 1 + n:
                raise bs.CorruptStreamError("truncated raw frame")
            arr = np.frombuffer(data, np.uint8, n, 1).reshape(cfg.height, cfg.width, 3)
            self.tables = renew_tables()
            self.prev = jnp.asarray(arr)
            return arr.copy()
        if alg == ALG_P:
            if self.prev is None:
                raise bs.CorruptStreamError("P-frame before any I-frame")
            frame, self.tables = decode_p(data, 1, self.prev, self.tables, cfg)
            self.prev = frame
            return np.asarray(frame)
        raise bs.CorruptStreamError(f"unknown frame algorithm {alg}")
