"""SCPR v3/v4 interop (ctypes binding for libscpr34.so).

Backward compatibility with the reference ScreenPressor 3.x/4.x rANS
bitstream format (`screencap.h:270-422`, `ans_contexts.h`, `ransmt.h`).
Frame-type inference mirrors the reference VfW layer (`InferFrameType`,
`screenpressor.cpp:579-613`): byte0 0 -> P; 1 -> I only for the 4-byte flat
frame; 0x21/0x22 (v3) and 0x31/0x32 (v4) -> I.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from screenpressor_tpu.native.legacy import flip_dib_in, flip_dib_out

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libscpr34.so")
_LOCK = threading.Lock()
_LIB = None


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "scpr_ans.cpp")
    with _LOCK:
        if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
                check=True, cwd=_DIR, capture_output=True,
            )
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        build()
        lib = ctypes.CDLL(_SO)
        lib.scpr34_new.restype = ctypes.c_void_p
        lib.scpr34_new.argtypes = [ctypes.c_int] * 5
        lib.scpr34_free.argtypes = [ctypes.c_void_p]
        lib.scpr34_encode.restype = ctypes.c_long
        lib.scpr34_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_long, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.scpr34_decode.restype = ctypes.c_int
        lib.scpr34_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    return _LIB


def infer_frame_type_scpr(data: bytes) -> int:
    """0 = I, 1 = P for any SCPR version (reference `InferFrameType`)."""
    if not data:
        raise ValueError("empty frame")
    b0 = data[0]
    if b0 == 0:
        return 1
    if b0 == 1:
        return 0 if len(data) <= 4 else 1
    if b0 in (0x11, 0x12, 0x21, 0x22, 0x31, 0x32):
        return 0
    raise ValueError(f"unrecognized SCPR frame byte {b0:#x}")


def stream_version(data: bytes) -> int | None:
    """SCPR codec version from an I-frame header byte; None for P frames
    (the session keeps the version of the last keyframe,
    `screencap.cpp:1698-1702`)."""
    if not data:
        raise ValueError("empty frame")
    b0 = data[0]
    if b0 in (0, 1) and not (b0 == 1 and len(data) <= 4):
        return None
    if b0 == 1:  # 4-byte flat frame without a version nibble: v2 legacy form
        return 2
    ver = (b0 >> 4) + 1
    if 2 <= ver <= 4 and (b0 & 0x0F) in (1, 2):
        return ver
    raise ValueError(f"unrecognized SCPR header byte {b0:#x}")


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class ScprAnsEncoder:
    """Produces reference-format v3 or v4 streams. msr must match the
    decoder's session parameters (the reference carries them out of band
    via the VfW layer; 256 is the reference default)."""

    def __init__(self, version: int, width: int, height: int,
                 kf_interval: int = 500, msr_x: int = 256, msr_y: int = 256):
        assert version in (3, 4), version
        self.version = version
        self.width, self.height = width, height
        self.kf_interval = kf_interval
        self._h = _lib().scpr34_new(version, width, height, msr_x, msr_y)
        if not self._h:
            raise RuntimeError("scpr34_new failed")

    def encode(self, frame: np.ndarray, force_key: bool = False):
        frame = np.asarray(frame, np.uint8)
        assert frame.shape == (self.height, self.width, 3)
        frame = flip_dib_in(frame)  # reference streams carry bottom-up BGR DIB rows
        cap = self.width * self.height * 6 + 4096
        out = np.empty(cap, np.uint8)
        ftype = ctypes.c_int(0)
        n = _lib().scpr34_encode(
            self._h, _u8ptr(frame), int(force_key), self.kf_interval,
            _u8ptr(out), cap, ctypes.byref(ftype),
        )
        if n < 0:
            raise RuntimeError(f"v{self.version} encode failed ({n})")
        return bytes(out[:n].tobytes()), int(ftype.value)

    def __del__(self):
        try:
            _lib().scpr34_free(self._h)
        except Exception:
            pass


class ScprAnsDecoder:
    def __init__(self, version: int, width: int, height: int,
                 msr_x: int = 256, msr_y: int = 256):
        assert version in (3, 4), version
        self.version = version
        self.width, self.height = width, height
        self._h = _lib().scpr34_new(version, width, height, msr_x, msr_y)
        if not self._h:
            raise RuntimeError("scpr34_new failed")

    def decode(self, data: bytes, ftype: int | None = None) -> np.ndarray:
        if ftype is None:
            ftype = infer_frame_type_scpr(data)
        out = np.empty((self.height, self.width, 3), np.uint8)
        buf = np.frombuffer(data, np.uint8)
        rc = _lib().scpr34_decode(self._h, _u8ptr(buf), len(data), ftype, _u8ptr(out))
        if rc != 0:
            raise RuntimeError(f"v{self.version} decode failed")
        return flip_dib_out(out)

    def __del__(self):
        try:
            _lib().scpr34_free(self._h)
        except Exception:
            pass
