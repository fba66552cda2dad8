"""SCPR v2 legacy interop (ctypes binding for libscpr2.so).

Backward compatibility with the reference ScreenPressor 2.x bitstream format
(`screencap.cpp` v2 paths). Frame-type inference mirrors the reference VfW
layer (`InferFrameType`, `screenpressor.cpp:579-613`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libscpr2.so")
_LOCK = threading.Lock()
_LIB = None


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "scpr_legacy.cpp")
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
        lib.scpr2_new.restype = ctypes.c_void_p
        lib.scpr2_new.argtypes = [ctypes.c_int] * 4
        lib.scpr2_free.argtypes = [ctypes.c_void_p]
        lib.scpr2_encode.restype = ctypes.c_long
        lib.scpr2_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_long, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.scpr2_decode.restype = ctypes.c_int
        lib.scpr2_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    return _LIB


def infer_frame_type_v2(data: bytes) -> int:
    """0 = I, 1 = P (reference `InferFrameType`): byte0 0 -> P; 1 -> I if the
    frame is a 4-byte flat frame else P; 0x11/0x12 -> I."""
    if not data:
        raise ValueError("empty frame")
    b0 = data[0]
    if b0 == 0:
        return 1
    if b0 == 1:
        return 0 if len(data) <= 4 else 1
    if b0 in (0x11, 0x12):
        return 0
    raise ValueError(f"unrecognized v2 frame byte {b0:#x}")


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def flip_dib_in(frame: np.ndarray) -> np.ndarray:
    """RGB top-down [H,W,3] -> reference frame buffer (bottom-up BGR DIB).

    The reference is a VfW codec: its pixel buffers are Windows DIBs with
    biHeight>0, i.e. bottom-up rows with B,G,R byte order.  The stream walk
    (`screencap.cpp:319-498`) runs over that buffer, so conforming streams
    carry bottom-up BGR content.  Confirmed against FFmpeg's independent
    scpr decoder (libavcodec), which un-flips on output.
    """
    return np.ascontiguousarray(frame[::-1, :, ::-1])


def flip_dib_out(buf: np.ndarray) -> np.ndarray:
    """Inverse of :func:`flip_dib_in` (involution)."""
    return np.ascontiguousarray(buf[::-1, :, ::-1])


class LegacyV2Encoder:
    """Produces reference-format v2 streams. msr must match the decoder's
    session parameters (the reference carries it out of band via VfW)."""

    def __init__(self, width: int, height: int, kf_interval: int = 500,
                 msr_x: int = 256, msr_y: int = 256):
        self.width, self.height = width, height
        self.kf_interval = kf_interval
        self._h = _lib().scpr2_new(width, height, msr_x, msr_y)

    def encode(self, frame: np.ndarray, force_key: bool = False):
        frame = np.asarray(frame, np.uint8)
        assert frame.shape == (self.height, self.width, 3)
        frame = flip_dib_in(frame)
        cap = self.width * self.height * 6 + 4096
        out = np.empty(cap, np.uint8)
        ftype = ctypes.c_int(0)
        n = _lib().scpr2_encode(
            self._h, _u8ptr(frame), int(force_key), self.kf_interval,
            _u8ptr(out), cap, ctypes.byref(ftype),
        )
        if n < 0:
            raise RuntimeError(f"v2 encode failed ({n})")
        return bytes(out[:n].tobytes()), int(ftype.value)

    def __del__(self):
        try:
            _lib().scpr2_free(self._h)
        except Exception:
            pass


class LegacyV2Decoder:
    def __init__(self, width: int, height: int, msr_x: int = 256, msr_y: int = 256):
        self.width, self.height = width, height
        self._h = _lib().scpr2_new(width, height, msr_x, msr_y)

    def decode(self, data: bytes, ftype: int | None = None) -> np.ndarray:
        if ftype is None:
            ftype = infer_frame_type_v2(data)
        out = np.empty((self.height, self.width, 3), np.uint8)
        buf = np.frombuffer(data, np.uint8)
        rc = _lib().scpr2_decode(self._h, _u8ptr(buf), len(data), ftype, _u8ptr(out))
        if rc != 0:
            raise RuntimeError("v2 decode failed")
        return flip_dib_out(out)

    def __del__(self):
        try:
            _lib().scpr2_free(self._h)
        except Exception:
            pass
