"""ctypes binding for the native SPTC codec (libsptc.so)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsptc.so")
_LOCK = threading.Lock()
_LIB = None


def build(force: bool = False) -> str:
    """Compile libsptc.so if needed; returns the path."""
    src = os.path.join(_DIR, "sptc.cpp")
    with _LOCK:
        if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
            os.path.getmtime(src),
            os.path.getmtime(os.path.join(_DIR, "sptc_frame.cpp")),
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
                check=True,
                cwd=_DIR,
                capture_output=True,
            )
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        build()
        lib = ctypes.CDLL(_SO)
        lib.sptc_encoder_new.restype = ctypes.c_void_p
        lib.sptc_encoder_new.argtypes = [ctypes.c_int] * 8
        lib.sptc_encoder_free.argtypes = [ctypes.c_void_p]
        lib.sptc_encode.restype = ctypes.c_long
        lib.sptc_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.sptc_decoder_new.restype = ctypes.c_void_p
        lib.sptc_decoder_new.argtypes = [ctypes.c_int] * 6
        lib.sptc_decoder_free.argtypes = [ctypes.c_void_p]
        lib.sptc_decode.restype = ctypes.c_int
        lib.sptc_decode.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    return _LIB


def is_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeEncoder:
    """Serial native encoder session (bitstreams identical to spec/jax)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self._h = _lib().sptc_encoder_new(
            cfg.width, cfg.height, cfg.kf_interval, cfg.loss,
            cfg.msr_x, cfg.msr_y, cfg.msr_low_x, cfg.msr_low_y,
        )

    def encode(self, frame: np.ndarray, force_key: bool = False):
        cfg = self.cfg
        frame = np.ascontiguousarray(frame, np.uint8)
        assert frame.shape == (cfg.height, cfg.width, 3)
        cap = cfg.width * cfg.height * 6 + 4096  # reference worst-case bound
        out = np.empty(cap, np.uint8)
        ftype = ctypes.c_int(0)
        n = _lib().sptc_encode(
            self._h, _u8ptr(frame), int(force_key), _u8ptr(out), cap,
            ctypes.byref(ftype),
        )
        if n < 0:
            raise RuntimeError(f"native encode failed ({n})")
        return bytes(out[:n].tobytes()), int(ftype.value)

    def __del__(self):
        try:
            _lib().sptc_encoder_free(self._h)
        except Exception:
            pass


class NativeDecoder:
    def __init__(self, cfg):
        self.cfg = cfg
        self._h = _lib().sptc_decoder_new(
            cfg.width, cfg.height, cfg.msr_x, cfg.msr_y, cfg.msr_low_x, cfg.msr_low_y
        )

    def decode(self, data: bytes) -> np.ndarray:
        cfg = self.cfg
        out = np.empty((cfg.height, cfg.width, 3), np.uint8)
        buf = np.frombuffer(data, np.uint8)
        rc = _lib().sptc_decode(self._h, _u8ptr(buf), len(data), _u8ptr(out))
        if rc != 0:
            raise RuntimeError("native decode failed")
        return out

    def __del__(self):
        try:
            _lib().sptc_decoder_free(self._h)
        except Exception:
            pass
