"""Independent SCPR oracle via the system libavcodec (FFmpeg's scpr.c).

FFmpeg's clean-room SCPR decoder supports reference stream versions 1-3
(v4 packets are rejected with AVERROR_INVALIDDATA).  Decoding our interop
streams through it is the only independent check that our reimplementation
of the reference walk (`screencap.cpp:319-498,1091-1432`) produces streams
the reference *ecosystem* actually accepts — self-round-trip can't catch
mirror-image bugs.

Skips cleanly (AvOracleUnavailable) when libavcodec or its scpr decoder is
absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libavoracle.so")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


class AvOracleUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "av_oracle.c")
    with _LOCK:
        if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["gcc", "-O2", "-shared", "-fPIC", src, "-o", _SO,
                     "-lavcodec", "-lavutil"],
                    check=True, cwd=_DIR, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                detail = getattr(e, "stderr", b"") or b""
                raise AvOracleUnavailable(
                    f"cannot build libavcodec oracle: {detail.decode()[:500]}"
                ) from e
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        build()
        lib = ctypes.CDLL(_SO)
        lib.avscpr_new.restype = ctypes.c_void_p
        lib.avscpr_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.avscpr_free.argtypes = [ctypes.c_void_p]
        lib.avscpr_decode.restype = ctypes.c_int
        lib.avscpr_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.avscpr_pix_fmt_name.restype = ctypes.c_char_p
        lib.avscpr_pix_fmt_name.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
    except AvOracleUnavailable:
        return False
    return True


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class AvScprDecoder:
    """Stateful per-stream decoder (EAGAIN on no-change frames repeats prev)."""

    def __init__(self, width: int, height: int):
        self.width, self.height = width, height
        self._h = _lib().avscpr_new(width, height)
        if not self._h:
            raise AvOracleUnavailable("libavcodec has no usable scpr decoder")
        self._prev: np.ndarray | None = None

    def decode(self, data: bytes, keyframe: bool = False) -> np.ndarray:
        out = np.empty((self.height, self.width, 3), np.uint8)
        buf = np.frombuffer(data, np.uint8)
        rc = _lib().avscpr_decode(self._h, _u8ptr(buf), len(data),
                                  int(keyframe), _u8ptr(out))
        if rc == 1:
            if self._prev is None:
                raise RuntimeError("no-change frame before any decoded frame")
            return self._prev.copy()
        if rc != 0:
            raise RuntimeError(f"libavcodec scpr decode failed (rc={rc})")
        self._prev = out
        return out

    def pix_fmt(self) -> str:
        name = _lib().avscpr_pix_fmt_name(self._h)
        return name.decode() if name else "?"

    def __del__(self):
        try:
            if self._h:
                _lib().avscpr_free(self._h)
        except Exception:
            pass


def decode_stream(data: bytes, sizes: list[int], width: int, height: int,
                  kf_interval: int | None = None) -> list[np.ndarray]:
    """Decode a concatenated per-frame stream (golden .bin layout)."""
    dec = AvScprDecoder(width, height)
    frames = []
    off = 0
    for i, n in enumerate(sizes):
        payload = data[off:off + n]
        off += n
        kf = payload[:1] in (b"\x11", b"\x12", b"\x21", b"\x22", b"\x31", b"\x32") or (
            payload[:1] == b"\x01" and n <= 4)
        frames.append(dec.decode(payload, keyframe=kf))
    return frames
