"""Definitive conformance oracle: the reference codec itself, compiled from
the read-only reference checkout at test time.

`refshim/` contains only our own code (a pthread-backed Win32 shim and a C
API wrapper); the reference sources are #included from REF_DIR during the
build and never copied into this repository.  This oracle settles semantics
where FFmpeg's clean-room scpr decoder is absent (v4) or deviates (it does
not renew model state on flat frames; the reference does,
`screencap.cpp:1490-1493,1547-1550`).

Skips cleanly (RefOracleUnavailable) when the reference checkout is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from screenpressor_tpu.native.legacy import flip_dib_in, flip_dib_out

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshim")
_SO = os.path.join(_DIR, "librefora.so")
_REF_DIR = os.environ.get("SCPR_REF_DIR", "/root/reference")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


class RefOracleUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> str:
    src = os.path.join(_DIR, "refora.cpp")
    if not os.path.exists(os.path.join(_REF_DIR, "screencap.cpp")):
        raise RefOracleUnavailable(f"reference checkout not found at {_REF_DIR}")
    with _LOCK:
        if force or not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(src):
            try:
                subprocess.run(
                    # -DNDEBUG matches the shipped release DLLs: the
                    # reference's own debug asserts fire on legal content
                    # (v3 f0=64 Cx2->Cx6 upgrades with >=61 symbols make
                    # totFr>PROB_SCALE, ans_contexts.h:497-501 — release
                    # builds run through it and stay self-consistent)
                    ["g++", "-O2", "-DNDEBUG", "-shared", "-fPIC", "-std=c++17",
                     "-DNOPROTECT", f"-DREF_DIR={_REF_DIR}", f"-I{_DIR}",
                     src, "-o", _SO, "-lpthread"],
                    check=True, cwd=_DIR, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                detail = getattr(e, "stderr", b"") or b""
                raise RefOracleUnavailable(
                    f"cannot build reference oracle: {detail.decode()[:500]}"
                ) from e
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        build()
        lib = ctypes.CDLL(_SO)
        lib.refora_new.restype = ctypes.c_void_p
        lib.refora_new.argtypes = [ctypes.c_int] * 6
        lib.refora_free.argtypes = [ctypes.c_void_p]
        lib.refora_compress.restype = ctypes.c_long
        lib.refora_compress.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.refora_decompress.restype = ctypes.c_int
        lib.refora_decompress.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
    except RefOracleUnavailable:
        return False
    return True


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class RefCodec:
    """One reference codec instance (encoder or decoder side).

    Frames at this interface are RGB top-down [H, W, 3]; the DIB conversion
    happens here, matching our interop wrappers.
    """

    def __init__(self, version: int, width: int, height: int,
                 msr: int = 256, msr_low: int = 8, loss: int = 0):
        assert version in (2, 3, 4)
        self.version, self.width, self.height = version, width, height
        self._h = _lib().refora_new(version, width, height, msr, msr_low, loss)
        if not self._h:
            raise RefOracleUnavailable("refora_new failed")

    def encode(self, frame: np.ndarray, force_key: bool = False):
        dib = flip_dib_in(np.asarray(frame, np.uint8))
        cap = self.width * self.height * 6 + 4096
        out = np.empty(cap, np.uint8)
        ftype = ctypes.c_int(0)
        n = _lib().refora_compress(
            self._h, _u8ptr(dib), 0 if force_key else 1, _u8ptr(out), cap,
            ctypes.byref(ftype))
        if n <= 0:
            raise RuntimeError(f"reference compress failed ({n})")
        return bytes(out[:n].tobytes()), int(ftype.value)

    def decode(self, data: bytes, ftype: int) -> np.ndarray:
        out = np.empty((self.height, self.width, 3), np.uint8)
        buf = np.frombuffer(data, np.uint8)
        rc = _lib().refora_decompress(self._h, _u8ptr(buf), len(data), ftype,
                                      _u8ptr(out))
        if rc != 0:
            raise RuntimeError("reference decompress failed")
        return flip_dib_out(out)

    def __del__(self):
        try:
            if self._h:
                _lib().refora_free(self._h)
        except Exception:
            pass
