"""Native (C++) SPTC runtime: serial codec for host fallback, conformance
cross-checking, and low-latency single-stream encode/decode.

Build on demand with `build()`; loaded via ctypes (no pybind11 dependency).
"""

from screenpressor_tpu.native.binding import (
    NativeDecoder,
    NativeEncoder,
    build,
    is_available,
)

__all__ = ["NativeEncoder", "NativeDecoder", "build", "is_available"]
