"""Host-facing codec API.

Reference analog: `ScreenCodec` (format adaptation, `screencap.cpp:1560-1743`)
plus the session semantics of the VfW layer `CodecInst` (keyframe decision and
quality->loss mapping, `screenpressor.cpp:392-439`). Pixel formats RGB16
(arbitrary masks), RGB24, RGB32 are converted to/from internal RGB24 planes.

Backends: "spec" (numpy reference implementation) and "jax" (TPU path, lands
with the jx package). Both produce identical bitstreams.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from screenpressor_tpu import colorspace as cs
from screenpressor_tpu.config import CodecConfig


class PixelFormat(enum.Enum):
    RGB16 = 16
    RGB24 = 24
    RGB32 = 32


@dataclasses.dataclass(frozen=True)
class FormatParams:
    pixel_format: PixelFormat = PixelFormat.RGB24
    # 16-bit channel masks (reference supports 555/565 and arbitrary
    # BI_BITFIELDS masks, `screenpressor.cpp:276-339`)
    rmask: int = 0xF800
    gmask: int = 0x07E0
    bmask: int = 0x001F


def max_compressed_size(width: int, height: int) -> int:
    """Worst-case output buffer bound per frame (reference `CompressGetSize`
    returns X*Y*6, `screenpressor.cpp:386-388`; ours adds section headers)."""
    return width * height * 6 + 4096


def infer_frame_type(data: bytes) -> int:
    """0 = I-frame (incl. flat), 1 = P-frame — derived from the payload, not
    trusted container flags (reference `InferFrameType`,
    `screenpressor.cpp:579-613`)."""
    from screenpressor_tpu import bitstream as bs
    from screenpressor_tpu.config import ALG_P

    if not data:
        raise bs.CorruptStreamError("empty frame")
    return 1 if bs.parse_header_byte(data[0]) == ALG_P else 0


def quality_to_loss(quality: int) -> int:
    """VfW quality 0..10000 -> loss bits 4..0
    (`screenpressor.cpp:411-422`)."""
    if quality >= 9000:
        return 0
    if quality >= 7000:
        return 1
    if quality >= 5000:
        return 2
    if quality >= 3000:
        return 3
    return 4


def _make_session(cfg: CodecConfig, backend: str, encoder: bool):
    if backend == "spec":
        from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder

        return SpecEncoder(cfg) if encoder else SpecDecoder(cfg)
    if backend == "jax":
        from screenpressor_tpu.jx.codec import JaxDecoder, JaxEncoder

        return JaxEncoder(cfg) if encoder else JaxDecoder(cfg)
    if backend == "native":
        from screenpressor_tpu.native import NativeDecoder, NativeEncoder

        return NativeEncoder(cfg) if encoder else NativeDecoder(cfg)
    if backend in ("scpr2", "scpr3", "scpr4"):
        # reference-format interop sessions (SCPR v2 range coder / v3-v4 rANS)
        return _LegacySession(cfg, int(backend[4]), encoder)
    raise ValueError(f"unknown backend {backend!r}")


class _LegacySession:
    """api-session adapter over the native SCPR v2/v3/v4 interop codecs."""

    def __init__(self, cfg: CodecConfig, version: int, encoder: bool):
        self.cfg = cfg
        self.version = version
        if version == 2:
            from screenpressor_tpu.native.legacy import (
                LegacyV2Decoder,
                LegacyV2Encoder,
            )

            self._impl = (
                LegacyV2Encoder(cfg.width, cfg.height, cfg.kf_interval)
                if encoder else LegacyV2Decoder(cfg.width, cfg.height)
            )
        else:
            from screenpressor_tpu.native.legacy_ans import (
                ScprAnsDecoder,
                ScprAnsEncoder,
            )

            self._impl = (
                ScprAnsEncoder(version, cfg.width, cfg.height, cfg.kf_interval)
                if encoder else ScprAnsDecoder(version, cfg.width, cfg.height)
            )

    def encode(self, frame, force_key: bool = False):
        from screenpressor_tpu.spec.codec import apply_loss

        frame = np.asarray(frame, np.uint8)
        # flat frames bypass loss in the reference (IsFlat short-circuits
        # before DoLoss, screencap.cpp:1489-1501: the 3 color bytes and the
        # prev buffer hold the RAW color) — match it for byte-identity
        if self.cfg.loss and not (frame == frame.reshape(-1, 3)[0]).all():
            frame = apply_loss(frame, self.cfg.loss)
        return self._impl.encode(frame, force_key=force_key)

    def decode(self, data: bytes):
        return self._impl.decode(data)


class _FormatAdapter:
    def __init__(self, fmt: FormatParams):
        self.fmt = fmt

    def to_internal(self, frame: np.ndarray) -> np.ndarray:
        """Device-resident frames stay on device (jnp conversions inside the
        codec session, the reference's `ScreenCodec` conversion placement)."""
        pf = self.fmt.pixel_format
        if pf is PixelFormat.RGB24:
            if frame.ndim != 3 or frame.shape[2] != 3:
                raise ValueError("RGB24 frame must be [H, W, 3]")
            if not isinstance(frame, np.ndarray):
                return frame  # device-resident frame: pass through untouched
            return np.ascontiguousarray(frame, np.uint8)
        if pf is PixelFormat.RGB32:
            if frame.ndim != 3 or frame.shape[2] != 4:
                raise ValueError("RGB32 frame must be [H, W, 4]")
            return cs.rgb32_to_rgb24_any(frame)
        if frame.ndim != 2 or np.dtype(frame.dtype) != np.uint16:
            raise ValueError("RGB16 frame must be [H, W] uint16")
        return cs.rgb16_to_rgb24_any(
            frame, self.fmt.rmask, self.fmt.gmask, self.fmt.bmask)

    def from_internal(self, frame: np.ndarray) -> np.ndarray:
        pf = self.fmt.pixel_format
        if pf is PixelFormat.RGB24:
            return frame
        if pf is PixelFormat.RGB32:
            return cs.rgb24_to_rgb32_any(frame)
        return cs.rgb24_to_rgb16_any(
            frame, self.fmt.rmask, self.fmt.gmask, self.fmt.bmask)


class Encoder:
    """Per-stream encoder session.

    >>> enc = Encoder(CodecConfig(width=W, height=H))
    >>> payload, ftype = enc.encode(frame)          # ftype 0 = I, 1 = P
    """

    def __init__(
        self,
        cfg: CodecConfig,
        fmt: FormatParams = FormatParams(),
        backend: str = "spec",
    ):
        self.cfg = cfg
        self.fmt = fmt
        self._adapter = _FormatAdapter(fmt)
        self._session = _make_session(cfg, backend, encoder=True)
        self.frames_encoded = 0
        self.bytes_out = 0

    def encode(self, frame: np.ndarray, force_key: bool = False, quality: int | None = None):
        if quality is not None:
            loss = quality_to_loss(quality)
            if loss != self.cfg.loss:
                self.cfg = dataclasses.replace(self.cfg, loss=loss)
                self._session.cfg = self.cfg
        internal = self._adapter.to_internal(frame)
        data, ftype = self._session.encode(internal, force_key=force_key)
        data = self._with_format_prefix(data, ftype)
        self.frames_encoded += 1
        self.bytes_out += len(data)
        return data, ftype

    def _with_format_prefix(self, data: bytes, ftype: int) -> bytes:
        """Prefix keyframes with the format-extension chunk for non-RGB24
        sources so decoders self-configure from the stream alone
        (reference: `CompressGetFormat` mask embedding,
        `screenpressor.cpp:317-339`). RGB24 streams are unchanged."""
        if ftype != 0 or self.fmt.pixel_format is PixelFormat.RGB24:
            return data
        from screenpressor_tpu import bitstream as bs

        if self.fmt.pixel_format is PixelFormat.RGB32:
            return bs.pack_format_prefix(32) + data
        return bs.pack_format_prefix(
            16, self.fmt.rmask, self.fmt.gmask, self.fmt.bmask) + data

    def encode_batch(self, frames, force_key: bool = False):
        """Encode a list of frames; backends with a pipelined batch path
        (jax) pay a constant number of host<->device syncs per batch.
        Returns a list of (payload, ftype)."""
        internals = [self._adapter.to_internal(f) for f in frames]
        batch = getattr(self._session, "encode_batch", None)
        if batch is not None:
            results = batch(internals, force_key=force_key)
        else:
            results = [
                self._session.encode(f, force_key=force_key and i == 0)
                for i, f in enumerate(internals)
            ]
        if self.fmt.pixel_format is not PixelFormat.RGB24:
            results = [(self._with_format_prefix(d, t), t) for d, t in results]
        for data, _ in results:
            self.frames_encoded += 1
            self.bytes_out += len(data)
        return results

    @property
    def stats(self) -> dict:
        raw = self.frames_encoded * self.cfg.width * self.cfg.height * 3
        return {
            "frames": self.frames_encoded,
            "bytes": self.bytes_out,
            "ratio": (raw / self.bytes_out) if self.bytes_out else float("inf"),
        }


class Decoder:
    """Per-stream decoder session with unified version dispatch.

    Like the reference's `ScreenCodec::DecompressFrame`
    (`screencap.cpp:1695-1702`), the decoder routes each frame by its stream
    version nibble: SPTC (0xA) streams go to the configured backend; SCPR
    v2/v3/v4 reference-format streams go to the native interop codecs, with
    the legacy session created lazily at the stream's first keyframe and
    reused for its P frames. One Decoder instance can decode a mixed corpus.
    """

    def __init__(
        self,
        cfg: CodecConfig,
        fmt: FormatParams = FormatParams(),
        backend: str = "spec",
    ):
        self.cfg = cfg
        self.fmt = fmt
        self._adapter = _FormatAdapter(fmt)
        self._session = _make_session(cfg, backend, encoder=False)
        self._legacy: _LegacySession | None = None
        # crash latch: a failed decode poisons the instance until the next
        # keyframe (reference `crashed`, `screencap.cpp:1621-1710`)
        self.crashed = False

    def _strip_format_prefix(self, data: bytes) -> bytes:
        """Consume a leading format-extension chunk, reconfiguring this
        decoder's output pixel format from the stream (FORMAT.md; reference
        `screenpressor.cpp:317-339`)."""
        from screenpressor_tpu import bitstream as bs

        parsed, pos = bs.parse_format_prefix(data)
        if parsed is None:
            return data
        bpp, rmask, gmask, bmask = parsed
        if bpp == 32:
            fmt = FormatParams(pixel_format=PixelFormat.RGB32)
        else:
            fmt = FormatParams(pixel_format=PixelFormat.RGB16,
                               rmask=rmask, gmask=gmask, bmask=bmask)
        if fmt != self.fmt:
            self.fmt = fmt
            self._adapter = _FormatAdapter(fmt)
        return data[pos:]

    def _decode_one(self, data: bytes) -> np.ndarray:
        from screenpressor_tpu import bitstream as bs
        from screenpressor_tpu.config import SPTC_VERSION_NIBBLE

        if not data:
            raise bs.CorruptStreamError("empty frame")
        data = self._strip_format_prefix(data)
        if not data:
            raise bs.CorruptStreamError("format prefix without frame payload")
        if (data[0] >> 4) == SPTC_VERSION_NIBBLE:
            return self._session.decode(data)
        # reference-format SCPR stream
        from screenpressor_tpu.native.legacy_ans import stream_version

        try:
            ver = stream_version(data)
        except ValueError as e:
            raise bs.BadVersionError(data[0] >> 4) from e
        if ver is not None and (self._legacy is None or self._legacy.version != ver):
            self._legacy = _LegacySession(self.cfg, ver, encoder=False)
        if self._legacy is None:
            raise bs.CorruptStreamError("SCPR P-frame before any keyframe")
        return self._legacy.decode(data)

    def decode(self, data: bytes) -> np.ndarray:
        from screenpressor_tpu import bitstream as bs
        from screenpressor_tpu.config import ALG_P

        if self.crashed and (not data or (data[0] & 0x0F) == ALG_P):
            raise bs.CorruptStreamError("decoder poisoned; keyframe required")
        try:
            frame = self._decode_one(data)
        except Exception:
            self.crashed = True
            raise
        self.crashed = False
        return self._adapter.from_internal(frame)

    def decode_batch(self, datas, device_out: bool = False):
        """Decode a list of payloads; the jax backend defers validity checks
        to one sync per batch. device_out=True returns device-resident
        frames (RGB24 only) without pulling them to the host."""
        from screenpressor_tpu import bitstream as bs
        from screenpressor_tpu.config import ALG_P

        if device_out and self.fmt.pixel_format is not PixelFormat.RGB24:
            raise ValueError("device_out requires RGB24")
        if self.crashed and datas and (not datas[0] or (datas[0][0] & 0x0F) == ALG_P):
            raise bs.CorruptStreamError("decoder poisoned; keyframe required")
        # Parse format prefixes WITHOUT committing the fmt/adapter mutation:
        # a validation failure below must not leave the decoder
        # reconfigured, and a mid-batch format change must convert each
        # frame with the format in effect at ITS position, not the last.
        stripped, fmts = [], []
        fmt = self.fmt
        for d in datas:
            parsed, pos = bs.parse_format_prefix(d)
            if parsed is not None:
                bpp, rmask, gmask, bmask = parsed
                if bpp == 32:
                    fmt = FormatParams(pixel_format=PixelFormat.RGB32)
                else:
                    fmt = FormatParams(pixel_format=PixelFormat.RGB16,
                                       rmask=rmask, gmask=gmask, bmask=bmask)
                d = d[pos:]
                if not d:
                    raise bs.CorruptStreamError(
                        "format prefix without frame payload")
            stripped.append(d)
            fmts.append(fmt)
        if device_out and any(
            f.pixel_format is not PixelFormat.RGB24 for f in fmts
        ):
            raise ValueError("device_out requires RGB24 (stream carries a format prefix)")
        datas = stripped
        from screenpressor_tpu.config import SPTC_VERSION_NIBBLE

        all_sptc = all(d and (d[0] >> 4) == SPTC_VERSION_NIBBLE for d in datas)
        batch = getattr(self._session, "decode_batch", None)
        try:
            if batch is not None and all_sptc:
                frames = batch(datas, device_out=device_out)
            else:
                frames = [self._decode_one(d) for d in datas]
        except Exception:
            self.crashed = True
            raise
        self.crashed = False
        if fmts and fmts[-1] != self.fmt:
            self.fmt = fmts[-1]
            self._adapter = _FormatAdapter(fmts[-1])
        if device_out:
            return frames
        return [
            (_FormatAdapter(f).from_internal(fr) if f != self.fmt
             else self._adapter.from_internal(fr))
            for f, fr in zip(fmts, frames)
        ]
