"""Generate pinned golden streams for format-drift detection (VERDICT #6).

Self-produced fixtures: SPTC (spec encoder) and SCPR v2/v3/v4 (native
interop encoders) over a deterministic session covering flat, I, P
(scroll/typing/no-change), raw-escape, and odd frame sizes.

Procedural goldens (manifest-only: crc32 + per-frame sizes, frames
regenerated deterministically at test time; keeps multi-hundred-KB streams
out of the repo): the serving k_fixed lane policy and a v4 session crossing
the 128K rANS reseed boundary.

Re-run only on a DELIBERATE format change: python tools/make_goldens.py
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# goldens are platform-independent (byte identity is the core invariant);
# generate on CPU so a TPU-less/tunnel-down rig can regenerate them. The
# config update (not just the env var) is required: this rig's axon
# sitecustomize re-registers the TPU plugin after env evaluation.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from screenpressor_tpu.api import Encoder
from screenpressor_tpu.config import CodecConfig

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data")


def session_frames(h, w):
    rng = np.random.default_rng(42)
    base = np.full((h + 60, w, 3), (30, 40, 50), np.uint8)
    base[h // 6 : h - h // 6, 8 : w - 8] = (250, 250, 250)
    for y in range(h // 5, h - h // 5, 6):
        base[y : y + 2, 10 : w - 16 : 2] = (10, 20, 30)
    frames = [base[:h].copy(), base[4 : 4 + h].copy()]
    f = frames[-1].copy()
    f[5:9, 7:12] = (200, 30, 30)
    frames.append(f)
    frames.append(f.copy())
    frames.append(np.full((h, w, 3), (9, 9, 9), np.uint8))
    frames.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    frames.append(base[8 : 8 + h].copy())
    return frames


def serving_session_frames(h=96, w=128, s=3):
    """Deterministic multi-stream serving session (k_fixed lane policy)."""
    base = np.stack([
        np.roll(session_frames(h, w)[0], 7 * i, axis=1) for i in range(s)
    ])
    seq = [base]
    # edit region scaled from h/w so the session content stays a wide edit
    # at every fixture shape (ADVICE r3: the old absolute slice clipped to
    # 8 columns at the h=32,w=48 serving-golden shape)
    f = base.copy(); f[:, h // 5 : h // 3, w // 3 : 2 * w // 3] = (250, 250, 250)
    seq.append(f)
    seq.append(np.roll(f, 5, axis=1))
    seq.append(seq[-1].copy())
    return seq


def reseed_session_frames(h=240, w=320):
    rng = np.random.default_rng(0)
    frames = []
    prev = None
    for i in range(5):
        if i % 3 == 0:
            fr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif i % 3 == 1:
            fr = prev.copy()
            fr[20:80, 30:200] = rng.integers(0, 256, (60, 170, 3), dtype=np.uint8)
        else:
            fr = np.roll(prev, 16, axis=0)
        frames.append(fr)
        prev = fr
    return frames


def procedural_entries():
    """(name, encode_session() -> list[bytes]) pairs for manifest-only
    goldens."""
    import dataclasses

    def serving():
        from screenpressor_tpu.parallel.serving import BatchedEncoder

        # same (s, h, w, k_fixed, msr) family as tests/test_serving.py so the
        # suite compiles this program family exactly once (cold-run wall time)
        cfg = CodecConfig(width=48, height=32, kf_interval=3, k_fixed=8,
                          msr_x=8, msr_y=8)
        enc = BatchedEncoder(4, cfg, kf_offsets=[0, 1, 2, 0])
        payloads = []
        for fr in serving_session_frames(h=32, w=48, s=4):
            payloads.extend(p for p, _ in enc.encode(fr))
        return payloads

    def reseed():
        from screenpressor_tpu.native.legacy_ans import ScprAnsEncoder

        enc = ScprAnsEncoder(4, 320, 240, kf_interval=4)
        return [enc.encode(fr)[0] for fr in reseed_session_frames()]

    def rgb16():
        from screenpressor_tpu.api import Encoder, FormatParams, PixelFormat

        rng = np.random.default_rng(5)
        fmt = FormatParams(pixel_format=PixelFormat.RGB16,
                           rmask=0xF800, gmask=0x07E0, bmask=0x001F)
        cfg = CodecConfig(width=48, height=32, kf_interval=3)
        enc = Encoder(cfg, fmt=fmt, backend="spec")
        frames = [rng.integers(0, 1 << 16, (32, 48), dtype=np.uint16)
                  for _ in range(3)]
        frames.append(frames[-1].copy())
        return [enc.encode(f)[0] for f in frames]

    return [("procedural_serving_kfixed", serving),
            ("procedural_scpr4_reseed", reseed),
            ("procedural_rgb16_565", rgb16)]


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    for h, w in ((48, 64), (49, 67)):  # even and odd sizes
        frames = session_frames(h, w)
        np.save(os.path.join(OUT, f"golden_frames_{h}x{w}.npy"),
                np.stack(frames))
        for backend in ("spec", "scpr2", "scpr3", "scpr4"):
            cfg = CodecConfig(width=w, height=h, kf_interval=5)
            enc = Encoder(cfg, backend=backend)
            blob = b""
            sizes = []
            for fr in frames:
                p, _ = enc.encode(fr)
                sizes.append(len(p))
                blob += p
            name = f"golden_{backend}_{h}x{w}.bin"
            with open(os.path.join(OUT, name), "wb") as fh:
                fh.write(blob)
            manifest[name] = {
                "sizes": sizes,
                "crc32": zlib.crc32(blob),
                "h": h, "w": w, "kf_interval": 5,
            }
    for name, encode_session in procedural_entries():
        payloads = encode_session()
        manifest[name] = {
            "sizes": [len(p) for p in payloads],
            "crc32": zlib.crc32(b"".join(payloads)),
            "procedural": True,
        }
    with open(os.path.join(OUT, "golden_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print("wrote", len(manifest), "golden entries to", OUT)


if __name__ == "__main__":
    main()
