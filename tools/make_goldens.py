"""Generate pinned golden streams for format-drift detection (VERDICT #6).

Self-produced fixtures: SPTC (spec encoder) and SCPR v2/v3/v4 (native
interop encoders) over a deterministic session covering flat, I, P
(scroll/typing/no-change), raw-escape, and odd frame sizes.
Re-run only on a DELIBERATE format change: python tools/make_goldens.py
"""

import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    for h, w in ((64, 96), (49, 67)):  # even and odd sizes
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
    with open(os.path.join(OUT, "golden_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print("wrote", len(manifest), "golden streams to", OUT)


if __name__ == "__main__":
    main()
