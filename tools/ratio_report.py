"""Compression-ratio report: SPTC vs reference-format v2/v4 vs zlib.

Runs the synthetic screencast corpus AND the rendered real-content corpus
(tools/real_corpus.py: antialiased code editor / terminal / document) through (a) this framework's SPTC1
codec, (b) the SCPR v2 legacy encoder (the reference's bitstream format,
deterministic single-worker policy), and (c) zlib level 6 on raw frames, and
prints per-sequence and aggregate ratios.

Usage: PYTHONPATH=. python tools/ratio_report.py [HxW] [frames] [backend]
backend: "spec" (default) or "jax" — byte-identical streams (enforced by the
round-trip asserts + the cross-backend test suite); jax is the practical
choice at production resolutions (the numpy spec coder's python section
loops are O(records) per frame).
"""

import sys
import zlib

import numpy as np

sys.path.insert(0, ".")
from screenpressor_tpu.api import Decoder, Encoder
from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.native.legacy import LegacyV2Decoder, LegacyV2Encoder
from screenpressor_tpu.native.legacy_ans import ScprAnsDecoder, ScprAnsEncoder


def synth(kind, h, w, n, seed=0):
    rng = np.random.default_rng(seed)
    base = np.full((h + 8 * n, w, 3), (40, 44, 52), np.uint8)
    base[40 : h - 40, 60 : w - 60] = (250, 250, 250)
    for y in range(48, h - 48, 14):
        ln = int(rng.integers(w // 4, max(w - 140, w // 4 + 2)))
        base[y : y + 8, 70 : min(70 + ln, w - 1) : 2] = (20, 20, 24)
    frames = [base[:h].copy()]
    for i in range(1, n):
        if kind == "scroll":
            frames.append(base[8 * i : 8 * i + h].copy())
        elif kind == "typing":
            f = frames[-1].copy()
            y, x = 60 + (i * 29) % (h - 80), 70 + (i * 53) % (w - 90)
            f[y : y + 10, x : x + 8] = (200, 30, 30)
            frames.append(f)
        elif kind == "photo":  # worst case: noise
            frames.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        else:  # idle
            frames.append(frames[-1].copy())
    return frames


def run(kind, h, w, n, backend="spec"):
    if kind.startswith("real-"):
        from tools.real_corpus import SEQUENCES

        frames = SEQUENCES[kind[5:]](h, w, n)
    else:
        frames = synth(kind, h, w, n)
    raw = n * h * w * 3

    cfg = CodecConfig(width=w, height=h, msr_x=16, msr_y=16)
    se, sd = Encoder(cfg, backend=backend), Decoder(cfg, backend=backend)
    sptc = 0
    for f in frames:
        d, _ = se.encode(f)
        assert (np.asarray(sd.decode(d)) == f).all()
        sptc += len(d)

    ve, vd = LegacyV2Encoder(w, h, msr_x=16, msr_y=16), LegacyV2Decoder(w, h, msr_x=16, msr_y=16)
    v2 = 0
    for f in frames:
        d, _ = ve.encode(f)
        assert (vd.decode(d) == f).all()
        v2 += len(d)

    e4, d4 = ScprAnsEncoder(4, w, h, msr_x=16, msr_y=16), ScprAnsDecoder(4, w, h, msr_x=16, msr_y=16)
    v4 = 0
    for f in frames:
        d, _ = e4.encode(f)
        assert (d4.decode(d) == f).all()
        v4 += len(d)

    z = sum(len(zlib.compress(f.tobytes(), 6)) for f in frames)
    print(
        f"{kind:>7}: raw {raw:>9}B | SPTC {sptc:>8}B ({raw/sptc:7.1f}x) | "
        f"v2 {v2:>8}B ({raw/v2:7.1f}x) | v4 {v4:>8}B ({raw/v4:7.1f}x) | "
        f"zlib {z:>8}B ({raw/z:6.1f}x) | SPTC/v4 size {sptc/v4:5.2f}"
    )
    return raw, sptc, v2, v4, z


def main():
    dims = sys.argv[1] if len(sys.argv) > 1 else "288x512"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    backend = sys.argv[3] if len(sys.argv) > 3 else "spec"
    h, w = (int(v) for v in dims.split("x"))
    tot = np.zeros(5, np.int64)
    kinds = ("idle", "typing", "scroll", "photo",
             "real-code", "real-terminal", "real-document", "real-mixed")
    for kind in kinds:
        tot += np.asarray(run(kind, h, w, n, backend), np.int64)
    raw, sptc, v2, v4, z = tot
    print(
        f"{'TOTAL':>7}: raw {raw:>9}B | SPTC {sptc:>8}B ({raw/sptc:7.1f}x) | "
        f"v2 {v2:>8}B ({raw/v2:7.1f}x) | v4 {v4:>8}B ({raw/v4:7.1f}x) | "
        f"zlib {z:>8}B ({raw/z:6.1f}x) | SPTC/v4 size {sptc/v4:5.2f}"
    )


if __name__ == "__main__":
    main()
