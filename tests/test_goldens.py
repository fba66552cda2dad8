"""Golden-stream conformance: pinned fixtures (tests/data) must re-encode
byte-identically and decode losslessly. Catches any accidental format drift
in SPTC or the SCPR v2/v3/v4 interop codecs (VERDICT round-1 missing #4).

Regenerate ONLY on a deliberate format change: python tools/make_goldens.py
"""

import json
import os
import zlib

import numpy as np
import pytest

from screenpressor_tpu.api import Decoder, Encoder
from screenpressor_tpu.config import CodecConfig

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

with open(os.path.join(DATA, "golden_manifest.json")) as fh:
    MANIFEST = json.load(fh)


def _split(blob, sizes):
    out, pos = [], 0
    for s in sizes:
        out.append(blob[pos : pos + s])
        pos += s
    assert pos == len(blob)
    return out


@pytest.mark.parametrize(
    "name", sorted(n for n, m in MANIFEST.items() if not m.get("procedural")))
def test_golden_reencode_and_decode(name):
    meta = MANIFEST[name]
    h, w = meta["h"], meta["w"]
    backend = name.split("_")[1]
    with open(os.path.join(DATA, name), "rb") as fh:
        blob = fh.read()
    assert zlib.crc32(blob) == meta["crc32"], "fixture corrupted on disk"
    payloads = _split(blob, meta["sizes"])
    frames = np.load(os.path.join(DATA, f"golden_frames_{h}x{w}.npy"))

    cfg = CodecConfig(width=w, height=h, kf_interval=meta["kf_interval"])
    # byte-identical re-encode
    enc = Encoder(cfg, backend=backend)
    for i, fr in enumerate(frames):
        p, _ = enc.encode(fr)
        assert p == payloads[i], f"{name}: frame {i} bytes drifted"
    # lossless decode through the unified dispatcher
    dec = Decoder(cfg)
    for i, (p, fr) in enumerate(zip(payloads, frames)):
        assert np.array_equal(dec.decode(p), fr), f"{name}: frame {i} decode"


def test_golden_jax_backend_matches_spec_fixture():
    name = "golden_spec_48x64.bin"
    meta = MANIFEST[name]
    with open(os.path.join(DATA, name), "rb") as fh:
        payloads = _split(fh.read(), meta["sizes"])
    frames = np.load(os.path.join(DATA, "golden_frames_48x64.npy"))
    cfg = CodecConfig(width=64, height=48, kf_interval=meta["kf_interval"])
    enc = Encoder(cfg, backend="jax")
    got = enc.encode_batch(list(frames))
    for i, (p, _) in enumerate(got):
        assert p == payloads[i], f"jax frame {i} drifted from pinned spec bytes"


@pytest.mark.parametrize("name", sorted(
    n for n, m in MANIFEST.items() if m.get("procedural")))
def test_procedural_golden_pins(name):
    """Manifest-only goldens: the deterministic session re-encodes to the
    pinned crc32 + per-frame sizes (keeps multi-hundred-KB fixtures out of
    the repo). Pins the serving k_fixed lane policy and the v3/v4 128K
    reseed path against format drift in default CI (round-2 VERDICT #9)."""
    import zlib as _zlib

    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys
    if sys_path_root not in sys.path:
        sys.path.insert(0, sys_path_root)
    from tools.make_goldens import procedural_entries

    encode_session = dict(procedural_entries())[name]
    payloads = encode_session()
    meta = MANIFEST[name]
    assert [len(p) for p in payloads] == meta["sizes"], f"{name}: sizes drifted"
    assert _zlib.crc32(b"".join(payloads)) == meta["crc32"], f"{name}: bytes drifted"
