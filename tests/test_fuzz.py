"""Property/fuzz tests: random structured screen content must round-trip
byte-identically across all three implementations."""

import numpy as np
import pytest

from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.native import NativeDecoder, NativeEncoder, is_available
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder


def random_screen_frame(rng, h, w):
    """Mix of flat regions, rectangles, gradients, noise, repeated tiles."""
    f = np.full((h, w, 3), rng.integers(0, 256, 3), np.uint8)
    for _ in range(int(rng.integers(0, 6))):
        kind = rng.integers(0, 4)
        y0, x0 = int(rng.integers(0, h)), int(rng.integers(0, w))
        hh, ww = int(rng.integers(1, h)), int(rng.integers(1, w))
        y1, x1 = min(y0 + hh, h), min(x0 + ww, w)
        if kind == 0:
            f[y0:y1, x0:x1] = rng.integers(0, 256, 3)
        elif kind == 1:
            f[y0:y1, x0:x1] = rng.integers(0, 256, (y1 - y0, x1 - x0, 3), dtype=np.uint8)
        elif kind == 2:
            g = (np.arange(x1 - x0) + int(rng.integers(0, 256))) % 256
            f[y0:y1, x0:x1] = g[None, :, None].astype(np.uint8)
        else:
            tile = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
            reps = (-(-(y1 - y0) // 4), -(-(x1 - x0) // 4), 1)
            f[y0:y1, x0:x1] = np.tile(tile, reps)[: y1 - y0, : x1 - x0]
    return f


def mutate(rng, f):
    f = f.copy()
    kind = rng.integers(0, 4)
    h, w, _ = f.shape
    if kind == 0:  # no change
        return f
    if kind == 1:  # scroll
        return np.roll(f, int(rng.integers(-12, 13)), axis=int(rng.integers(0, 2)))
    if kind == 2:  # small edit
        y, x = int(rng.integers(0, h)), int(rng.integers(0, w))
        f[y : y + 3, x : x + 5] = rng.integers(0, 256, 3)
        return f
    return random_screen_frame(rng, h, w)  # scene cut


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_sequences_spec_native(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(8, 49))
    w = int(rng.integers(8, 65))
    cfg = CodecConfig(width=w, height=h, msr_x=6, msr_y=6, kf_interval=4)
    frames = [random_screen_frame(rng, h, w)]
    for _ in range(5):
        frames.append(mutate(rng, frames[-1]))

    se, sd = SpecEncoder(cfg), SpecDecoder(cfg)
    ne = NativeEncoder(cfg) if is_available() else None
    nd = NativeDecoder(cfg) if is_available() else None
    for i, f in enumerate(frames):
        data, ftype = se.encode(f)
        out = sd.decode(data)
        np.testing.assert_array_equal(out, f, err_msg=f"seed {seed} frame {i}")
        if ne is not None:
            ndata, nft = ne.encode(f)
            assert ndata == data, f"seed {seed} frame {i}: native bytes differ"
            np.testing.assert_array_equal(nd.decode(data), f)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_jax_matches(seed):
    from screenpressor_tpu.jx.codec import JaxDecoder, JaxEncoder

    rng = np.random.default_rng(100 + seed)
    h, w = 33, 41
    cfg = CodecConfig(width=w, height=h, msr_x=6, msr_y=6, kf_interval=3)
    frames = [random_screen_frame(rng, h, w)]
    for _ in range(4):
        frames.append(mutate(rng, frames[-1]))
    se = SpecEncoder(cfg)
    je, jd = JaxEncoder(cfg), JaxDecoder(cfg)
    for i, f in enumerate(frames):
        data, _ = se.encode(f)
        jdata, _ = je.encode(f)
        assert jdata == data, f"seed {seed} frame {i}: jax bytes differ"
        np.testing.assert_array_equal(np.asarray(jd.decode(data)), f)


@pytest.mark.slow
def test_fuzz_jax_dense_tier_matches():
    """Scroll on a frame with >_PROBE_SMALL_CAP changed blocks drives the
    dense (rarity-probe, gather-free) motion tier; bytes must still match
    the spec encoder exactly."""
    from screenpressor_tpu.jx.blocks import _PROBE_SMALL_CAP
    from screenpressor_tpu.jx.codec import JaxDecoder, JaxEncoder

    rng = np.random.default_rng(424)
    h, w = 384, 400  # 25x24 = 600 blocks > 512 cap
    assert (h // 16) * (w // 16) > _PROBE_SMALL_CAP
    cfg = CodecConfig(width=w, height=h, msr_x=16, msr_y=16, kf_interval=10)
    base = random_screen_frame(rng, h, w)
    # text-like detail on a dominant background (exercises rarity probes)
    base[::7, ::3] = (10, 12, 14)
    frames = [base]
    frames.append(np.roll(base, 5, axis=0))          # global scroll
    nxt = np.roll(frames[-1], -16, axis=1)
    nxt[300:340, 60:200] = rng.integers(0, 256, (40, 140, 3), dtype=np.uint8)
    frames.append(nxt)                               # scroll + new content
    idle = nxt.copy()
    frames.append(idle)                              # idle
    se = SpecEncoder(cfg)
    je, jd = JaxEncoder(cfg), JaxDecoder(cfg)
    for i, f in enumerate(frames):
        data, _ = se.encode(f)
        jdata, _ = je.encode(f)
        assert jdata == data, f"frame {i}: jax bytes differ (dense tier)"
        np.testing.assert_array_equal(np.asarray(jd.decode(data)), f)
