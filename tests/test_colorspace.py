import numpy as np

from screenpressor_tpu import colorspace as cs


def test_rgb16_roundtrip_565():
    rng = np.random.default_rng(0)
    f = rng.integers(0, 1 << 16, (17, 23), dtype=np.uint16)
    rgb = cs.rgb16_to_rgb24(f, 0xF800, 0x07E0, 0x001F)
    back = cs.rgb24_to_rgb16(rgb, 0xF800, 0x07E0, 0x001F)
    np.testing.assert_array_equal(f, back)


def test_rgb16_roundtrip_555():
    rng = np.random.default_rng(1)
    f = (rng.integers(0, 1 << 15, (9, 31)).astype(np.uint16))
    rgb = cs.rgb16_to_rgb24(f, 0x7C00, 0x03E0, 0x001F)
    back = cs.rgb24_to_rgb16(rgb, 0x7C00, 0x03E0, 0x001F)
    np.testing.assert_array_equal(f, back)


def test_rgb32_roundtrip():
    rng = np.random.default_rng(2)
    f = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    rgb = cs.rgb32_to_rgb24(f)
    back = cs.rgb24_to_rgb32(rgb)
    np.testing.assert_array_equal(back[..., :3], f[..., :3])
    assert (back[..., 3] == 255).all()
