"""Pallas section kernels must reproduce the lax.scan coder exactly
(same records, same updated tables) for every codec."""

import numpy as np
import pytest

from screenpressor_tpu.config import lane_count
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx import kernels as kx
from screenpressor_tpu.jx.tables import renew_tables

from tests.test_jx_coder import SPEC_CODECS, _spec_records


@pytest.mark.parametrize("name", ["rec", "col", "bt", "sxy", "mv"])
@pytest.mark.parametrize("n", [5, 700])
def test_decode_kernel_matches_scan(name, n):
    import jax.numpy as jnp

    rng = np.random.default_rng(sum(map(ord, name)) + n + 3)
    records = _spec_records(name, n, rng)
    k = lane_count(n)
    rec_arr = np.asarray([list(r) for r in records], np.int32)
    blobs, _ = jc.encode_section(rec_arr, k, renew_tables(), name)

    t_steps = jc._pad_steps(-(-n // k))
    lens = jnp.asarray(jc.lane_lengths(n, k))
    max_len = max(max(len(b) for b in blobs), 4)
    payload = np.zeros((k, max_len), np.uint8)
    for i, b in enumerate(blobs):
        payload[i, : len(b)] = np.frombuffer(b, np.uint8)
    payload = jnp.asarray(payload)

    recs_scan, tabs_scan = jc.decode_section_scan(
        payload, lens, renew_tables(), name, k, t_steps
    )
    recs_kern, tabs_kern = kx.decode_section_kernel(
        payload, lens, renew_tables(), name, k, t_steps
    )
    np.testing.assert_array_equal(np.asarray(recs_kern), np.asarray(recs_scan))
    for kd in tabs_scan:
        np.testing.assert_array_equal(
            np.asarray(tabs_kern[kd]["cnt"]), np.asarray(tabs_scan[kd]["cnt"]),
            err_msg=f"table {kd} cnt",
        )
        np.testing.assert_array_equal(
            np.asarray(tabs_kern[kd]["cntsum"]), np.asarray(tabs_scan[kd]["cntsum"]),
            err_msg=f"table {kd} cntsum",
        )


@pytest.mark.parametrize("name", ["rec", "col", "bt", "sxy", "mv"])
@pytest.mark.parametrize("n", [5, 700])
def test_encode_kernel_matches_scan(name, n):
    import jax.numpy as jnp

    rng = np.random.default_rng(sum(map(ord, name)) + n + 11)
    records = _spec_records(name, n, rng)
    k = lane_count(n)
    codec = jc.CODECS[name]
    t_steps = jc._pad_steps(-(-n // k))
    lens_np = jc.lane_lengths(n, k)
    recs = np.zeros((t_steps, k, codec.rec_width), np.int32)
    lane, t = jc.gather_order(n, k)
    recs[t, lane] = np.asarray([list(r) for r in records], np.int32)
    recs = jnp.asarray(recs)
    lens = jnp.asarray(lens_np)

    cum, freq, act, tabs_scan = jc.model_scan(
        recs, lens, renew_tables(), name, k, t_steps
    )
    nsub = len(codec.kinds)
    cap = 2 * t_steps * nsub + 8
    buf_s, start_s = jc.rans_pack(cum, freq, act, cap)
    buf_s, start_s = np.asarray(buf_s), np.asarray(start_s)
    blobs_scan = [
        bytes(buf_s[i, start_s[i]:].tobytes()) if lens_np[i] > 0 else b""
        for i in range(k)
    ]

    buf_k, start_k, tabs_kern = kx.encode_section_kernel(
        recs, lens, renew_tables(), name, k, t_steps
    )
    buf_k, start_k = np.asarray(buf_k), np.asarray(start_k)
    blobs_kern = [
        bytes(buf_k[i, start_k[i]:].tobytes()) if lens_np[i] > 0 else b""
        for i in range(k)
    ]
    assert blobs_kern == blobs_scan
    for kd in tabs_scan:
        np.testing.assert_array_equal(
            np.asarray(tabs_kern[kd]["cnt"]), np.asarray(tabs_scan[kd]["cnt"]),
            err_msg=f"table {kd}",
        )


def test_512_lane_sections_roundtrip():
    """K=512 lanes (the k_max=512 perf experiment for big sections) must
    flow through both coder paths byte-identically."""
    import numpy as np

    from screenpressor_tpu.api import Decoder, Encoder
    from screenpressor_tpu.config import CodecConfig

    h, w = 64, 96
    rng = np.random.default_rng(3)
    f = (rng.integers(0, 4, (h, w, 3)) * 60).astype(np.uint8)
    cfg = CodecConfig(width=w, height=h, k_max=512, target_per_lane=8)
    enc, dec = Encoder(cfg, backend="jax"), Decoder(cfg, backend="jax")
    enc_s = Encoder(cfg, backend="spec")
    d, _ = enc.encode(f)
    d2, _ = enc_s.encode(f)
    assert d == d2
    assert np.array_equal(dec.decode(d), f)


def test_decode_sections_fused_matches_sequential(monkeypatch):
    """The fused multi-section decode (one pallas launch, tables chained in
    VMEM) must produce the records and table state of sequential
    decode_section_auto calls."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from screenpressor_tpu.jx import coder as jc
    from screenpressor_tpu.jx import kernels as kx
    from screenpressor_tpu.jx.tables import renew_tables

    monkeypatch.setenv("SPTC_KERNELS", "1")
    rng = np.random.default_rng(3)
    kts, pay_list, lens_list = [], [], []
    # two sections: rec then col (chained ptype/nrun then color tables)
    specs = [("rec", 80, 2), ("col", 60, 3)]
    tabs_enc = renew_tables()
    for name, n, w in specs:
        if name == "rec":
            data = np.stack([rng.integers(0, 6, n),
                             rng.integers(1, 256, n)], 1).astype(np.int32)
        else:
            pal = rng.integers(0, 256, (5, 3))
            data = pal[rng.integers(0, 5, n)].astype(np.int32)
        k = 4
        t = jc._pad_steps(-(-n // k))
        recs = np.zeros((t, k, w), np.int32)
        lane, tt = jc.gather_order(n, k)
        recs[tt, lane] = data
        lens = jc.lane_lengths(n, k)
        buf, start, tabs_enc = jc.encode_section_auto(
            jnp.asarray(recs), jnp.asarray(lens), tabs_enc, name, k, t)
        buf, start = np.asarray(buf), np.asarray(start)
        maxlen = max(int(buf.shape[1] - start[i]) for i in range(k))
        pay = np.zeros((k, max(jc._pad_steps(maxlen), 4)), np.uint8)
        for i in range(k):
            if lens[i] > 0:
                pay[i, : buf.shape[1] - start[i]] = buf[i, start[i]:]
        kts.append((name, k, t))
        pay_list.append(jnp.asarray(pay))
        lens_list.append(jnp.asarray(lens))

    r_seq, tab_seq = [], renew_tables()
    for (name, k, t), pay, lens in zip(kts, pay_list, lens_list):
        r, tab_seq = jc.decode_section_auto(pay, lens, tab_seq, name, k, t,
                                            batched=False)
        r_seq.append(np.asarray(r))
    r_fus, tab_fus = kx.decode_sections_fused(
        pay_list, lens_list, renew_tables(), tuple(kts))
    for a, b in zip(r_seq, r_fus):
        np.testing.assert_array_equal(a, np.asarray(b))
    for kind in tab_seq:
        for key in tab_seq[kind]:
            np.testing.assert_array_equal(
                np.asarray(tab_seq[kind][key]), np.asarray(tab_fus[kind][key]),
                err_msg=f"{kind}.{key}")
