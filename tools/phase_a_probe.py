"""Phase-A (P-frame analysis) microbenchmark on the live backend.

Times analyze_compact per content kind (idle / typing / scroll) and per
dispatch shape (lax.map batch_size, force_dense) plus the individual
sub-stages (change_analysis, rarity probes, dense probe matrix, pre-sweep)
so encode-path chunking policy is chosen from data, not guesses.

Usage:  python tools/phase_a_probe.py            # on TPU via tunnel
        JAX_PLATFORMS=cpu python tools/phase_a_probe.py   # sanity
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sptc_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_screencast, _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp

from screenpressor_tpu.config import BLOCK, CodecConfig, next_pow2
from screenpressor_tpu.jx import blocks as jb
from screenpressor_tpu.jx.pframe import _cands_rmax


def t(fn, *args, n=5, **kw):
    fn(*args, **kw)  # compile
    jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    h = int(os.environ.get("BENCH_H", 1080))
    w = int(os.environ.get("BENCH_W", 1920))
    cfg = CodecConfig(width=w, height=h)
    cands, cols, rmax, lows = _cands_rmax(cfg)
    mlow = max(lows)
    nbp = next_pow2(cfg.nbx * cfg.nby)
    frames = synth_screencast(h, w, 9)
    # kinds by index: 1 scroll, 2 typing, 3 idle (cycle of 4)
    pairs = {
        "idle": (frames[4], frames[3]),
        "typing": (frames[2], frames[1]),
        "scroll": (frames[5], frames[4]),
    }
    dev = {k: (jnp.asarray(a), jnp.asarray(b)) for k, (a, b) in pairs.items()}

    print(f"backend={jax.default_backend()} {h}x{w}", flush=True)

    def ac(f, p, force_dense=False):
        return jb.analyze_compact(
            f, p, cands, cols, h, w, cfg.nby, cfg.nbx, rmax, nbp,
            cfg.msr_x, cfg.msr_y, lows[0], lows[1], force_dense,
        )

    for kind, (f, p) in dev.items():
        ms = t(ac, f, p)
        msd = t(ac, f, p, force_dense=True)
        d2 = np.zeros((cfg.nby * BLOCK, cfg.nbx * BLOCK), bool)
        d2[:h, :w] = np.asarray(jnp.any(f != p, axis=-1))
        nch = int(d2.reshape(cfg.nby, BLOCK, cfg.nbx, BLOCK)
                  .any(axis=(1, 3)).sum())
        print(f"analyze[{kind}] 1-frame: {ms:.1f} ms (force_dense {msd:.1f}) "
              f"changed_blocks={nch}", flush=True)

    # sub-stages on the scroll pair
    f, p = dev["scroll"]
    ca = jax.jit(lambda f, p: jb.change_analysis(f, p, h, w, cfg.nby, cfg.nbx))
    print(f"change_analysis: {t(ca, f, p):.1f} ms", flush=True)

    f32 = f.astype(jnp.int32)
    p32 = p.astype(jnp.int32)
    fr2d = f32[..., 0] | (f32[..., 1] << 8) | (f32[..., 2] << 16)
    pv2d = p32[..., 0] | (p32[..., 1] << 8) | (p32[..., 2] << 16)
    diff = jnp.any(f != p, axis=-1)

    rp = jax.jit(lambda: jb._rarity_probes(fr2d, pv2d, diff, h, w, cfg.nby, cfg.nbx))
    print(f"rarity_probes: {t(rp):.1f} ms", flush=True)
    r1, r2 = rp()
    pod = jax.jit(lambda: jb._probe_ok_dense(
        pv2d, fr2d.reshape(-1), (r1.reshape(-1), r2.reshape(-1)), h, w,
        cfg.nby, cfg.nbx, cfg.msr_x, cfg.msr_y, mlow))
    print(f"probe_ok_dense (dual): {t(pod):.1f} ms", flush=True)

    # per-kind batched cost inside ONE program (no tunnel RTT per frame):
    # scan (real branches) vs vmap/force_dense (select-flattened) over B
    # copies of the same pair — the serving/bench phase-A cost model.
    B = int(os.environ.get("PROBE_B", 16))

    def scanned(fs, ps):
        def one(fp):
            arrs, counts, flat = ac(*fp)
            return jnp.concatenate([counts, flat])
        return jax.lax.map(one, (fs, ps))

    def vmapped(fs, ps):
        def one(f, p):
            arrs, counts, flat = ac(f, p, force_dense=True)
            return jnp.concatenate([counts, flat])
        return jax.vmap(one)(fs, ps)

    for kind, (f, p) in dev.items():
        fs = jnp.broadcast_to(f[None], (B,) + f.shape)
        ps = jnp.broadcast_to(p[None], (B,) + p.shape)
        ms = t(jax.jit(scanned), fs, ps, n=3)
        msv = t(jax.jit(vmapped), fs, ps, n=3)
        print(f"scan{B}[{kind}]: {ms:.1f} ms ({ms/B:.2f}/frame)  "
              f"vmap{B}: {msv:.1f} ms ({msv/B:.2f}/frame)", flush=True)

    # mixed-content scan (the bench's actual phase A)
    seq = synth_screencast(h, w, B + 1)
    fs = jnp.stack([jnp.asarray(x) for x in seq[1:B + 1]])
    ps = jnp.stack([jnp.asarray(x) for x in seq[0:B]])
    ms = t(jax.jit(scanned), fs, ps, n=3)
    print(f"scan{B}[mixed]: {ms:.1f} ms ({ms/B:.2f}/frame)", flush=True)


if __name__ == "__main__":
    main()


def sweep_costs():
    """Isolate pre-sweep full_check and windowed-search costs."""
    h = int(os.environ.get("BENCH_H", 1080))
    w = int(os.environ.get("BENCH_W", 1920))
    cfg = CodecConfig(width=w, height=h)
    cands, cols, rmax, lows = _cands_rmax(cfg)
    mlow = max(lows)
    frames = synth_screencast(h, w, 9)
    f = jnp.asarray(frames[2]); p = jnp.asarray(frames[1])   # typing
    fs = jnp.asarray(frames[5]); ps = jnp.asarray(frames[4])  # scroll
    nby, nbx = cfg.nby, cfg.nbx
    nb = nby * nbx

    def presweep(f, p, iters):
        f32 = f.astype(jnp.int32); p32 = p.astype(jnp.int32)
        fr2d = f32[..., 0] | (f32[..., 1] << 8) | (f32[..., 2] << 16)
        pv2d = p32[..., 0] | (p32[..., 1] << 8) | (p32[..., 2] << 16)
        pvP = jnp.pad(pv2d, ((rmax, rmax), (rmax, rmax)), constant_values=-1)
        changed, rects, in_sub = jb.change_analysis(f, p, h, w, nby, nbx)
        sub_pad = jnp.zeros((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(in_sub)
        chb = changed.reshape(nb)
        rects_f = rects.reshape(nb, 4)
        x1, y1, x2, y2 = rects_f[:, 0], rects_f[:, 1], rects_f[:, 2], rects_f[:, 3]

        def body(carry):
            best, ci = carry
            mx, my = cands[ci, 0], cands[ci, 1]
            win = jax.lax.dynamic_slice(pvP, (rmax + my, rmax + mx), (h, w))
            neq = win != fr2d
            neq_pad = jnp.ones((nby * BLOCK, nbx * BLOCK), bool).at[:h, :w].set(neq)
            bad = (neq_pad & sub_pad).reshape(nby, BLOCK, nbx, BLOCK).any(axis=(1, 3)).reshape(nb)
            inb = (x1 + mx >= 0) & (x2 + mx <= w) & (y1 + my >= 0) & (y2 + my <= h)
            match = ~bad & inb & chb
            best = jnp.where(match & (best == cands.shape[0]), ci, best)
            return best, ci + 1

        best0 = jnp.full((nb,), cands.shape[0], jnp.int32)
        best, _ = jax.lax.while_loop(
            lambda c: c[1] < iters, body, (best0, jnp.int32(0)))
        return best

    for iters in (8, 24):
        ms = t(jax.jit(functools.partial(presweep, iters=iters)), f, p)
        print(f"pre-sweep {iters} iters (typing): {ms:.1f} ms", flush=True)

    # windowed search on typing (1 changed block)
    from screenpressor_tpu.jx.blocks import motion_search_windowed
    changed, rects, in_sub = jb.change_analysis(f, p, h, w, nby, nbx)
    chn = np.asarray(changed)
    bys, bxs = np.nonzero(chn)
    ncb = len(bys)
    bcap = 16
    r = np.zeros((bcap, 4), np.int32); r[:ncb] = np.asarray(rects)[bys, bxs]
    valid = np.zeros(bcap, bool); valid[:ncb] = True
    bw = (r[:, 2] - r[:, 0])[:, None, None]
    bh = (r[:, 3] - r[:, 1])[:, None, None]
    masks = (np.arange(BLOCK)[None, :, None] < bh) & (np.arange(BLOCK)[None, None, :] < bw)
    ms = t(motion_search_windowed, f, p, jnp.asarray(r), jnp.asarray(valid),
           jnp.asarray(masks), cands, h, w, bcap, rmax)
    print(f"windowed search (typing, {ncb} blocks, full cand sweep): {ms:.1f} ms", flush=True)

    # rarity probes: scatter hist vs sort-based
    f32 = fs.astype(jnp.int32); p32 = ps.astype(jnp.int32)
    fr2d = f32[..., 0] | (f32[..., 1] << 8) | (f32[..., 2] << 16)
    pv2d = p32[..., 0] | (p32[..., 1] << 8) | (p32[..., 2] << 16)

    def hist_scatter():
        qp = ((pv2d >> 3) & 0x1F) | ((pv2d >> 6) & 0x3E0) | ((pv2d >> 9) & 0x7C00)
        sub = qp[::4, ::4].reshape(-1)
        hist = jnp.zeros((32768,), jnp.int32).at[sub].add(1)
        _, doms = jax.lax.top_k(hist, 4)
        return doms

    def hist_sort():
        qp = ((pv2d >> 3) & 0x1F) | ((pv2d >> 6) & 0x3E0) | ((pv2d >> 9) & 0x7C00)
        sub = jnp.sort(qp[::4, ::4].reshape(-1))
        n = sub.shape[0]
        bnd = jnp.concatenate([jnp.array([True]), sub[1:] != sub[:-1]])
        idx = jnp.arange(n)
        start = jnp.where(bnd, idx, -1)
        start = jax.lax.cummax(start)
        # run length at each position = next boundary - start; take value at run starts
        nxt = jnp.where(bnd, idx, n)
        # reverse cummin for next boundary
        nxt = jax.lax.cummin(jnp.concatenate([nxt[1:], jnp.array([n])])[::-1])[::-1]
        runlen = jnp.where(bnd, nxt - start, -1)
        _, top = jax.lax.top_k(runlen, 4)
        return sub[top]

    print(f"hist scatter+topk: {t(jax.jit(hist_scatter)):.1f} ms", flush=True)
    print(f"hist sort+topk:    {t(jax.jit(hist_sort)):.1f} ms", flush=True)


import functools
