"""Multi-step device-resident serving loop (window scan).

One jitted `lax.scan` advances F serving steps for all S streams entirely on
device: analysis, data-block classification, section encode with the raw
escape, the compact keyframe path, flat/no-change bookkeeping, AND the
container byte assembly — with fixed-capacity shapes throughout (VERDICT r3
#2). The host's per-window cost is two tunnel pulls (a [F, S] length/kind
matrix, then one tight gather of exactly the output stream bytes) instead of
two pulls plus dozens of dispatches per step.

Capacity semantics: the per-step record/block capacities are static. A
stream-step whose content exceeds a capacity is emitted as a RAW frame
(format-legal, losslessly decodable, tables renewed — the same escape the
size rule already uses); within capacities the emitted bytes are identical
to the sequential `BatchedEncoder.encode()` path (tested).

Reference analog: none — the reference runs N independent codec instances
(`screencap.cpp:1560-1743`); batching whole step-windows is the TPU-native
re-design of that serving model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import (
    ALG_FLAT,
    ALG_I,
    ALG_P,
    ALG_RAW,
    next_pow2,
)
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.jitopts import batch_kernel_jit as _kernel_jit
from screenpressor_tpu.jx.tables import renew_tables
from screenpressor_tpu.spec.codec import FTYPE_I, FTYPE_P

# kind codes in the pulled [F, S] matrix
K_FLAT, K_I, K_NOCHANGE, K_P, K_RAW = 0, 1, 2, 3, 4

# dense-analysis switchover (mirrors serving._DENSE_BATCH_MIN)
_DENSE_MIN = 16


# ---------------------------------------------------------------------------
# Device container emission
# ---------------------------------------------------------------------------


def _varint_emit(vals, cap: int):
    """vals [n] int32 (< 2^28) -> (buf [cap] uint8 of concatenated LEB128,
    total_len). Mirrors bs.pack_varint."""
    v = vals.astype(jnp.int32)
    l = (1 + (v >= 1 << 7).astype(jnp.int32) + (v >= 1 << 14)
         + (v >= 1 << 21))
    offs = jnp.cumsum(l) - l
    b0 = (v & 0x7F) | jnp.where(l > 1, 0x80, 0)
    b1 = ((v >> 7) & 0x7F) | jnp.where(l > 2, 0x80, 0)
    b2 = ((v >> 14) & 0x7F) | jnp.where(l > 3, 0x80, 0)
    b3 = (v >> 21) & 0x7F
    byts = jnp.stack([b0, b1, b2, b3], axis=1).astype(jnp.uint8)
    pos = offs[:, None] + jnp.arange(4)[None, :]
    valid = jnp.arange(4)[None, :] < l[:, None]
    buf = jnp.zeros((cap,), jnp.uint8).at[
        jnp.where(valid, pos, cap)
    ].set(byts, mode="drop")
    return buf, l.sum()


def _sec_meta_bytes(sizes, k: int):
    """Section status byte + minimal-width size table as device bytes.
    sizes [k] int32 -> (meta [1 + 4k] uint8, meta_len). Mirrors
    bs.pack_section's header."""
    klog = max(0, (k - 1).bit_length())
    assert (1 << klog) == k
    m = sizes.max()
    wcode = jnp.where(m < 1 << 8, 0, jnp.where(m < 1 << 16, 1, 2))
    wid = jnp.where(m < 1 << 8, 1, jnp.where(m < 1 << 16, 2, 4))
    status = (klog | (wcode << 4)).astype(jnp.uint8)
    sb = jnp.stack(
        [sizes & 0xFF, (sizes >> 8) & 0xFF, (sizes >> 16) & 0xFF,
         (sizes >> 24) & 0xFF], axis=1,
    ).astype(jnp.uint8)
    cap = 1 + 4 * k
    pos = 1 + jnp.arange(k)[:, None] * wid + jnp.arange(4)[None, :]
    valid = jnp.arange(4)[None, :] < wid
    meta = jnp.zeros((cap,), jnp.uint8).at[0].set(status).at[
        jnp.where(valid, pos, cap)
    ].set(sb, mode="drop")
    return meta, 1 + k * wid


def _container_emit(head_buf, head_len, bufs, starts, lens_l, kts,
                    pack_cap: int):
    """Assemble one stream's full container bytes on device.

    head_buf: [head_cap] uint8 (frame header + varint fields, head_len
    valid); bufs/starts/lens_l: per-section lane buffers. Returns
    (out [pack_cap] uint8, total_len)."""
    from screenpressor_tpu.jx.transfer import gather_segments

    head_cap = head_buf.shape[0]
    parts = [head_buf]
    seg_src, seg_len = [jnp.asarray([0], jnp.int32)], [head_len[None]]
    base = head_cap
    for name, k, _t in kts:
        buf, start, lens = bufs[name], starts[name], lens_l[name]
        cap = buf.shape[1]
        sizes = jnp.where(lens > 0, cap - start, 0).astype(jnp.int32)
        meta, mlen = _sec_meta_bytes(sizes, k)
        parts.append(meta)
        seg_src.append(jnp.asarray([base], jnp.int32))
        seg_len.append(mlen[None])
        base += meta.shape[0]
        parts.append(buf.reshape(-1))
        seg_src.append(base + jnp.arange(k, dtype=jnp.int32) * cap + start)
        seg_len.append(sizes)
        base += k * cap
    src = jnp.concatenate(seg_src)
    lens_all = jnp.concatenate(seg_len).astype(jnp.int32)
    dst = jnp.cumsum(lens_all) - lens_all
    segs = jnp.stack([src, dst, lens_all], axis=1)
    flat = jnp.concatenate(parts)
    out = gather_segments(flat, segs, pack_cap)
    return out, lens_all.sum()


# ---------------------------------------------------------------------------
# The F-step window program
# ---------------------------------------------------------------------------


def _p_head(hdr_vals):
    """P-frame head bytes: [hdr(ALG_P), 1] + varint(8 fields)."""
    vb, vl = _varint_emit(hdr_vals, 34)
    head = jnp.zeros((36,), jnp.uint8)
    head = head.at[0].set(bs.header_byte(ALG_P)).at[1].set(1)
    head = jax.lax.dynamic_update_slice(head, vb[:34], (2,))
    return head, 2 + vl


def _i_head(n_rec, n_lit):
    vb, vl = _varint_emit(jnp.stack([n_rec, n_lit]), 9)
    head = jnp.zeros((10,), jnp.uint8)
    head = head.at[0].set(bs.header_byte(ALG_I))
    head = jax.lax.dynamic_update_slice(head, vb[:9], (1,))
    return head, 1 + vl


@functools.partial(
    _kernel_jit,
    static_argnames=("h", "w", "nby", "nbx", "rmax", "nbp", "msr_x", "msr_y",
                     "low_x", "low_y", "k", "bcap", "rec_cap", "col_cap",
                     "irec_cap", "icol_cap", "pack_cap", "loss", "dense"),
    # prev is NOT donated: BatchedEncoder.encode_begin stores the caller's
    # frame batch there, and donating it would delete a buffer the caller
    # may still hold (measured: "Array has been deleted" in window mode)
    donate_argnums=(4, 5, 6),
)
def encode_window_scan(frames_fs, key_fs, icmeta_fs, prev, tables_b,
                       last_flat, flat_color, cands, cols,
                       h, w, nby, nbx, rmax, nbp, msr_x, msr_y, low_x, low_y,
                       k, bcap, rec_cap, col_cap, irec_cap, icol_cap,
                       pack_cap, loss, dense):
    """The window program. frames_fs [F, S, H, W, 3] uint8; key_fs [F, S]
    bool; icmeta_fs [F, C, 2] int32 (pad, stream idx) — the compact keyframe
    schedule. Carry state as in BatchedEncoder. Returns the advanced carry
    plus stacked per-step outputs (out [F, S, pack_cap], lens, kinds, colors).
    """
    from screenpressor_tpu.jx import blocks as jb2
    from screenpressor_tpu.jx.classify import classify_i
    from screenpressor_tpu.jx.codec import apply_loss_device
    from screenpressor_tpu.jx.iframe import (
        section_bytes_device,
        varint_len_device,
    )
    from screenpressor_tpu.jx.pframe import (
        _SECTION_NAMES,
        classify_assemble,
    )

    s = prev.shape[0]
    raw_threshold = 1 + w * h * 3
    kts_p = tuple(
        (name, k, jc._pad_steps(-(-cap // k)))
        for name, cap in zip(_SECTION_NAMES,
                             (nbp, nbp, nbp, rec_cap, col_cap))
    )
    t_irec = jc._pad_steps(-(-irec_cap // k))
    t_icol = jc._pad_steps(-(-icol_cap // k))
    fresh = renew_tables()

    def step(carry, inp):
        prev, tables_b, last_flat, flat_color = carry
        frames, key, icmeta = inp
        frames = jax.vmap(lambda f: apply_loss_device(f, loss))(frames)
        own_p = ~key

        # ---- P analysis: dense batches vmap (single probe tier, bytes
        # identical — serving._batched_analyze_dense); idle-dominated
        # batches lax.map (real no-change/small branches per stream) ----
        if dense:
            arrs, counts, flat4 = jax.vmap(
                lambda f, pv: jb2.analyze_compact(
                    f, pv, cands, cols, h, w, nby, nbx, rmax, nbp,
                    msr_x, msr_y, low_x, low_y, force_dense=True,
                )
            )(frames, prev)
        else:
            def one_an(fp):
                f, pv = fp
                return jb2.analyze_compact(
                    f, pv, cands, cols, h, w, nby, nbx, rmax, nbp,
                    msr_x, msr_y, low_x, low_y,
                )

            arrs, counts, flat4 = jax.lax.map(one_an, (frames, prev))

        # ---- data-block classification (fixed bcap, cond-gated) ----
        nd_eff = jnp.where(
            own_p & (counts[:, 0] != 0) & (flat4[:, 0] == 0),
            counts[:, 6], 0,
        ).astype(jnp.int32)
        nd_cl = jnp.minimum(nd_eff, bcap)

        def one_cl(args):
            f, pv, rects, nd = args

            def run():
                return classify_assemble(f, pv, rects[:bcap], nd, h, w, bcap)

            shapes = jax.eval_shape(run)
            return jax.lax.cond(
                nd > 0, run,
                lambda: jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes),
            )

        pix_cap_b, lit_cap_b, plc, _col_bm = jax.lax.map(
            one_cl, (frames, prev, arrs["data_rects"], nd_cl))

        active = own_p & (counts[:, 0] != 0) & (flat4[:, 0] == 0)
        n_pix = jnp.where(active, plc[:, 0], 0)
        n_lit = jnp.where(active, plc[:, 1], 0)
        overflow = active & (
            (counts[:, 6] > bcap) | (n_pix > rec_cap) | (n_lit > col_cap)
        )

        nums = {
            "bt": jnp.where(active, counts[:, 3], 0),
            "sxy": jnp.where(active, counts[:, 4], 0),
            "mv": jnp.where(active, counts[:, 5], 0),
            "rec": jnp.where(active & ~overflow, n_pix, 0),
            "col": jnp.where(active & ~overflow, n_lit, 0),
        }
        hdr_vals_b = jnp.stack(
            [counts[:, 1], counts[:, 2], nums["bt"], nums["sxy"], nums["mv"],
             nums["rec"], nums["col"],
             jnp.where(active, counts[:, 6], 0)], axis=1,
        ).astype(jnp.int32)

        # ---- P section encode + raw select + container emit (vmapped) ----
        from screenpressor_tpu.jx.pframe import encode_sections_device

        def one_p(pix, lit, bt, sxy, mv, hv, ov, tables):
            recs_cap = {"bt": bt, "sxy": sxy, "mv": mv,
                        "rec": pix[:rec_cap], "col": lit[:col_cap]}
            ns = {nm: hv[i] for i, nm in zip((2, 3, 4, 5, 6), _SECTION_NAMES)}
            bufs, starts, lens_out, tables2 = encode_sections_device(
                recs_cap, ns, tables, kts_p, batched=True)
            total = jnp.int32(2) + varint_len_device(hv).sum()
            for name, kk, _t in kts_p:
                total = total + section_bytes_device(
                    starts[name], lens_out[name], bufs[name].shape[1], kk)
            head, head_len = _p_head(hv)
            out, out_len = _container_emit(
                head, head_len, bufs, starts, lens_out, kts_p, pack_cap)
            is_raw = ov | (total >= raw_threshold) | (total > pack_cap)
            sel = jax.tree.map(
                lambda a, b: jnp.where(is_raw, a, b), fresh, tables2)
            return out, out_len, is_raw, sel

        p_out, p_len, p_raw, tables_b = jax.vmap(one_p)(
            pix_cap_b, lit_cap_b, arrs["bt"], arrs["sxy"], arrs["mv"],
            hdr_vals_b, overflow, tables_b,
        )

        # ---- compact I path ----
        pad_i, idx_i = icmeta[:, 0].astype(bool), icmeta[:, 1]
        c = idx_i.shape[0]
        frs_i = frames[idx_i]
        flat_i_c = jax.vmap(lambda f: jnp.all(f == f[0, 0]))(frs_i)
        sk_i = pad_i | flat_i_c

        def one_i(frame, sk, tables):
            records, n_rec, lits, n_lit_i = classify_i(frame, h, w)
            iov = (n_rec > irec_cap) | (n_lit_i > icol_cap)
            n_rec_e = jnp.where(sk | iov, 0, n_rec)
            n_lit_e = jnp.where(sk | iov, 0, n_lit_i)
            rec_dealt = jc.deal_device(records[:irec_cap], n_rec_e, k, t_irec)
            lens_rec = jc.lane_lens_device(n_rec_e, k)
            col_dealt = jc.deal_device(lits[:icol_cap], n_lit_e, k, t_icol)
            lens_col = jc.lane_lens_device(n_lit_e, k)
            # lax.map body (not a vmap): the I kernel runs one stream at a
            # time, so batched=False — the per-stream table block is single
            (buf_r, buf_c), (st_r, st_c), tables2 = (
                jc.encode_sections_auto(
                    [rec_dealt, col_dealt], [lens_rec, lens_col], tables,
                    (("rec", k, t_irec), ("col", k, t_icol)),
                    batched=False)
            )
            head, head_len = _i_head(n_rec_e, n_lit_e)
            total = jnp.int32(1) + varint_len_device(
                jnp.stack([n_rec_e, n_lit_e])).sum()
            total = total + section_bytes_device(st_r, lens_rec, buf_r.shape[1], k)
            total = total + section_bytes_device(st_c, lens_col, buf_c.shape[1], k)
            out, out_len = _container_emit(
                head, head_len,
                {"rec": buf_r, "col": buf_c},
                {"rec": st_r, "col": st_c},
                {"rec": lens_rec, "col": lens_col},
                (("rec", k, t_irec), ("col", k, t_icol)), pack_cap)
            is_raw = iov | (total >= raw_threshold) | (total > pack_cap)
            sel = jax.tree.map(
                lambda a, b: jnp.where(is_raw, a, b), fresh, tables2)
            return out, out_len, is_raw, sel

        def one_i_gated(args):
            frame, sk = args

            def run():
                return one_i(frame, sk, fresh)

            shapes = jax.eval_shape(run)
            return jax.lax.cond(
                sk, lambda: jax.tree.map(
                    lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes),
                run,
            )

        # lax.map + cond: steps with no (coded) keyframes skip the whole
        # classify + I-section scan instead of running it for the pad rows
        i_out, i_len, i_raw, tabs_i = jax.lax.map(
            one_i_gated, (frs_i, sk_i))

        # scatter I results into the batch (pads and flat streams dropped)
        idx_drop = jnp.where(pad_i | flat_i_c, s, idx_i)
        tables_b = jax.tree.map(
            lambda b, sm: b.at[idx_drop].set(sm, mode="drop"), tables_b, tabs_i)

        # ---- flat bookkeeping (both paths) ----
        flat_p = own_p & (flat4[:, 0] != 0)
        flat_i_s = jnp.zeros((s,), bool).at[
            jnp.where(pad_i, s, idx_i)
        ].set(flat_i_c, mode="drop")
        flat_all = flat_p | (key & flat_i_s)
        color_p = flat4[:, 1:4].astype(jnp.uint8)
        color_i = jax.vmap(lambda f: f[0, 0])(frs_i)
        color_cur = color_p.at[jnp.where(pad_i, s, idx_i)].set(
            color_i, mode="drop")
        same_flat = last_flat & jnp.all(flat_color == color_cur, axis=1)
        renew_flat = flat_all & ~same_flat
        tables_b = jax.tree.map(
            lambda b, n: jnp.where(
                renew_flat.reshape((-1,) + (1,) * n.ndim), n[None], b),
            tables_b, fresh,
        )
        last_flat = flat_all
        flat_color = jnp.where(flat_all[:, None], color_cur, flat_color)

        # ---- compose per-stream kind / out / len ----
        nochange = own_p & ~flat_p & (counts[:, 0] == 0)
        kind = jnp.where(
            flat_all, K_FLAT,
            jnp.where(key, K_I, jnp.where(nochange, K_NOCHANGE, K_P)),
        ).astype(jnp.int32)
        # raw flags: P raws + scattered I raws
        raw_s = (own_p & ~flat_p & ~nochange & p_raw)
        i_raw_s = jnp.zeros((s,), bool).at[idx_drop].set(i_raw, mode="drop")
        raw_s = raw_s | (key & ~flat_i_s & i_raw_s)
        kind = jnp.where(raw_s, K_RAW, kind)

        out = p_out
        out_len = jnp.where(active & ~raw_s, p_len, 0)
        # scatter coded-I containers
        out = out.at[idx_drop].set(i_out, mode="drop")
        i_len_s = jnp.zeros((s,), jnp.int32).at[idx_drop].set(
            i_len, mode="drop")
        out_len = jnp.where(key & ~flat_i_s & ~raw_s, i_len_s, out_len)
        # small frames: flat (4 B) / no-change (2 B) / raw header (1 B)
        small = jnp.zeros((s, 4), jnp.uint8)
        small = jnp.where(
            flat_all[:, None],
            jnp.concatenate(
                [jnp.full((s, 1), bs.header_byte(ALG_FLAT), jnp.uint8),
                 color_cur], axis=1),
            small)
        small = jnp.where(
            nochange[:, None],
            jnp.asarray([bs.header_byte(ALG_P), 0, 0, 0], jnp.uint8)[None],
            small)
        small = jnp.where(
            raw_s[:, None],
            jnp.asarray([bs.header_byte(ALG_RAW), 0, 0, 0], jnp.uint8)[None],
            small)
        use_small = flat_all | nochange | raw_s
        out = jnp.where(
            use_small[:, None],
            jnp.concatenate(
                [small, jnp.zeros((s, pack_cap - 4), jnp.uint8)], axis=1),
            out)
        out_len = jnp.where(flat_all, 4, out_len)
        out_len = jnp.where(nochange, 2, out_len)
        out_len = jnp.where(raw_s, 1, out_len)

        carry = (frames, tables_b, last_flat, flat_color)
        return carry, (out, out_len, kind)

    carry, (outs, lens, kinds) = jax.lax.scan(
        step, (prev, tables_b, last_flat, flat_color),
        (frames_fs, key_fs, icmeta_fs),
    )
    return carry, outs, lens, kinds


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


class WindowConfig:
    """Static capacities of the window program (shape-only; overflow falls
    back to the raw escape, never corrupts)."""

    def __init__(self, cfg, n_streams: int, f: int = 8, c: int = 2,
                 rec_cap: int = 8192, col_cap: int = 8192,
                 irec_cap: int = 32768, icol_cap: int = 16384,
                 bcap: int = 512, pack_cap: int = 65536):
        self.f, self.c = f, c
        self.rec_cap, self.col_cap = rec_cap, col_cap
        self.irec_cap = min(irec_cap, next_pow2(cfg.width * cfg.height))
        self.icol_cap = min(icol_cap, next_pow2(cfg.width * cfg.height))
        self.bcap = min(bcap, next_pow2(cfg.nbx * cfg.nby))
        self.pack_cap = pack_cap
        # _varint_emit encodes at most 4 LEB128 bytes per header field;
        # every header field is bounded by the pixel count, so guard the
        # bound here where the frame dimensions are statically known
        # (host-side bs.pack_varint handles 5 bytes, the device emitter
        # does not).
        assert cfg.width * cfg.height < 1 << 28, (
            "window programs require frame fields < 2^28 (device varint "
            "emitter is 4-byte LEB128)"
        )


def encode_window(enc, frames_list, wcfg: WindowConfig):
    """Run one window of len(frames_list) steps through a BatchedEncoder's
    device state. Caller must ensure: enc.prev is set, no step force-keys
    all streams, and each step keyframes at most wcfg.c streams (use
    plan_windows). Returns a list of per-step encode() result lists."""
    return encode_window_finish(encode_window_begin(enc, frames_list, wcfg))


def encode_window_begin(enc, frames_list, wcfg: WindowConfig):
    """Dispatch a window's device work and commit the encoder's device state
    WITHOUT any tunnel pull; returns a handle for encode_window_finish.
    The next window's begin may be issued before this one's finish — the
    chip then never idles on the host's pulls/assembly (window-level
    cross-batch pipelining)."""
    from screenpressor_tpu.jx.pframe import _cands_rmax

    cfg = enc.cfg
    s, h, w = enc.s, cfg.height, cfg.width
    f = len(frames_list)
    assert enc.prev is not None
    key_fs = np.zeros((f, s), bool)
    icmeta = np.zeros((f, wcfg.c, 2), np.int32)
    icmeta[:, :, 0] = 1  # all pads by default
    for t in range(f):
        fn = enc.fn + t
        if cfg.kf_interval > 0:
            key_fs[t] = ((fn + enc.kf_offsets) % cfg.kf_interval) == 0
        kidx = np.nonzero(key_fs[t])[0]
        assert len(kidx) <= wcfg.c, "keyframe schedule exceeds window slots"
        icmeta[t, : len(kidx), 0] = 0
        icmeta[t, : len(kidx), 1] = kidx
        icmeta[t, len(kidx):, 1] = kidx[0] if len(kidx) else 0
    enc.fn += f

    frames_fs = jnp.stack([jnp.asarray(b) for b in frames_list])
    cands, cols, rmax, lows = _cands_rmax(cfg)
    nbp = next_pow2(cfg.nbx * cfg.nby)
    (prev, tables_b, last_flat, flat_color), outs, lens, kinds = (
        encode_window_scan(
            frames_fs, jnp.asarray(key_fs), jnp.asarray(icmeta),
            enc.prev, enc.tables_b,
            jnp.asarray(enc.last_flat), jnp.asarray(enc.flat_color),
            cands, cols,
            h, w, cfg.nby, cfg.nbx, rmax, nbp, cfg.msr_x, cfg.msr_y,
            lows[0], lows[1], cfg.k_fixed, wcfg.bcap, wcfg.rec_cap,
            wcfg.col_cap, wcfg.irec_cap, wcfg.icol_cap, wcfg.pack_cap,
            cfg.loss,
            # same sticky heuristic as the sequential path: busy batches use
            # the vmapped single-tier analysis (bytes identical either way)
            getattr(enc, "_last_active", 0) >= _DENSE_MIN,
        )
    )
    enc.prev = prev
    enc.tables_b = tables_b
    enc.last_flat = np.array(last_flat)
    enc.flat_color = np.array(flat_color)
    for a in (lens, kinds):
        try:
            a.copy_to_host_async()
        except Exception:
            pass
    return enc, wcfg, frames_fs, outs, lens, kinds, f


def encode_window_finish(handle):
    """Pull a begun window's results and assemble the containers."""
    enc, wcfg, frames_fs, outs, lens, kinds, f = handle
    cfg = enc.cfg
    s = enc.s

    # ---- pull 1: the [F, S] length/kind matrices ----
    lens_h, kinds_h = jax.device_get((lens, kinds))
    enc._last_active = int((kinds_h[-1] == K_P).sum() + (kinds_h[-1] == K_RAW).sum())
    # ---- pull 2: one tight gather of exactly the used container bytes ----
    from screenpressor_tpu.jx.transfer import gather_segments, pow2_bucket

    pc = wcfg.pack_cap
    src = (np.arange(f * s, dtype=np.int64) * pc).reshape(f, s)
    seg_len = lens_h.astype(np.int64).reshape(-1)
    dst = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
    total = int(seg_len.sum())
    segs = np.stack([src.reshape(-1), dst, seg_len], axis=1).astype(np.int32)
    scap = pow2_bucket(max(len(segs), 1))
    segs_p = np.zeros((scap, 3), np.int32)
    segs_p[: len(segs)] = segs
    tight = np.asarray(
        gather_segments(outs.reshape(-1), jnp.asarray(segs_p),
                        pow2_bucket(max(total, 1)))
    )[:total]

    results = []
    pos_of = dst.reshape(f, s)
    for t in range(f):
        out_t = []
        for i in range(s):
            kd = int(kinds_h[t, i])
            data = tight[pos_of[t, i]: pos_of[t, i] + lens_h[t, i]].tobytes()
            if kd == K_RAW:
                # rare: body pulled from the (lossy) input frame
                fr = np.asarray(frames_fs[t, i])
                if cfg.loss:
                    from screenpressor_tpu.spec.codec import apply_loss

                    fr = apply_loss(fr, cfg.loss)
                data = data + fr.tobytes()
            ftype = FTYPE_P if kd in (K_NOCHANGE, K_P) else FTYPE_I
            out_t.append((data, ftype))
        results.append(out_t)
    return results


def plan_windows(enc, n_steps: int, wcfg: WindowConfig):
    """Split the next n_steps into runs eligible for encode_window (>= 2
    steps, every step keyframing <= c streams, prev exists) and single
    fallback steps. Returns a list of ('window', length) / ('step', 1)."""
    cfg = enc.cfg
    fn0 = enc.fn
    have_prev = enc.prev is not None

    def keys_at(f):
        if f == 0:
            return enc.s  # session start keyframes every stream
        if cfg.kf_interval > 0:
            return int((((f + enc.kf_offsets) % cfg.kf_interval) == 0).sum())
        return 0

    eligible = [
        (have_prev or i > 0) and keys_at(fn0 + i) <= wcfg.c
        for i in range(n_steps)
    ]
    plan = []
    t = 0
    while t < n_steps:
        run = 0
        while t + run < n_steps and run < wcfg.f and eligible[t + run]:
            run += 1
        if run >= 2:
            plan.append(("window", run))
            t += run
        else:
            plan.append(("step", 1))
            t += 1
    return plan


def serve_windowed(enc, batches, dec=None, wcfg: WindowConfig | None = None,
                   device_out: bool = True):
    """Window-scan serving driver: like serve_pipelined but amortizing the
    per-step pulls over F-step windows on BOTH sides (encode_window +
    decode_window). Yields (outs, decoded) per step."""
    if wcfg is None:
        wcfg = WindowConfig(enc.cfg, enc.s)
    batches = list(batches)
    plan = plan_windows(enc, len(batches), wcfg)
    t = 0
    pend = None  # a begun-but-unfinished window (device work in flight)

    def emit_window(handle):
        steps = encode_window_finish(handle)
        if dec is None:
            return [(outs, None) for outs in steps]
        frames_fs = decode_window(dec, [[p for p, _ in outs] for outs in steps])
        return [(outs, frames_fs[j]) for j, outs in enumerate(steps)]

    for kind, ln in plan:
        if kind == "window":
            # dispatch this window BEFORE pulling the previous one: its
            # device compute then overlaps the host's pulls/parse/assembly
            handle = encode_window_begin(enc, batches[t: t + ln], wcfg)
            if pend is not None:
                yield from emit_window(pend)
            pend = handle
        else:
            if pend is not None:
                yield from emit_window(pend)
                pend = None
            outs = enc.encode(batches[t])
            decoded = (None if dec is None else
                       dec.decode([p for p, _ in outs], device_out=device_out))
            yield outs, decoded
        t += ln
    if pend is not None:
        yield from emit_window(pend)


# ---------------------------------------------------------------------------
# Decode window: F decode steps in one scan (mirror of encode_window_scan)
# ---------------------------------------------------------------------------


@functools.partial(
    _kernel_jit,
    static_argnames=("h", "w", "nbx", "nby", "k", "kts", "caps", "lls",
                     "mcap", "bcap", "t_irec", "t_icol", "lr", "lc"),
    # prev is NOT donated: decode(device_out=True) hands the same array to
    # the caller as its decoded frames
    donate_argnums=(9, 10, 11),
)
def decode_window_scan(pay_fs, pmeta_fs, ipay_fs, imeta_fs, kinds_fs,
                       colors_fs, rvals, rmeta, prev, tables_b, last_flat,
                       flat_color, h, w, nbx, nby, k, kts, caps, lls,
                       mcap, bcap, t_irec, t_icol, lr, lc):
    """pay_fs: [F, S, sum(k*ll)] flattened P section payloads; pmeta_fs
    [F, S, 8]; ipay_fs [F, C, k*(lr+lc)]; imeta_fs [F, C, 4] (n_rec, n_lit,
    pad, idx); kinds/colors as pulled from the encoder; rvals/rmeta: raw
    override frames + their (step, stream) coords. Carry mirrors
    BatchedDecoder state. Returns carry', frames [F, S, H, W, 3], err [F, S].
    """
    from screenpressor_tpu.parallel.serving import (
        _batched_decode_i_compact,
        _batched_decode_p,
    )

    s = prev.shape[0]
    fresh = renew_tables()

    def step(carry, inp):
        prev, tables_b, last_flat, flat_color = carry
        pay_t, pmeta, ipay, imeta, kind, color, t = inp
        is_flat = kind == K_FLAT
        is_raw = kind == K_RAW
        same = last_flat & jnp.all(flat_color == color, axis=1)
        renew = (is_flat & ~same) | is_raw
        tables_b = jax.tree.map(
            lambda b, n: jnp.where(
                renew.reshape((-1,) + (1,) * n.ndim), n[None], b),
            tables_b, fresh,
        )
        last_flat = is_flat
        flat_color = jnp.where(is_flat[:, None], color, flat_color)

        # coded P rows (skip rows carry xx2 = -1 and all-zero counts)
        p_frames, err_p, tables_b = _batched_decode_p(
            pay_t, pmeta, prev, tables_b, h, w, nbx, nby, kts, caps, lls,
            mcap, bcap,
        )
        # compact coded-I rows (decode from fresh tables, scatter back)
        base, err_i, tables_b = _batched_decode_i_compact(
            ipay, imeta, prev, tables_b, h, w, k, t_irec, t_icol, lr, lc,
        )
        p_mask = kind == K_P
        frames = jnp.where(p_mask[:, None, None, None], p_frames, base)
        frames = jnp.where(
            is_flat[:, None, None, None],
            jnp.broadcast_to(color[:, None, None, :], frames.shape),
            frames,
        )
        ridx = jnp.where(rmeta[:, 0] == t, rmeta[:, 1], s)
        frames = frames.at[ridx].set(rvals, mode="drop")
        err = (err_p * p_mask.astype(jnp.int32)
               + err_i * (kind == K_I).astype(jnp.int32))
        return (frames, tables_b, last_flat, flat_color), (frames, err)

    f = kinds_fs.shape[0]
    carry, (frames_fs, err_fs) = jax.lax.scan(
        step, (prev, tables_b, last_flat, flat_color),
        (pay_fs, pmeta_fs, ipay_fs, imeta_fs, kinds_fs, colors_fs,
         jnp.arange(f, dtype=jnp.int32)),
    )
    return carry, frames_fs, err_fs


def decode_window(dec, payload_lists):
    """Decode F steps of S payloads each through a BatchedDecoder's device
    state with ONE device program (plus uploads). Returns device-resident
    frames [F, S, H, W, 3]; error checks are deferred exactly like
    decode(device_out=True) — resolved by the next decode()/validate().
    """
    from screenpressor_tpu.jx.iframe import parse_i_header
    from screenpressor_tpu.jx.pframe import _SECTION_NAMES, parse_p_header

    cfg = dec.cfg
    s, h, w = dec.s, cfg.height, cfg.width
    k = cfg.k_fixed
    f = len(payload_lists)
    dec.validate()

    kinds = np.zeros((f, s), np.int32)
    colors = np.zeros((f, s, 3), np.uint8)
    pmeta = np.zeros((f, s, 8), np.int32)
    pmeta[:, :, 6] = -1  # skip rows: empty xx range
    p_parse = {}
    i_parse = {}
    raws = []
    for t, payloads in enumerate(payload_lists):
        assert len(payloads) == s
        for i, data in enumerate(payloads):
            if not data:
                raise bs.CorruptStreamError(f"step {t} stream {i}: empty frame")
            alg = bs.parse_header_byte(data[0])
            if alg == ALG_FLAT:
                if len(data) < 4:
                    raise bs.CorruptStreamError(
                        f"step {t} stream {i}: truncated flat")
                kinds[t, i] = K_FLAT
                colors[t, i] = np.frombuffer(data[1:4], np.uint8)
            elif alg == ALG_RAW:
                npix = h * w * 3
                if len(data) < 1 + npix:
                    raise bs.CorruptStreamError(
                        f"step {t} stream {i}: truncated raw")
                kinds[t, i] = K_RAW
                raws.append(
                    (t, i, np.frombuffer(data, np.uint8, npix, 1)
                     .reshape(h, w, 3)))
            elif alg == ALG_I:
                kinds[t, i] = K_I
                i_parse[(t, i)] = parse_i_header(data, 1, cfg)
            elif alg == ALG_P:
                if dec.prev is None and t == 0:
                    raise bs.CorruptStreamError(
                        f"step {t} stream {i}: P-frame before keyframe")
                parsed = parse_p_header(data, 1, cfg)
                if parsed is None:
                    kinds[t, i] = K_NOCHANGE
                else:
                    kinds[t, i] = K_P
                    p_parse[(t, i)] = parsed
            else:
                raise bs.CorruptStreamError(
                    f"step {t} stream {i}: unknown algorithm {alg}")

    # ---- window buckets (shape-only; recompile when they grow) ----
    maxn = {name: 1 for name in _SECTION_NAMES}
    maxl = {name: 4 for name in _SECTION_NAMES}
    max_mv = max_data = 1
    for pl, ns, _kts, _caps, (xx1, xx2, n_mv, n_data) in p_parse.values():
        for name in _SECTION_NAMES:
            maxn[name] = max(maxn[name], int(ns[name]))
            maxl[name] = max(maxl[name], pl[name].shape[1])
        max_mv, max_data = max(max_mv, n_mv), max(max_data, n_data)
    kts = tuple((name, k, jc._pad_steps(-(-maxn[name] // k)))
                for name in _SECTION_NAMES)
    caps = tuple(next_pow2(maxn[name]) for name in _SECTION_NAMES)
    lls = tuple(next_pow2(maxl[name]) for name in _SECTION_NAMES)
    mcap, bcap = next_pow2(max_mv), next_pow2(max_data)

    pay = {name: np.zeros((f, s, k, ll), np.uint8)
           for name, ll in zip(_SECTION_NAMES, lls)}
    for (t, i), (pl, ns, _k, _c, (xx1, xx2, n_mv, n_data)) in p_parse.items():
        for j, name in enumerate(_SECTION_NAMES):
            a = np.asarray(pl[name])
            pay[name][t, i, :, : a.shape[1]] = a
            pmeta[t, i, j] = int(ns[name])
        pmeta[t, i, 5], pmeta[t, i, 6], pmeta[t, i, 7] = xx1, xx2, n_data
    pay_fs = np.concatenate(
        [pay[name].reshape(f, s, -1) for name in _SECTION_NAMES], axis=2)

    # ---- compact I slots ----
    c = 1
    per_step = [sum(1 for (t, i) in i_parse if t == tt) for tt in range(f)]
    c = next_pow2(max([1] + per_step))
    ipay = np.zeros((f, c, 0), np.uint8)
    imeta = np.zeros((f, c, 4), np.int32)
    imeta[:, :, 2] = 1  # pads
    t_irec = t_icol = 1
    lr = lc = 4
    for x in i_parse.values():
        t_irec = max(t_irec, jc._pad_steps(-(-max(x[2], 1) // k)))
        t_icol = max(t_icol, jc._pad_steps(-(-max(x[3], 1) // k)))
        lr = max(lr, x[0].shape[1])
        lc = max(lc, x[1].shape[1])
    lr, lc = next_pow2(lr), next_pow2(lc)
    ipay = np.zeros((f, c, k * (lr + lc)), np.uint8)
    slot = [0] * f
    for (t, i), x in sorted(i_parse.items()):
        j = slot[t]
        slot[t] += 1
        pr = np.zeros((k, lr), np.uint8)
        pc = np.zeros((k, lc), np.uint8)
        pr[:, : x[0].shape[1]] = np.asarray(x[0])
        pc[:, : x[1].shape[1]] = np.asarray(x[1])
        ipay[t, j] = np.concatenate([pr.reshape(-1), pc.reshape(-1)])
        imeta[t, j] = (x[2], x[3], 0, i)

    # ---- raw overrides ----
    r = next_pow2(max(1, len(raws)))
    rvals = np.zeros((r, h, w, 3), np.uint8)
    rmeta = np.full((r, 2), -1, np.int32)
    for j, (t, i, fr) in enumerate(raws):
        rvals[j] = fr
        rmeta[j] = (t, i)

    if dec.prev is None:
        dec.prev = dec._dput(jnp.zeros((s, h, w, 3), jnp.uint8))
    (prev, tables_b, last_flat, flat_color), frames_fs, err_fs = (
        decode_window_scan(
            dec._dput(jnp.asarray(pay_fs)), dec._dput(jnp.asarray(pmeta)),
            dec._dput(jnp.asarray(ipay)), dec._dput(jnp.asarray(imeta)),
            jnp.asarray(kinds), jnp.asarray(colors),
            dec._dput(jnp.asarray(rvals)), jnp.asarray(rmeta),
            dec.prev, dec.tables_b,
            jnp.asarray(dec.last_flat), jnp.asarray(dec.flat_color),
            h, w, cfg.nbx, cfg.nby, k, kts, caps, lls, mcap, bcap,
            t_irec, t_icol, lr, lc,
        )
    )
    dec.prev = prev
    dec.tables_b = tables_b
    dec.last_flat = np.array(last_flat)
    dec.flat_color = np.array(flat_color)
    try:
        err_fs.copy_to_host_async()
    except Exception:
        pass
    dec._pending_err = (err_fs, (kinds == K_P).any(axis=0))
    return frames_fs
