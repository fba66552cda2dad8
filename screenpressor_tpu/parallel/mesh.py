"""Multi-stream serving and multi-chip sharding.

The codec has no algorithmic cross-stream coupling (SURVEY.md §2 "Parallelism
strategies"), so scale-out is: vmap over streams on one chip (the 64-stream
conferencing config), and a `Mesh` with
 - `dp` axis: independent streams sharded across chips,
 - `sp` axis: frame rows sharded *within* a stream for the analysis pass,
   with a one-row halo exchanged over ICI via `ppermute` (the above-row
   dependency of the predictors), flat-check and change-count reductions via
   `psum`, and an `all_gather` to reassemble rows for the per-stream
   model/entropy stage.

This replaces the reference's thread-pool row bands + work stealing
(`squad.cpp`, `screencap.cpp:939-971`) with SPMD collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from screenpressor_tpu.config import BLOCK, NUM_PTYPES, PROB_SCALE, RANS_L, STEP


def make_mesh(n_devices: int, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    assert n_devices % sp == 0
    dev = np.asarray(devices).reshape(n_devices // sp, sp)
    return Mesh(dev, ("dp", "sp"))


def _halo_fits(shard, halo_row, w):
    """fits planes for a row shard given the last row of the shard above.
    shard: [rows, w, 3] int32; halo_row: [w, 3] (zeros for the top shard)."""
    rows = shard.shape[0]
    ext = jnp.concatenate([halo_row[None], shard], axis=0)  # [rows+1, w, 3]
    cur = ext[1:]
    above = ext[:-1]
    # raster-wrap: left(y,0) = aboveleft(y,0) = pix(y-1, W-1) (FORMAT.md)
    aboveleft = jnp.concatenate([above[:, -1:], above[:, :-1]], axis=1)
    left = jnp.concatenate([above[:, -1:], cur[:, :-1]], axis=1)
    eq = lambda a, b: jnp.all(a == b, axis=-1)
    f = jnp.stack(
        [
            eq(cur, left),
            eq(cur, left),
            eq(cur, above),
            jnp.zeros((rows, w), bool),
            eq(cur, left + above - aboveleft),
            eq(cur, aboveleft),
        ],
        axis=-1,
    )
    return f


def sharded_analysis_step(frames, prevs, mesh: Mesh, loss: int = 0):
    """One fully-sharded analysis step over a batch of streams.

    frames/prevs: [S, H, W, 3] uint8 with S divisible by the dp axis and H
    divisible by the sp axis. Returns (fits [S, H, W, 6], changed_blocks [S],
    flat [S]) computed with ICI collectives only.
    """
    s, h, w, _ = frames.shape

    def step(fr, pv):
        # shapes inside: [S/dp, H/sp, W, 3]
        fr = fr.astype(jnp.int32)
        pv = pv.astype(jnp.int32)
        if loss > 0:
            mask = 0xFF & ~((1 << loss) - 1)
            corr = (1 << loss) >> 1
            fr = (fr & mask) | corr

        # halo: last row of the shard above, over ICI
        sp_n = jax.lax.axis_size("sp")
        idx = jax.lax.axis_index("sp")
        last_row = fr[:, -1]
        halo = jax.lax.ppermute(
            last_row, "sp", [(i, i + 1) for i in range(sp_n - 1)]
        )
        halo = jnp.where((idx == 0), 0, halo)

        fits = jax.vmap(lambda sh, hr: _halo_fits(sh, hr, w))(fr, halo)
        # global row 0 has no above row: types 2/4/5 can never fit, and the
        # left/literal predicate only holds from pixel 1 on
        row0 = jnp.zeros_like(fits[:, :1])
        row0 = row0.at[:, 0, 1:, 0].set(fits[:, 0, 1:, 0])
        row0 = row0.at[:, 0, 1:, 1].set(fits[:, 0, 1:, 1])
        fits = jnp.where(idx == 0, jnp.concatenate([row0, fits[:, 1:]], axis=1), fits)

        # change map: per-shard block-row diffs, reduced over sp
        diff = jnp.any(fr != pv, axis=-1)
        changed_rows = diff.any(axis=2).any(axis=1)  # [S/dp] any change in shard
        changed = jax.lax.psum(changed_rows.astype(jnp.int32), "sp")

        # flat check: every pixel equals the stream's first pixel (broadcast
        # the top shard's first pixel over sp)
        first_pix = fr[:, 0, 0]
        first_pix = jax.lax.all_gather(first_pix, "sp")[0]
        flat_local = jnp.all(fr == first_pix[:, None, None, :], axis=(1, 2, 3))
        flat = jax.lax.psum(flat_local.astype(jnp.int32), "sp") == sp_n

        # reassemble rows so each dp shard holds its streams' full planes
        fits_full = jax.lax.all_gather(fits, "sp", axis=1, tiled=True)
        return fits_full, changed, flat

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("dp", "sp"), P("dp", "sp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    return jax.jit(fn)(frames, prevs)


# ---------------------------------------------------------------------------
# Fully-device single-stream encode step (fixed capacity, no host syncs) —
# used by the multi-chip dryrun and as the serving inner loop.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("h", "w", "k"))
def device_encode_step(frame, tables, h: int, w: int, k: int):
    """Capacity-shaped I-frame modeling + rANS pack entirely on device.

    Returns (payload [k, cap] uint8, lane starts [k], n_records, tables').
    """
    from screenpressor_tpu.jx import coder as jc
    from screenpressor_tpu.jx.classify import classify_i

    n = h * w
    assert n % k == 0, "capacity dealing expects k | h*w"
    records, n_records, lits, n_literals = classify_i(frame, h, w)
    t_cap = n // k
    # capacity dealing (record g -> lane g // t_cap, step g % t_cap): a
    # fixed-shape variant of the lane policy used when no host sync is
    # allowed; the matching decoder mirrors the same dealing
    lane = jnp.arange(n) // max(t_cap, 1)
    step_i = jnp.arange(n) % max(t_cap, 1)
    recs = jnp.zeros((t_cap, k, 2), jnp.int32)
    recs = recs.at[step_i, jnp.minimum(lane, k - 1)].set(records)
    lane_len = jnp.clip(n_records - jnp.arange(k) * t_cap, 0, t_cap)
    cum, freq, act, tables = jc.model_scan(recs, lane_len, tables, "rec", k, t_cap)
    buf, start = jc.rans_pack(cum, freq, act, 2 * t_cap * 2 + 8)
    return buf, start, n_records, tables


# ---------------------------------------------------------------------------
# Row/lane-sharded (sp) encode of ONE large stream — the real production
# I-frame pipeline split across the mesh's sp axis (VERDICT r3 missing #1).
#
# Reference precedent: the encoder's row-band fan-out (`squad.cpp:16-31`,
# CMD_CLASSIFYPIXELSI `screencap.cpp:876-919`). Here:
#  - classification shards by ROWS: fits planes need a one-row halo
#    (ppermute over ICI); runs break at SEG_TILE boundaries, so a shard
#    whose pixel range starts on a tile boundary emits exactly the global
#    records of its range — no cross-shard run stitching.
#  - the section encode shards by LANES: each shard scans its lane group,
#    and the shared adaptive tables stay REPLICATED by applying every
#    substep's full-K update on every shard (an all_gather of the lanes'
#    (row, sym, active) triples — a few KB per substep over ICI). This is
#    byte-exact by construction: the single-device model_scan applies the
#    same full-K batched update (jx/coder.py:395-418).
#  - the reverse rANS pack is lane-local (zero collectives).
# ---------------------------------------------------------------------------


def _classify_sharded(frame, mesh: Mesh, h: int, w: int):
    """Row-sharded I classification: frame [H, W, 3] -> per-shard compact
    (records [n, 2], counts [sp], lits [n, 3], lit_counts [sp]); shard i's
    valid rows sit at offset i * (n // sp)."""
    from screenpressor_tpu.jx.classify import classify_from_fits

    def body(fr):
        sp_n = jax.lax.axis_size("sp")
        idx = jax.lax.axis_index("sp")
        fr_i = fr.astype(jnp.int32)
        halo = jax.lax.ppermute(
            fr_i[-1], "sp", [(i, i + 1) for i in range(sp_n - 1)]
        )
        halo = jnp.where(idx == 0, 0, halo)
        fits = _halo_fits(fr_i, halo, w)  # [rows, w, 6]
        # global row 0 (shard 0 only): no above row; left/literal from x>=1
        row0 = jnp.zeros_like(fits[:1])
        row0 = row0.at[0, 1:, 0].set(fits[0, 1:, 0])
        row0 = row0.at[0, 1:, 1].set(fits[0, 1:, 1])
        fits = jnp.where(
            idx == 0, jnp.concatenate([row0, fits[1:]], axis=0), fits
        )
        recs, n_rec, lits, n_lit = classify_from_fits(
            fits.reshape(-1, 6), fr.reshape(-1, 3)
        )
        return recs, n_rec[None], lits, n_lit[None]

    fn = shard_map(
        body, mesh=mesh, in_specs=(P("sp"),),
        out_specs=(P("sp"), P("sp"), P("sp"), P("sp")),
        check_vma=False,
    )
    return jax.jit(fn)(frame)


def _scan_pack_sp(recs, lens, tables, codec_name: str, t_steps: int):
    """Lane-group model scan + rANS pack inside shard_map: recs [T, K_loc, W],
    lens [K_loc]; tables replicated (full-K update via all_gather)."""
    from screenpressor_tpu.config import kind_gstep, kind_step
    from screenpressor_tpu.jx import coder as jc
    from screenpressor_tpu.jx.tables import effective_rows, update_batch

    codec = jc.CODECS[codec_name]
    k_loc = recs.shape[1]
    state0 = codec.init_state(jnp.zeros((k_loc,), jnp.int32))

    def step(carry, inp):
        state, tables = carry
        rec, t = inp
        rec_l = [rec[:, j] for j in range(codec.rec_width)]
        lane_active = t < lens
        cums, freqs, acts = [], [], []
        for j, kind in enumerate(codec.kinds):
            row, sym, extra = codec.enc_syms(j, rec_l, state)
            active = lane_active if extra is None else (lane_active & extra)
            row = jnp.clip(row, 0, tables[kind]["cnt"].shape[0] - 1)
            symc = jnp.clip(sym, 0, tables[kind]["cnt"].shape[1] - 1)
            freq_rows = effective_rows(tables[kind], row)
            cum_rows = jnp.cumsum(freq_rows, axis=1) - freq_rows
            cum = jnp.take_along_axis(cum_rows, symc[:, None], axis=1)[:, 0]
            freq = jnp.take_along_axis(freq_rows, symc[:, None], axis=1)[:, 0]
            cums.append(cum)
            freqs.append(freq)
            acts.append(active)
            # shared-table semantics: every shard applies the FULL batched
            # update (lane order preserved: contiguous lane groups, tiled
            # all_gather) — tables stay bit-identical replicas
            row_all = jax.lax.all_gather(row, "sp", tiled=True)
            sym_all = jax.lax.all_gather(symc, "sp", tiled=True)
            act_all = jax.lax.all_gather(active, "sp", tiled=True)
            tables = dict(tables)
            tables[kind] = update_batch(
                tables[kind], row_all, sym_all, act_all,
                kind_step(kind), kind_gstep(kind),
            )
        state = codec.enc_next_state(rec_l, state, lane_active)
        return (state, tables), (
            jnp.stack(cums, 1), jnp.stack(freqs, 1), jnp.stack(acts, 1)
        )

    (state, tables), (cum, freq, act) = jax.lax.scan(
        step, (state0, tables), (recs, jnp.arange(t_steps, dtype=jnp.int32))
    )
    nsub = len(codec.kinds)
    buf, start = jc.rans_pack(cum, freq, act, 2 * t_steps * nsub + 8)
    return buf, start, tables


def _sections_sharded(dealt_rec, lens_rec, dealt_col, lens_col, tables,
                      mesh: Mesh, t_rec: int, t_col: int):
    def body(dr, lr, dc, lc, tabs):
        buf_r, start_r, tabs = _scan_pack_sp(dr, lr, tabs, "rec", t_rec)
        buf_c, start_c, tabs = _scan_pack_sp(dc, lc, tabs, "col", t_col)
        return buf_r, start_r, buf_c, start_c, tabs

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "sp"), P("sp"), P(None, "sp"), P("sp"), P()),
        out_specs=(P("sp"), P("sp"), P("sp"), P("sp"), P()),
        check_vma=False,
    )
    return jax.jit(fn)(dealt_rec, lens_rec, dealt_col, lens_col, tables)


def encode_i_sp(frame, mesh: Mesh, cfg, tables=None):
    """Full sp-sharded I-frame encode of one stream: row-sharded
    classification + lane-sharded section encode with replicated tables.
    Byte-identical to `Encoder(cfg, backend="jax")`'s keyframe output.

    Returns (payload bytes, ftype, tables'). Requires h % sp == 0 and
    (h // sp) * w % SEG_TILE == 0 (shard seams on run-break boundaries).

    Single-keyframe helper: the flat shortcut below returns `tables`
    unchanged, while a stateful Encoder renews tables when a flat frame's
    color differs from the previous flat frame (RenewI on flat-color
    transition). Callers chaining the returned tables across frames must
    handle flat transitions themselves (see Encoder.last_flat_color);
    chaining through repeated encode_i_sp calls across a flat-color change
    would diverge from the session backends' table state.
    """
    from screenpressor_tpu import bitstream as bs
    from screenpressor_tpu.config import (
        ALG_FLAT, ALG_I, ALG_RAW, SEG_TILE, pad_cap,
    )
    from screenpressor_tpu.jx import coder as jc
    from screenpressor_tpu.jx.tables import renew_tables_cached
    from screenpressor_tpu.spec.codec import FTYPE_I

    h, w = cfg.height, cfg.width
    sp = mesh.shape["sp"]
    assert h % sp == 0, "sp must divide frame rows"
    n_loc = (h // sp) * w
    assert n_loc % SEG_TILE == 0, "shard seams must land on SEG_TILE boundaries"
    frame = jnp.asarray(frame)

    # flat shortcut (reference IsFlat): one solid color -> 4-byte frame
    flat, c0 = jax.jit(lambda f: (jnp.all(f == f[0, 0]), f[0, 0]))(frame)
    if bool(flat):
        return (bytes([bs.header_byte(ALG_FLAT), *np.asarray(c0).tolist()]),
                FTYPE_I, tables)

    recs_st, cnt_rec, lits_st, cnt_lit = _classify_sharded(frame, mesh, h, w)
    cnt_rec, cnt_lit = np.asarray(cnt_rec), np.asarray(cnt_lit)
    n_rec, n_lit = int(cnt_rec.sum()), int(cnt_lit.sum())

    # compact the per-shard record chunks into global record order (host
    # index build + one device take; offsets are shard * n_loc)
    def compact(stacked, counts, cap):
        idx = np.concatenate(
            [np.arange(i * n_loc, i * n_loc + int(c), dtype=np.int64)
             for i, c in enumerate(counts)]
        ) if counts.sum() else np.zeros((0,), np.int64)
        pad = np.zeros(cap - len(idx), np.int64)
        return stacked[jnp.asarray(np.concatenate([idx, pad]))]

    records_g = compact(recs_st, cnt_rec, pad_cap(max(n_rec, 1)))
    lits_g = compact(lits_st, cnt_lit, pad_cap(max(n_lit, 1)))

    k = cfg.lanes(n_rec)
    k_col = cfg.lanes(n_lit)
    assert k % sp == 0 and k_col % sp == 0, "lane count must split over sp"
    t_rec = jc._pad_steps(-(-n_rec // k)) if n_rec else 1
    t_col = jc._pad_steps(-(-n_lit // k_col)) if n_lit else 1
    dealt_rec = jc.deal_device(records_g, jnp.int32(n_rec), k, t_rec)
    dealt_col = jc.deal_device(lits_g, jnp.int32(n_lit), k_col, t_col)
    lens_rec = jnp.asarray(jc.lane_lengths(n_rec, k))
    lens_col = jnp.asarray(jc.lane_lengths(n_lit, k_col))

    tables = renew_tables_cached()  # RenewI: every coded I resets models
    buf_r, start_r, buf_c, start_c, tables = _sections_sharded(
        dealt_rec, lens_rec, dealt_col, lens_col, tables, mesh, t_rec, t_col
    )

    buf_r, start_r = np.asarray(buf_r), np.asarray(start_r)
    buf_c, start_c = np.asarray(buf_c), np.asarray(start_c)
    lr_h, lc_h = np.asarray(lens_rec), np.asarray(lens_col)
    blobs_r = [bytes(buf_r[i, start_r[i]:]) if lr_h[i] > 0 else b""
               for i in range(k)]
    blobs_c = [bytes(buf_c[i, start_c[i]:]) if lc_h[i] > 0 else b""
               for i in range(k_col)]
    data = b"".join([
        bytes([bs.header_byte(ALG_I)]),
        bs.pack_varint(n_rec, n_lit),
        bs.pack_section(blobs_r),
        bs.pack_section(blobs_c),
    ])
    raw_size = 1 + w * h * 3
    if len(data) >= raw_size:
        data = bytes([bs.header_byte(ALG_RAW)]) + np.asarray(frame).tobytes()
        tables = renew_tables_cached()
    return data, FTYPE_I, tables


def dryrun_step(frames, prevs, tables_batch, mesh: Mesh):
    """Full multi-chip step: sharded analysis + per-stream device encode.

    frames: [S, H, W, 3] uint8; tables_batch: table pytree with a leading
    stream axis. Streams are dp-sharded; rows sp-sharded for analysis.
    """
    s, h, w, _ = frames.shape
    fits, changed, flat = sharded_analysis_step(frames, prevs, mesh)

    def per_stream(frame, tables):
        buf, start, n_rec, tables = device_encode_step(frame, tables, h, w, 8)
        return buf, start, n_rec, tables

    def shard_fn(fr, tb):
        return jax.vmap(per_stream)(fr, tb)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    buf, start, n_rec, tables_batch = jax.jit(fn)(frames, tables_batch)
    return (fits, changed, flat), (buf, start, n_rec), tables_batch
