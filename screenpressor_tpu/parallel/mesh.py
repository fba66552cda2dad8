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
