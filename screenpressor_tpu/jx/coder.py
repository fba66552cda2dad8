"""K-lane BSAC section coder — JAX implementation.

Decode: one `lax.scan` over T steps; each step resolves one record per lane
(table-row gathers, interval search, rANS advance, batched table update).
Encode: a forward modeling scan collecting (cum, freq) intervals, then a
reverse scan packing each lane's rANS bytes independently (the reference's
model/coder separation, `ransmt.h:31-135`, turned into tensor passes).

Byte-identical to `spec/coder.py`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from screenpressor_tpu.config import (
    MV_OFFSET, PROB_BITS, PROB_SCALE, RANS_L, kind_gstep, kind_step,
)
from screenpressor_tpu.jx.tables import effective_rows, update_batch

MASK = PROB_SCALE - 1
X_MAX_SHIFT = 23 - PROB_BITS + 8

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Record codecs: the shared substep description (jx/substeps.py) on [K]
# lane vectors. The Pallas kernels execute the SAME schedule on [K, 1]
# columns — a format change edits substeps.py only (VERDICT r3 #7).
# ---------------------------------------------------------------------------

from screenpressor_tpu.jx.substeps import SUBSTEP_CODECS as CODECS


# ---------------------------------------------------------------------------
# Lane geometry (format-normative chunking; mirrors config.lane_ranges)
# ---------------------------------------------------------------------------


def lane_lengths(n: int, k: int) -> np.ndarray:
    base, rem = divmod(n, k)
    return np.asarray([base + (1 if i < rem else 0) for i in range(k)], np.int32)


def gather_order(n: int, k: int):
    """global record index -> (lane, step) under contiguous chunking."""
    base, rem = divmod(n, k)
    g = np.arange(n)
    cut = rem * (base + 1)
    lane = np.where(g < cut, g // (base + 1), rem + (g - cut) // max(base, 1))
    t = np.where(g < cut, g % (base + 1), (g - cut) % max(base, 1))
    return lane.astype(np.int64), t.astype(np.int64)


def _pad_steps(t_steps: int) -> int:
    """Bucket scan lengths to bound jit recompilation; masked extra steps
    are no-ops and do not affect the stream (t is not format-relevant).

    TPU: pow2 below 128, 128-multiples above (tight buckets — extra masked
    steps cost real kernel time). CPU: coarse {1, 32, 128} buckets below
    128 — on the 1-core test rigs each extra (codec, k, t) variant costs
    seconds of XLA compile while masked steps are nearly free."""
    if t_steps <= 1:
        return t_steps
    if t_steps <= 128:
        if jax.default_backend() == "cpu":
            return 32 if t_steps <= 32 else 128
        return 1 << (t_steps - 1).bit_length()
    return -(-t_steps // 128) * 128


# ---------------------------------------------------------------------------
# Device-side lane dealing (same contiguous chunking as config.lane_ranges,
# with the record count as a traced scalar so whole frames fuse into one jit)
# ---------------------------------------------------------------------------


def _geometry(g, n, k):
    base = n // k
    rem = n % k
    cut = rem * (base + 1)
    lane = jnp.where(g < cut, g // jnp.maximum(base + 1, 1), rem + (g - cut) // jnp.maximum(base, 1))
    step = jnp.where(g < cut, g % jnp.maximum(base + 1, 1), (g - cut) % jnp.maximum(base, 1))
    return lane.astype(jnp.int32), step.astype(jnp.int32)


def lane_lens_device(n, k: int):
    base = n // k
    rem = n % k
    return (base + (jnp.arange(k) < rem)).astype(jnp.int32)


def deal_device(records_cap, n, k: int, t: int):
    """records_cap: [N, W] with the first n rows valid -> [t, k, W].

    Destination-sized gather (record for (step, lane) is lane_start + step,
    the inverse of `_geometry`): a [t*k] gather instead of a scatter over
    the full source capacity, which for I-frames is h*w rows and dominated
    the whole encode dispatch before."""
    cap, wdt = records_cap.shape
    base = n // k
    rem = n % k
    lane = jnp.arange(k, dtype=jnp.int32)
    start = lane * base + jnp.minimum(lane, rem)  # [k] lane range starts
    lens = base + (lane < rem)
    step = jnp.arange(t, dtype=jnp.int32)
    src = start[None, :] + step[:, None]  # [t, k]
    valid = step[:, None] < lens[None, :]
    rows = records_cap[jnp.clip(src, 0, cap - 1)]
    return jnp.where(valid[..., None], rows, 0)


def undeal_device(scan_out, n, k: int, cap: int):
    """[t, k, W] scan outputs -> [cap, W] in global record order (rows >= n
    are zero)."""
    t = scan_out.shape[0]
    g = jnp.arange(cap)
    lane, step = _geometry(g, n, k)
    valid = (g < n)[:, None]
    vals = scan_out[jnp.minimum(step, t - 1), lane]
    return jnp.where(valid, vals, 0)


# ---------------------------------------------------------------------------
# rANS lane primitives
# ---------------------------------------------------------------------------


def _dec_init(payload):
    """payload: [K, L] uint8 -> state [K] uint32, pos [K] int32."""
    p = payload[:, :4].astype(U32)
    x = p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
    return x, jnp.full((payload.shape[0],), 4, jnp.int32)


def _dec_advance(x, pos, payload, cum, freq, active):
    """Masked rANS advance + <=2-byte renorm. cum/freq int32, x uint32."""
    k = x.shape[0]
    lanes = jnp.arange(k)
    xx = freq.astype(U32) * (x >> PROB_BITS) + (x & MASK) - cum.astype(U32)
    for _ in range(2):
        need = (xx < RANS_L) & active
        b = payload[lanes, jnp.minimum(pos, payload.shape[1] - 1)].astype(U32)
        xx = jnp.where(need, (xx << 8) | b, xx)
        pos = jnp.where(need, pos + 1, pos)
    x = jnp.where(active, xx, x)
    return x, pos


def _lookup(cum_rows, freq_rows, sf):
    """cum_rows/freq_rows: [K, A]; sf: [K] -> (sym, cum, freq)."""
    sym = jnp.sum(cum_rows[:, 1:] <= sf[:, None], axis=1).astype(jnp.int32)
    cum = jnp.take_along_axis(cum_rows, sym[:, None], axis=1)[:, 0]
    freq = jnp.take_along_axis(freq_rows, sym[:, None], axis=1)[:, 0]
    return sym, cum, freq


# ---------------------------------------------------------------------------
# Section decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("codec_name", "k", "t_steps"))
def decode_section_scan(payload, lens, tables, codec_name: str, k: int, t_steps: int):
    """payload: [K, L] uint8 lane blobs (padded); lens: [K] records per lane.

    Returns (records [T, K, rec_width] int32, tables') — caller reorders to
    global record order with `gather_order`.
    """
    codec = CODECS[codec_name]
    x, pos = _dec_init(payload)
    state0 = codec.init_state(jnp.zeros((k,), jnp.int32))

    def step(carry, t):
        x, pos, state, tables = carry
        lane_active = t < lens
        partial = []
        for j, kind in enumerate(codec.kinds):
            row, extra = codec.dec_row(j, partial, state)
            active = lane_active if extra is None else (lane_active & extra)
            row = jnp.clip(row, 0, tables[kind]["cnt"].shape[0] - 1)
            freq_rows = effective_rows(tables[kind], row)
            cum_rows = jnp.cumsum(freq_rows, axis=1) - freq_rows
            sf = (x & MASK).astype(jnp.int32)
            sym, cum, freq = _lookup(cum_rows, freq_rows, sf)
            x, pos = _dec_advance(x, pos, payload, cum, freq, active)
            sym = jnp.where(active, sym, 0)
            partial.append(sym)
            tables = dict(tables)
            tables[kind] = update_batch(
                tables[kind], row, sym, active, kind_step(kind), kind_gstep(kind)
            )
        rec_l, state = codec.dec_finish(partial, state, lane_active)
        rec = jnp.stack(rec_l, axis=1)
        return (x, pos, state, tables), rec

    (x, pos, state, tables), recs = jax.lax.scan(
        step, (x, pos, state0, tables), jnp.arange(t_steps, dtype=jnp.int32)
    )
    return recs, tables


def decode_section(blobs, n_records, k, tables, codec_name):
    """Host wrapper: pad blobs, run the scan, reorder to global record order.

    tables: JAX table pytree (updated copy returned).
    Returns (records [n, rec_width] np.ndarray, tables').
    """
    codec = CODECS[codec_name]
    if n_records == 0:
        return np.zeros((0, codec.rec_width), np.int32), tables
    t_steps = _pad_steps(-(-n_records // k))
    lens = lane_lengths(n_records, k)
    max_len = max(max(len(b) for b in blobs), 4)
    payload = np.zeros((k, max_len), np.uint8)
    for i, b in enumerate(blobs):
        payload[i, : len(b)] = np.frombuffer(b, np.uint8)
    recs, tables = decode_section_scan(
        jnp.asarray(payload), jnp.asarray(lens), tables, codec_name, k, t_steps
    )
    recs = np.asarray(recs)  # [T, K, W]
    lane, t = gather_order(n_records, k)
    return recs[t, lane], tables


# ---------------------------------------------------------------------------
# Section encode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("codec_name", "k", "t_steps"))
def model_scan(recs, lens, tables, codec_name: str, k: int, t_steps: int):
    """Forward modeling pass: records [T, K, W] -> intervals + activity.

    Returns (cum [T, K, S], freq [T, K, S], act [T, K, S], tables').
    """
    codec = CODECS[codec_name]
    state0 = codec.init_state(jnp.zeros((k,), jnp.int32))

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
            tables = dict(tables)
            tables[kind] = update_batch(
                tables[kind], row, symc, active, kind_step(kind), kind_gstep(kind)
            )
        state = codec.enc_next_state(rec_l, state, lane_active)
        return (state, tables), (jnp.stack(cums, 1), jnp.stack(freqs, 1), jnp.stack(acts, 1))

    (state, tables), (cum, freq, act) = jax.lax.scan(
        step, (state0, tables), (recs, jnp.arange(t_steps, dtype=jnp.int32))
    )
    return cum, freq, act, tables


@functools.partial(jax.jit, static_argnames=("cap",))
def rans_pack(cum, freq, act, cap: int):
    """Reverse rANS pack: intervals [T, K, S] -> (buf [K, cap] uint8, start [K]).

    Lane blob = buf[k, start[k]:]; its first 4 bytes are the flushed state.
    """
    t_steps, k, s = cum.shape
    x0 = jnp.full((k,), RANS_L, U32)
    pos0 = jnp.full((k,), cap, jnp.int32)
    buf0 = jnp.zeros((k, cap), jnp.uint8)
    lanes = jnp.arange(k)

    def emit(buf, pos, byte, do):
        # lanes not emitting scatter out of bounds and drop
        p = jnp.where(do, pos - 1, pos)
        buf = buf.at[lanes, jnp.where(do, p, cap)].set(byte.astype(jnp.uint8), mode="drop")
        return buf, p

    def step(carry, inp):
        x, pos, buf = carry
        cum_t, freq_t, act_t = inp  # [K, S]
        for j in range(s - 1, -1, -1):
            a = act_t[:, j]
            f = freq_t[:, j].astype(U32)
            c = cum_t[:, j].astype(U32)
            x_max = jnp.where(a, f << X_MAX_SHIFT, jnp.uint32(0xFFFFFFFF))
            for _ in range(2):
                do = x >= x_max
                buf, pos = emit(buf, pos, x & 0xFF, do)
                x = jnp.where(do, x >> 8, x)
            fx = jnp.maximum(f, 1)
            nx = ((x // fx) << PROB_BITS) + (x % fx) + c
            x = jnp.where(a, nx, x)
        return (x, pos, buf), None

    (x, pos, buf), _ = jax.lax.scan(
        step,
        (x0, pos0, buf0),
        (cum[::-1], freq[::-1], act[::-1]),
    )
    # flush 4 state bytes (LE) in front
    for i in (3, 2, 1, 0):
        buf, pos = emit(buf, pos, (x >> (8 * i)) & 0xFF, jnp.ones((k,), bool))
    return buf, pos


_KERNEL_PROBE: dict = {}


def use_kernels() -> bool:
    """Pallas section kernels: on for TPU, off for CPU (the lax.scan path is
    faster than interpret mode there); override with SPTC_KERNELS=0/1.

    On TPU the first call probes a tiny kernel compile once: a Mosaic
    regression (new table sizes, new ops) then degrades to the byte-identical
    scan path instead of failing every encode/decode."""
    import os
    import sys

    env = os.environ.get("SPTC_KERNELS")
    if env is not None:
        return env != "0"
    if jax.default_backend() != "tpu":
        return False
    ok = _KERNEL_PROBE.get("ok")
    if ok is None:
        try:
            import jax.numpy as jnp

            from screenpressor_tpu.jx import kernels as kx
            from screenpressor_tpu.jx.tables import renew_tables

            recs = jnp.zeros((1, 8, 3), jnp.int32)
            lens = jnp.ones((8,), jnp.int32)
            buf, start, _ = kx.encode_section_kernel(
                recs, lens, renew_tables(), "col", 8, 1
            )
            jax.block_until_ready(buf)
            ok = True
        except Exception as e:  # Mosaic compile/runtime failure
            print(
                f"screenpressor_tpu: Pallas kernel probe failed "
                f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
                f"lax.scan coder (bytes identical, slower)",
                file=sys.stderr,
            )
            ok = False
        _KERNEL_PROBE["ok"] = ok
    return ok


# Single-kernel VMEM ceiling: a section whose state (payload/records +
# table + MXU transients) exceeds this falls back to the scan path rather
# than risking a Mosaic VMEM OOM — and, at SPTC4's 4096-row color windows,
# rather than paying the kernel's O(window) per-substep table update
# (measured slower than the scan coder; see jitopts.SCOPED_VMEM_KIB).
# The batched (stream-vmapped) serving kernels double-buffer the table
# block in+out across the stream grid; _kernel_fits scales the resident
# table term 4x for them (Mosaic measured 65.9 MB at 64x360p decode-I).
_KERNEL_VMEM_LIMIT = 24 * 1024 * 1024
# batched (stream-vmapped) kernels live in batch_kernel_jit programs with a
# 96 MB scoped cap, so their budget is larger — it must cover the 4x
# double-buffered table block (Mosaic measured 65.9 MB at 64x360p SPTC4)
_BATCH_KERNEL_VMEM_LIMIT = 80 * 1024 * 1024


_BATCH_TRACER_WARNED = False


def _batched_args(*arrs) -> bool:
    """True when any operand is a vmap BatchTracer (the serving batch
    paths): the Pallas stream grid then double-buffers table blocks.

    Auto-detection reaches into jax internals; if they move, warn LOUDLY
    once (a silent False under-budgets the batched kernels' double-buffered
    table VMEM — the exact Mosaic OOM round 4 fixed) and fall back to the
    explicit `batched` flags every call site passes."""
    global _BATCH_TRACER_WARNED
    try:
        try:
            from jax._src.interpreters.batching import BatchTracer
        except ImportError:  # pragma: no cover - jax internals moved
            from jax.interpreters.batching import BatchTracer

        return any(
            isinstance(a, BatchTracer)
            for a in jax.tree_util.tree_leaves(arrs)
        )
    except Exception:  # pragma: no cover - jax internals moved
        if not _BATCH_TRACER_WARNED:
            import sys

            print(
                "screenpressor_tpu: BatchTracer import failed (jax internals "
                "moved?); batched-kernel auto-detection disabled — relying on "
                "explicit batched= flags for VMEM budgeting",
                file=sys.stderr,
            )
            _BATCH_TRACER_WARNED = True
        return False


def _kernel_fits(codec_name: str, k: int, t_steps: int, pay_bytes: int = 0,
                 batched: bool = False) -> bool:
    from screenpressor_tpu.jx import kernels as kx

    est = kx._enc_vmem_estimate(((codec_name, k, t_steps),))
    limit = _KERNEL_VMEM_LIMIT
    if batched:
        # the stream-grid pipeline double-buffers the table block in AND
        # out: add 3 more copies of the resident tables. Batched kernels
        # compile inside batch_kernel_jit programs (96 MB scoped cap).
        est += kx._batch_table_overhead(((codec_name, k, t_steps),))
        limit = _BATCH_KERNEL_VMEM_LIMIT
    return est + 4 * max(k, 8) * pay_bytes <= limit


# ---------------------------------------------------------------------------
# Compact color-table encode (touched-row windowing, shape-only)
# ---------------------------------------------------------------------------


def _col_rows_exact(recs, lens):
    """Exact color-context rows accessed by a col section's encode.

    recs: [T, K, 3] dealt RGB records; lens [K]. Returns [T, K, 3] int32
    rows (padded steps parked on row 0). Mirrors substeps.Col._row with the
    per-lane (prevg, prevb) chain: lane state starts at (0, 0); active
    steps are a prefix of each lane, so step t's predecessor is step t-1."""
    from screenpressor_tpu.config import COLOR_CTX_ROWS, color_ctx

    t_steps, k, _ = recs.shape
    r, g, b = recs[..., 0], recs[..., 1], recs[..., 2]
    z = jnp.zeros((1, k), recs.dtype)
    pg = jnp.concatenate([z, g[:-1]], axis=0)
    pb = jnp.concatenate([z, b[:-1]], axis=0)
    rows = jnp.stack(
        [
            color_ctx(pg, pb),
            COLOR_CTX_ROWS + color_ctx(pb, r),
            2 * COLOR_CTX_ROWS + color_ctx(r, g),
        ],
        axis=-1,
    ).astype(jnp.int32)
    active = jnp.arange(t_steps)[:, None] < lens[None, :]
    return jnp.where(active[..., None], rows, 0)


def color_touched_bitmap(lits, n_lit):
    """Geometry-independent OVERAPPROXIMATION of the distinct color-context
    rows a col section over these literals will touch, for any lane count:
    a [3 * COLOR_CTX_ROWS] bool bitmap (superset of the rows any lane
    dealing can access).

    lits: [cap, 3] int32 literal RGB in global record order (first n_lit
    valid). The global-prev chain covers every lane-interior step (lane
    chunks are contiguous); lane-START steps see state (0, b=0), so their
    possible rows are row 0 (plane 0) and plane 1's color_ctx(0, R[i]) for
    any i — both force-included. Padded kernel steps park on row 0."""
    from screenpressor_tpu.config import COLOR_CTX_ROWS, color_ctx

    cap = lits.shape[0]
    lits = lits.astype(jnp.int32)
    r, g, b = lits[:, 0], lits[:, 1], lits[:, 2]
    z = jnp.zeros((1,), jnp.int32)
    pg = jnp.concatenate([z, g[:-1]])
    pb = jnp.concatenate([z, b[:-1]])
    valid = jnp.arange(cap) < n_lit
    nrows = 3 * COLOR_CTX_ROWS
    bm = jnp.zeros((nrows,), bool)
    for rows in (
        color_ctx(pg, pb),
        COLOR_CTX_ROWS + color_ctx(pb, r),
        COLOR_CTX_ROWS + color_ctx(jnp.zeros_like(r), r),  # lane starts
        2 * COLOR_CTX_ROWS + color_ctx(r, g),
    ):
        bm = bm.at[jnp.where(valid, rows, 0)].set(True)
    return bm.at[0].set(True)  # lane starts (plane 0) + padding park row


def color_touched_count(lits, n_lit):
    """bitmap cardinality (host bucket choice); see color_touched_bitmap."""
    return color_touched_bitmap(lits, n_lit).sum().astype(jnp.int32)


def col_compact_bucket(n_touch: int) -> int | None:
    """Host-side static bucket choice for the compact color-table encode.

    Returns the smallest COL_COMPACT_BUCKETS entry >= n_touch that is
    still smaller than the full per-plane window (otherwise compaction
    cannot win), or None for the full-window path. SPTC_COLW=0 disables;
    SPTC_COLW=1 forces it on even where kernels are off (CPU test rigs —
    the lax.scan coder handles colw sections identically)."""
    import os

    from screenpressor_tpu.config import COL_COMPACT_BUCKETS, COLOR_CTX_ROWS

    env = os.environ.get("SPTC_COLW")
    if env == "0":
        return None
    if env != "1" and not use_kernels():
        return None
    for b in COL_COMPACT_BUCKETS:
        if n_touch <= b and b < COLOR_CTX_ROWS:
            return b
    return None


def color_compact_sections(dealt_list, lens_list, tables, kts, col_w: int,
                           bm=None):
    """Rewrite a section group's 'col' section to the compact-table 'colw'
    form (byte-identical; see substeps.ColW).

    Returns (dealt2, kts2, tables_compact, restore) where restore maps the
    encoded-group's output tables (compact color) back onto the full
    table. The caller GUARANTEES the section touches <= col_w distinct
    rows (host check against color_touched_count's overapproximation).
    bm: optional precomputed touched bitmap (color_touched_bitmap output
    from the analysis phase — a SUPERSET of the exact rows is fine and
    skips re-deriving the bitmap, which costs a T*K*3-index scatter)."""
    from screenpressor_tpu.config import COLOR_CTX_ROWS

    nrows = 3 * COLOR_CTX_ROWS
    idx = next(i for i, (cn, _, _) in enumerate(kts) if cn == "col")
    recs, lens = dealt_list[idx], lens_list[idx]
    rows = _col_rows_exact(recs, lens)  # [T, K, 3]
    if bm is None:
        bm = jnp.zeros((nrows,), bool).at[rows.reshape(-1)].set(True)
        bm = bm.at[0].set(True)  # padding park row
    perm = jnp.nonzero(bm, size=col_w, fill_value=nrows)[0]
    lut = (
        jnp.zeros((nrows,), jnp.int32)
        .at[jnp.minimum(perm, nrows - 1)]
        .set(jnp.arange(col_w, dtype=jnp.int32))
    )
    rows_c = lut[rows]
    recs2 = jnp.concatenate([recs, rows_c.astype(recs.dtype)], axis=-1)

    ctab = tables["color"]
    permc = jnp.minimum(perm, nrows - 1)
    ctab_c = dict(ctab)
    ctab_c["cnt"] = ctab["cnt"][permc]
    ctab_c["cntsum"] = ctab["cntsum"][permc]
    tables_c = dict(tables)
    tables_c["color"] = ctab_c

    def restore(tables_out):
        cc = tables_out["color"]
        full = dict(ctab)
        full["cnt"] = ctab["cnt"].at[perm].set(cc["cnt"], mode="drop")
        full["cntsum"] = ctab["cntsum"].at[perm].set(cc["cntsum"], mode="drop")
        for key in ("gcnt", "gsum"):
            if key in cc:
                full[key] = cc[key]
        out = dict(tables_out)
        out["color"] = full
        return out

    dealt2 = list(dealt_list)
    dealt2[idx] = recs2
    kts2 = tuple(
        (f"colw{col_w}", kt[1], kt[2]) if i == idx else kt
        for i, kt in enumerate(kts)
    )
    return dealt2, kts2, tables_c, restore


def decode_section_auto(payload, lens, tables, codec_name: str, k: int,
                        t_steps: int, batched: bool | None = None):
    """Kernel/scan dispatch; identical contract and bytes either way.
    batched: True when called under a stream vmap (the caller must say so —
    a nested jit boundary hides BatchTracers from auto-detection)."""
    if batched is None:
        batched = _batched_args(payload, tables)
    if use_kernels() and _kernel_fits(codec_name, k, t_steps, payload.shape[1],
                                      batched):
        from screenpressor_tpu.jx import kernels as kx

        return kx.decode_section_kernel(payload, lens, tables, codec_name, k, t_steps)
    return decode_section_scan(payload, lens, tables, codec_name, k, t_steps)


def decode_sections_auto_multi(pay_list, lens_list, tables, kts,
                               batched: bool | None = None):
    """Decode several sections in order with chained tables; on the
    unbatched kernel path consecutive sections fuse into as few Pallas
    launches as VMEM allows (decode counterpart of encode_sections_auto —
    a 1080p P frame's five section launches collapse to one or two).
    Bytes identical either way. Batched (stream-vmapped) callers keep the
    per-section kernels (their custom vmap grids over streams)."""
    if batched is None:
        batched = _batched_args(pay_list, tables)
    if use_kernels() and not batched:
        from screenpressor_tpu.jx import kernels as kx

        return kx.decode_sections_fused(pay_list, lens_list, tables, kts)
    recs = []
    for (cn, k, t), pay, lens in zip(kts, pay_list, lens_list):
        r, tables = decode_section_auto(pay, lens, tables, cn, k, t, batched)
        recs.append(r)
    return recs, tables


def encode_section_auto(recs, lens, tables, codec_name: str, k: int,
                        t_steps: int, batched: bool | None = None):
    """Kernel/scan dispatch -> (buf [K, cap], start [K], tables'). Blob bytes
    (buf[i, start[i]:]) are identical either way; only cap padding differs."""
    if batched is None:
        batched = _batched_args(recs, tables)
    if use_kernels() and _kernel_fits(codec_name, k, t_steps, batched=batched):
        from screenpressor_tpu.jx import kernels as kx

        return kx.encode_section_kernel(recs, lens, tables, codec_name, k, t_steps)
    cum, freq, act, tables = model_scan(recs, lens, tables, codec_name, k, t_steps)
    nsub = len(CODECS[codec_name].kinds)
    buf, start = rans_pack(cum, freq, act, 2 * t_steps * nsub + 8)
    return buf, start, tables


def encode_sections_auto(dealt_list, lens_list, tables, kts,
                         batched: bool | None = None,
                         col_w: int | None = None, col_bm=None):
    """Encode several sections in order with chained tables.

    kts: tuple of (codec_name, k, t_steps). On the kernel path consecutive
    sections are fused into as few Pallas launches as VMEM allows (each
    launch has ~3 ms fixed cost on tunnel-attached rigs); bytes are
    identical to sequential encode_section_auto calls either way.
    batched: see decode_section_auto. col_w: static compact color-table
    bucket (host-checked against color_touched_count) — rewrites the 'col'
    section to the touched-row 'colw' form, byte-identical."""
    if batched is None:
        batched = _batched_args(dealt_list, tables)
    restore = None
    if col_w is not None and any(cn == "col" for cn, _, _ in kts):
        dealt_list, kts, tables, restore = color_compact_sections(
            dealt_list, lens_list, tables, kts, col_w, col_bm
        )
    if use_kernels():
        from screenpressor_tpu.jx import kernels as kx

        bufs, starts, tables = kx.encode_sections_fused(
            dealt_list, lens_list, tables, kts, batched)
        if restore is not None:
            tables = restore(tables)
        return bufs, starts, tables
    bufs, starts = [], []
    for (name, k, t), recs, lens in zip(kts, dealt_list, lens_list):
        buf, start, tables = encode_section_auto(recs, lens, tables, name, k,
                                                 t, batched)
        bufs.append(buf)
        starts.append(start)
    if restore is not None:
        tables = restore(tables)
    return bufs, starts, tables


def encode_section(records: np.ndarray, k: int, tables, codec_name: str):
    """Host wrapper. records: [n, W] int array. Returns (blobs, tables')."""
    codec = CODECS[codec_name]
    n = len(records)
    if n == 0:
        return [b""] * k, tables
    t_steps = _pad_steps(-(-n // k))
    lens = lane_lengths(n, k)
    recs = np.zeros((t_steps, k, codec.rec_width), np.int32)
    lane, t = gather_order(n, k)
    recs[t, lane] = np.asarray(records, np.int32).reshape(n, codec.rec_width)
    cum, freq, act, tables = model_scan(
        jnp.asarray(recs), jnp.asarray(lens), tables, codec_name, k, t_steps
    )
    n_sub = len(codec.kinds)
    cap = 2 * t_steps * n_sub + 8
    buf, start = rans_pack(cum, freq, act, cap)
    buf = np.asarray(buf)
    start = np.asarray(start)
    blobs = []
    for i in range(k):
        blobs.append(bytes(buf[i, start[i] :]) if lens[i] > 0 else b"")
    return blobs, tables
