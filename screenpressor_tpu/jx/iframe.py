"""I-frame encode/decode — JAX pipeline.

The whole frame runs as ONE fused jit each way (classification, lane dealing,
section scans, rANS pack / reconstruction on device); the host only reads two
counters to pick static lane/step bucket sizes and assembles the container.
Byte-identical to `spec/iframe.py`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_I, CodecConfig
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.classify import classify_i
from screenpressor_tpu.jx.jitopts import kernel_jit
from screenpressor_tpu.jx.recon import reconstruct_i


@functools.partial(jax.jit, static_argnames=("h", "w"))
def classify_counts(frame, h: int, w: int):
    records, n_records, lits, n_literals = classify_i(frame, h, w)
    return records, n_records, lits, n_literals


@functools.partial(jax.jit, static_argnames=("h", "w"))
def i_phase(frame, h: int, w: int):
    """Phase A for keyframes: classification + flat check in one dispatch.

    Returns (records, lits, counts[7] = n_rec, n_lit, is_flat, r, g, b,
    n_ctouch, col_bm) — n_ctouch (the touched color-row overapproximation)
    picks the compact color-table bucket on the host
    (jc.col_compact_bucket); col_bm is the bitmap itself, fed back into
    phase C so the compact transform does not re-derive it."""
    records, n_records, lits, n_literals = classify_i(frame, h, w)
    c0 = frame.reshape(-1, 3)[0].astype(jnp.int32)
    is_flat = jnp.all(frame == frame.reshape(-1, 3)[0][None, None, :]).astype(jnp.int32)
    col_bm = jc.color_touched_bitmap(lits, n_literals)
    n_ctouch = col_bm.sum().astype(jnp.int32)
    counts = jnp.concatenate(
        [jnp.stack([n_records, n_literals, is_flat]), c0,
         n_ctouch[None]]
    ).astype(jnp.int32)
    return records, lits, counts, col_bm


@functools.partial(
    kernel_jit,
    static_argnames=("k_rec", "t_rec", "k_col", "t_col", "raw_threshold",
                     "col_w"),
)
def encode_i_raw(records, n_rec, lits, n_lit, tables,
                 k_rec: int, t_rec: int, k_col: int, t_col: int,
                 raw_threshold: int, col_w: int | None = None,
                 col_bm=None):
    """encode_i_from_records + exact container-size computation + raw-escape
    table select, all on device (lets a pipelined caller chain tables without
    pulling the payload first; the host applies the identical raw rule when
    assembling the container)."""
    from screenpressor_tpu.jx.tables import renew_tables

    out = encode_i_from_records(
        records, n_rec, lits, n_lit, tables, k_rec, t_rec, k_col, t_col,
        col_w, col_bm
    )
    buf_rec, start_rec, lens_rec, buf_col, start_col, lens_col, tables2 = out
    total = jnp.int32(1) + varint_len_device(n_rec) + varint_len_device(n_lit)
    for k, buf, starts, lens in (
        (k_rec, buf_rec, start_rec, lens_rec),
        (k_col, buf_col, start_col, lens_col),
    ):
        total = total + section_bytes_device(starts, lens, buf.shape[1], k)
    is_raw = total >= raw_threshold
    renewed = renew_tables()
    sel = jax.tree.map(lambda a, b: jnp.where(is_raw, a, b), renewed, tables2)
    stats = jnp.stack([total, is_raw.astype(jnp.int32)])
    return buf_rec, start_rec, lens_rec, buf_col, start_col, lens_col, stats, sel


def varint_len_device(v):
    """Encoded LEB128 length of a device int32 (matches bs.pack_varint)."""
    v = jnp.asarray(v, jnp.int32)
    return (1 + (v >= 1 << 7).astype(jnp.int32)
            + (v >= 1 << 14).astype(jnp.int32)
            + (v >= 1 << 21).astype(jnp.int32))


def section_bytes_device(starts, lens, cap, k: int):
    """Exact container bytes of one lane section (status byte +
    minimal-width size table + payloads), matching bs.pack_section."""
    sizes = jnp.where(lens > 0, cap - starts, 0)
    m = sizes.max()
    w = jnp.where(m < 1 << 8, 1, jnp.where(m < 1 << 16, 2, 4))
    return 1 + k * w + sizes.sum()


def parse_i_header(data: bytes, pos: int, cfg: CodecConfig):
    """Host-side I-frame container parse + sanity bounds."""
    (n_rec, n_lit), pos = bs.read_varint(data, pos, 2)
    if n_rec > cfg.width * cfg.height or n_lit > max(n_rec, 1):
        raise bs.CorruptStreamError("I-frame record counts out of bounds")
    k_rec, k_col = cfg.lanes(n_rec), cfg.lanes(n_lit)
    rec_blobs, pos = bs.unpack_section(data, pos, k_rec)
    col_blobs, pos = bs.unpack_section(data, pos, k_col)
    t_rec = jc._pad_steps(-(-n_rec // k_rec)) if n_rec else 1
    t_col = jc._pad_steps(-(-n_lit // k_col)) if n_lit else 1
    return (
        _pad_payload(rec_blobs, k_rec),
        _pad_payload(col_blobs, k_col),
        n_rec, n_lit, k_rec, t_rec, k_col, t_col,
    )


@functools.partial(
    jax.jit, static_argnames=("k_rec", "t_rec", "k_col", "t_col", "col_w")
)
def encode_i_from_records(records, n_rec, lits, n_lit, tables, k_rec, t_rec,
                          k_col, t_col, col_w: int | None = None,
                          col_bm=None):
    """Section encoding given classification outputs (classification runs
    once in classify_counts; its arrays stay on device)."""
    rec_dealt = jc.deal_device(records, n_rec, k_rec, t_rec)
    lens_rec = jc.lane_lens_device(n_rec, k_rec)
    col_dealt = jc.deal_device(lits, n_lit, k_col, t_col)
    lens_col = jc.lane_lens_device(n_lit, k_col)
    bufs, starts, tables = jc.encode_sections_auto(
        [rec_dealt, col_dealt], [lens_rec, lens_col], tables,
        (("rec", k_rec, t_rec), ("col", k_col, t_col)),
        col_w=col_w, col_bm=col_bm,
    )
    return bufs[0], starts[0], lens_rec, bufs[1], starts[1], lens_col, tables


@functools.partial(
    kernel_jit,
    static_argnames=("h", "w", "k_rec", "t_rec", "k_col", "t_col", "batched"),
)
def decode_i_device(pay_rec, pay_col, n_rec, n_lit, tables, h, w, k_rec,
                    t_rec, k_col, t_col, batched: bool = False):
    lens_rec = jc.lane_lens_device(n_rec, k_rec)
    lens_col = jc.lane_lens_device(n_lit, k_col)
    (recs_scan, lits_scan), tables = jc.decode_sections_auto_multi(
        [pay_rec, pay_col], [lens_rec, lens_col], tables,
        (("rec", k_rec, t_rec), ("col", k_col, t_col)), batched)
    # tight record capacities (k*t >= n always): pixel-count-sized caps made
    # the downstream expand/reconstruct gathers 20x larger than needed
    records = jc.undeal_device(recs_scan, n_rec, k_rec, k_rec * t_rec)
    lits = jc.undeal_device(lits_scan, n_lit, k_col, k_col * t_col)
    total = records[:, 1].sum()
    frame = reconstruct_i(records, lits, h, w)
    return frame, total, tables


def _blobs_from_buf(buf, start, lens, k):
    blobs = []
    for i in range(k):
        blobs.append(bytes(buf[i, start[i] :].tobytes()) if lens[i] > 0 else b"")
    return blobs


def _pad_payload(blobs, k):
    max_len = max(max((len(b) for b in blobs), default=0), 4)
    pay = np.zeros((k, jc._pad_steps(max_len)), np.uint8)
    for i, b in enumerate(blobs):
        pay[i, : len(b)] = np.frombuffer(b, np.uint8)
    return pay


def encode_i(frame, tables, cfg: CodecConfig):
    """frame: [H, W, 3] uint8. Returns (bytes, tables'). Two device calls,
    two host pulls (counts, packed lanes)."""
    h, w = cfg.height, cfg.width
    frame = jnp.asarray(frame)
    records, n_records, lits, n_literals = classify_counts(frame, h, w)
    n_rec, n_lit = jax.device_get((n_records, n_literals))
    n_rec, n_lit = int(n_rec), int(n_lit)
    k_rec, k_col = cfg.lanes(n_rec), cfg.lanes(n_lit)
    t_rec = jc._pad_steps(-(-n_rec // k_rec)) if n_rec else 1
    t_col = jc._pad_steps(-(-n_lit // k_col)) if n_lit else 1
    out = encode_i_from_records(
        records, n_records, lits, n_literals, tables, k_rec, t_rec, k_col, t_col
    )
    buf_rec, start_rec, lens_rec, buf_col, start_col, lens_col = jax.device_get(out[:6])
    tables = out[6]
    data = b"".join(
        [
            bytes([bs.header_byte(ALG_I)]),
            bs.pack_varint(n_rec, n_lit),
            bs.pack_section(_blobs_from_buf(buf_rec, start_rec, lens_rec, k_rec)),
            bs.pack_section(_blobs_from_buf(buf_col, start_col, lens_col, k_col)),
        ]
    )
    return data, tables


def decode_i(data: bytes, pos: int, tables, cfg: CodecConfig):
    """Returns (frame [H, W, 3] uint8 jax array, tables'). One device call."""
    (n_rec, n_lit), pos = bs.read_varint(data, pos, 2)
    k_rec, k_col = cfg.lanes(n_rec), cfg.lanes(n_lit)
    rec_blobs, pos = bs.unpack_section(data, pos, k_rec)
    col_blobs, pos = bs.unpack_section(data, pos, k_col)
    t_rec = jc._pad_steps(-(-n_rec // k_rec)) if n_rec else 1
    t_col = jc._pad_steps(-(-n_lit // k_col)) if n_lit else 1
    frame, total, tables = decode_i_device(
        jnp.asarray(_pad_payload(rec_blobs, k_rec)),
        jnp.asarray(_pad_payload(col_blobs, k_col)),
        jnp.int32(n_rec),
        jnp.int32(n_lit),
        tables,
        cfg.height, cfg.width, k_rec, t_rec, k_col, t_col,
    )
    if int(total) != cfg.width * cfg.height:
        raise bs.CorruptStreamError(
            f"records cover {int(total)} pixels, frame has {cfg.width * cfg.height}"
        )
    return frame, tables
