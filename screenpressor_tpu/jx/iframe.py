"""I-frame encode/decode — JAX pipeline.

Device work: classification/segmentation, section scans, reconstruction.
Host work: container framing (`bitstream.py`). Byte-identical to
`spec/iframe.py`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_I, CodecConfig
from screenpressor_tpu.jx import coder as jc
from screenpressor_tpu.jx.classify import classify_i
from screenpressor_tpu.jx.recon import reconstruct_i


def encode_i(frame, tables, cfg: CodecConfig):
    """frame: [H, W, 3] uint8 (numpy or jax). Returns (bytes, tables')."""
    h, w = cfg.height, cfg.width
    records, n_records, lits, n_literals = classify_i(jnp.asarray(frame), h, w)
    n_rec = int(n_records)
    n_lit = int(n_literals)
    rec_np = np.asarray(records[:n_rec])
    lit_np = np.asarray(lits[:n_lit])
    k_rec = cfg.lanes(n_rec)
    k_col = cfg.lanes(n_lit)
    rec_blobs, tables = jc.encode_section(rec_np, k_rec, tables, "rec")
    col_blobs, tables = jc.encode_section(lit_np, k_col, tables, "col")
    data = b"".join(
        [
            bytes([bs.header_byte(ALG_I)]),
            bs.pack_u32(n_rec, n_lit),
            bs.pack_section(rec_blobs),
            bs.pack_section(col_blobs),
        ]
    )
    return data, tables


def decode_i(data: bytes, pos: int, tables, cfg: CodecConfig):
    """Returns (frame [H, W, 3] uint8 jax array, tables')."""
    (n_rec, n_lit), pos = bs.read_u32(data, pos, 2)
    k_rec = cfg.lanes(n_rec)
    k_col = cfg.lanes(n_lit)
    rec_blobs, pos = bs.unpack_section(data, pos, k_rec)
    col_blobs, pos = bs.unpack_section(data, pos, k_col)
    records, tables = jc.decode_section(rec_blobs, n_rec, k_rec, tables, "rec")
    lits, tables = jc.decode_section(col_blobs, n_lit, k_col, tables, "col")
    total = int(records[:, 1].sum()) if n_rec else 0
    if total != cfg.width * cfg.height:
        raise bs.CorruptStreamError(
            f"records cover {total} pixels, frame has {cfg.width * cfg.height}"
        )
    # pad record/literal arrays to the frame capacity expected by reconstruct
    n = cfg.height * cfg.width
    rec_pad = np.zeros((n, 2), np.int32)
    rec_pad[:n_rec] = records
    lit_pad = np.zeros((n, 3), np.int32)  # fixed capacity: stable jit shapes
    lit_pad[:n_lit] = lits
    frame = reconstruct_i(jnp.asarray(rec_pad), jnp.asarray(lit_pad), cfg.height, cfg.width)
    return frame, tables
