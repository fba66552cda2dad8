"""I-frame encode/decode — numpy specification.

Reference analog: `CompressI`/`DecompressI` (`screencap.cpp:319-498`), with
SPTC1 sectioned layout (FORMAT.md): REC section (ptype+run) then COL section
(literal triples), both over K BSAC lanes.
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu import bitstream as bs
from screenpressor_tpu.config import ALG_I, CodecConfig
from screenpressor_tpu.spec.classify import classify_i, reconstruct_i
from screenpressor_tpu.spec.coder import ColCodec, RecCodec, decode_section, encode_section
from screenpressor_tpu.spec.tables import TableSet


def encode_i(frame: np.ndarray, tables: TableSet, cfg: CodecConfig) -> bytes:
    records, literals = classify_i(frame)
    k_rec = cfg.lanes(len(records))
    k_col = cfg.lanes(len(literals))
    rec_blobs = encode_section(records, k_rec, tables, RecCodec())
    col_blobs = encode_section(literals, k_col, tables, ColCodec())
    return b"".join(
        [
            bytes([bs.header_byte(ALG_I)]),
            bs.pack_varint(len(records), len(literals)),
            bs.pack_section(rec_blobs),
            bs.pack_section(col_blobs),
        ]
    )


def decode_i(data: bytes, pos: int, tables: TableSet, cfg: CodecConfig) -> np.ndarray:
    (n_rec, n_lit), pos = bs.read_varint(data, pos, 2)
    k_rec = cfg.lanes(n_rec)
    k_col = cfg.lanes(n_lit)
    rec_blobs, pos = bs.unpack_section(data, pos, k_rec)
    col_blobs, pos = bs.unpack_section(data, pos, k_col)
    records = decode_section(rec_blobs, n_rec, k_rec, tables, RecCodec())
    literals = decode_section(col_blobs, n_lit, k_col, tables, ColCodec())
    total = sum(n for _, n in records)
    if total != cfg.width * cfg.height:
        raise bs.CorruptStreamError(
            f"records cover {total} pixels, frame has {cfg.width * cfg.height}"
        )
    return reconstruct_i(records, literals, cfg.height, cfg.width)
