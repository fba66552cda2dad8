"""K-lane BSAC section coder — numpy specification.

Records of a section are dealt contiguously to K rANS lanes (FORMAT.md "Lane
policy"). All lanes code in lockstep against shared adaptive tables with
batched updates after each sub-step. The encoder buffers per-lane intervals
and reverse-encodes each lane independently (the separation the reference
proves with `RansMTCoder`, `ransmt.h:31-135`); the decoder is a forward scan.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from screenpressor_tpu.config import MV_OFFSET, lane_ranges
from screenpressor_tpu.spec.rans import RansDecoder, RansEncoder
from screenpressor_tpu.spec.tables import TableSet
from screenpressor_tpu.utils import trace as _trace


class RecordCodec:
    """Schedule of sub-symbols for one record kind.

    `enc_symbol(j, record, state)` / `dec_context(j, partial, state)` return
    None when sub-step j is skipped for this record (no rANS traffic, no
    table update).
    """

    n_substeps: int = 0

    def init_state(self) -> Any:
        return None

    def enc_symbol(self, j: int, record, state) -> Optional[tuple[str, int, int]]:
        raise NotImplementedError

    def dec_context(self, j: int, partial: list, state) -> Optional[tuple[str, int]]:
        raise NotImplementedError

    def dec_record(self, partial: list, state):
        """(record, new_state) from decoded sub-symbols."""
        raise NotImplementedError

    def enc_next_state(self, record, state):
        rec, _ = record, state
        _, new_state = self.dec_record(self._enc_partial(rec, state), state)
        return new_state

    def _enc_partial(self, record, state) -> list:
        out = []
        for j in range(self.n_substeps):
            ks = self.enc_symbol(j, record, state)
            out.append(None if ks is None else ks[2])
        return out


class RecCodec(RecordCodec):
    """(ptype, n) records. ptype context = previous record's ptype in lane;
    nrun context = this record's ptype; run byte = n-1."""

    n_substeps = 2

    def init_state(self):
        return 0  # prev ptype

    def enc_symbol(self, j, record, state):
        ptype, n = record
        if j == 0:
            return ("ptype", state, ptype)
        return ("nrun", ptype, n - 1)

    def dec_context(self, j, partial, state):
        if j == 0:
            return ("ptype", state)
        return ("nrun", partial[0])

    def dec_record(self, partial, state):
        ptype, nb = partial
        return (ptype, nb + 1), ptype


class ColCodec(RecordCodec):
    """RGB literal triples with the stream-local context chain (FORMAT.md)."""

    n_substeps = 3

    def init_state(self):
        return (0, 0)  # (prevg, prevb)

    @staticmethod
    def _rows(partial, state):
        from screenpressor_tpu.config import COLOR_CTX_ROWS, color_ctx

        prevg, prevb = state
        rows = [color_ctx(prevg, prevb)]
        if partial[0] is not None:
            r = partial[0]
            rows.append(COLOR_CTX_ROWS + color_ctx(prevb, r))
            if len(partial) > 1 and partial[1] is not None:
                g = partial[1]
                rows.append(2 * COLOR_CTX_ROWS + color_ctx(r, g))
        return rows

    def enc_symbol(self, j, record, state):
        r, g, b = record
        rows = self._rows([r, g, b], state)
        return ("color", rows[j], (r, g, b)[j])

    def dec_context(self, j, partial, state):
        rows = self._rows(partial + [None] * (3 - len(partial)), state)
        return ("color", rows[j])

    def dec_record(self, partial, state):
        r, g, b = partial
        return (r, g, b), (g, b)


class BTCodec(RecordCodec):
    """Block-type RLE records (bt, n); run byte = n-1."""

    n_substeps = 2

    def enc_symbol(self, j, record, state):
        bt, n = record
        return ("bt", 0, bt) if j == 0 else ("btn", 0, n - 1)

    def dec_context(self, j, partial, state):
        return ("bt", 0) if j == 0 else ("btn", 0)

    def dec_record(self, partial, state):
        bt, nb = partial
        return (bt, nb + 1), state


class SxyCodec(RecordCodec):
    """Sub-rect coordinates: 4 nibble symbols through sxy[0..3]."""

    n_substeps = 4

    def enc_symbol(self, j, record, state):
        return ("sxy", j, record[j])

    def dec_context(self, j, partial, state):
        return ("sxy", j)

    def dec_record(self, partial, state):
        return tuple(partial), state


class MVCodec(RecordCodec):
    """Motion vectors (mx, my): same-as-previous flag (lane-local, initial
    (0,0)); components offset by MV_OFFSET through mv[0]/mv[1]."""

    n_substeps = 3

    def init_state(self):
        return (0, 0)

    def enc_symbol(self, j, record, state):
        mx, my = record
        same = (mx, my) == state
        if j == 0:
            return ("mvflag", 0, 1 if same else 0)
        if same:
            return None
        return ("mv", 0, mx + MV_OFFSET) if j == 1 else ("mv", 1, my + MV_OFFSET)

    def dec_context(self, j, partial, state):
        if j == 0:
            return ("mvflag", 0)
        if partial[0] == 1:
            return None
        return ("mv", 0) if j == 1 else ("mv", 1)

    def dec_record(self, partial, state):
        if partial[0] == 1:
            return state, state
        mv = (partial[1] - MV_OFFSET, partial[2] - MV_OFFSET)
        return mv, mv


# ---------------------------------------------------------------------------


def encode_section(
    records: Sequence, k: int, tables: TableSet, codec: RecordCodec
) -> list[bytes]:
    """Encode records into K lane blobs (list of bytes, one per lane)."""
    n = len(records)
    ranges = lane_ranges(n, k)
    lane_recs = [records[s : s + ln] for s, ln in ranges]
    states = [codec.init_state() for _ in range(k)]
    intervals: list[list[tuple[int, int]]] = [[] for _ in range(k)]
    t_steps = max((ln for _, ln in ranges), default=0)

    for t in range(t_steps):
        partials = [None] * k
        for lane in range(k):
            if t < len(lane_recs[lane]):
                partials[lane] = lane_recs[lane][t]
        for j in range(codec.n_substeps):
            updates = []
            for lane in range(k):
                rec = partials[lane]
                if rec is None:
                    continue
                ks = codec.enc_symbol(j, rec, states[lane])
                if ks is None:
                    continue
                kind, row, sym = ks
                cum, freq = tables[kind].interval(row, sym)
                intervals[lane].append((cum, freq))
                updates.append((kind, row, sym))
                if _trace._ACTIVE:
                    _trace.emit(t, j, lane, kind, row, sym, cum, freq)
            _apply_updates(tables, updates)
        for lane in range(k):
            if partials[lane] is not None:
                states[lane] = codec.enc_next_state(partials[lane], states[lane])

    blobs = []
    for lane in range(k):
        if not intervals[lane]:
            blobs.append(b"")
            continue
        enc = RansEncoder()
        for cum, freq in reversed(intervals[lane]):
            enc.put(cum, freq)
        blobs.append(enc.bytes_out())
    return blobs


def decode_section(
    blobs: Sequence[bytes], n_records: int, k: int, tables: TableSet, codec: RecordCodec
) -> list:
    """Decode K lane blobs back into the global record list."""
    ranges = lane_ranges(n_records, k)
    decs: list[Optional[RansDecoder]] = [
        RansDecoder(b) if ln > 0 else None for b, (_, ln) in zip(blobs, ranges)
    ]
    states = [codec.init_state() for _ in range(k)]
    lane_out: list[list] = [[] for _ in range(k)]
    t_steps = max((ln for _, ln in ranges), default=0)

    for t in range(t_steps):
        partials: list[Optional[list]] = [
            [] if t < ranges[lane][1] else None for lane in range(k)
        ]
        for j in range(codec.n_substeps):
            updates = []
            pending = []
            for lane in range(k):
                if partials[lane] is None:
                    continue
                ctx = codec.dec_context(j, partials[lane], states[lane])
                if ctx is None:
                    partials[lane].append(None)
                    continue
                kind, row = ctx
                dec = decs[lane]
                sym, cum, freq = tables[kind].lookup(row, dec.get())
                partials[lane].append(sym)
                pending.append((lane, cum, freq))
                updates.append((kind, row, sym))
                if _trace._ACTIVE:
                    _trace.emit(t, j, lane, kind, row, sym, cum, freq)
            # rANS advance may happen after lookups; order within a sub-step
            # does not matter (independent lanes)
            for lane, cum, freq in pending:
                decs[lane].advance(cum, freq)
            _apply_updates(tables, updates)
        for lane in range(k):
            if partials[lane] is not None:
                rec, states[lane] = codec.dec_record(partials[lane], states[lane])
                lane_out[lane].append(rec)

    out: list = []
    for lane in range(k):
        out.extend(lane_out[lane])
    return out


def _apply_updates(tables: TableSet, updates: list[tuple[str, int, int]]) -> None:
    by_kind: dict[str, list[tuple[int, int]]] = {}
    for kind, row, sym in updates:
        by_kind.setdefault(kind, []).append((row, sym))
    for kind, rows_syms in by_kind.items():
        tables[kind].update_batch(rows_syms)
