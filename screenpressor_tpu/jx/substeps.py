"""The ONE substep description of every record codec (format-normative).

Both the lax.scan coder (`jx/coder.py`) and the Pallas section kernels
(`jx/kernels.py`) execute the same per-record schedule: for each sub-step j
of a record, derive a (table kind, dynamic row) pair and a symbol from the
record fields and the lane state, then advance the lane state. Before
round 4 the two layers each carried their own copy of these schedules and
had to be kept in lockstep by hand on every format change (VERDICT r3 #6 /
BACKLOG 13). This module is now the single home; the layers differ only in
array shape ([K] lane vectors in the scan coder, [K, 1] lane columns in the
kernels), and every operation here is elementwise, so one implementation
serves both.

Interface (shape-polymorphic; `rec`/`partial` are LISTS of per-field lane
arrays, `state` is a TUPLE of lane arrays):
  kinds          — table kind per sub-step (config.TABLE_KINDS keys)
  rec_width      — record field count
  init_state(z)  — state tuple from a zero lane array `z`
  enc_syms(j, rec, state)    -> (row, sym, extra_active | None)
  dec_row(j, partial, state) -> (row, extra_active | None)
  dec_finish(partial, state, active) -> (rec_list, new_state)
  enc_next_state(rec, state, active) -> new_state
`extra_active` gates conditional sub-steps (e.g. MV components after the
same-as-previous flag); `active` masks state advancement for padded lanes.

Reference analog: the per-kind encode/decode context methods of `UseRC` /
`UseANS` (`screencap.h:105-422`) — the schedule of which model codes which
symbol, which both reference coders also share.
"""

from __future__ import annotations

import jax.numpy as jnp

from screenpressor_tpu.config import MV_OFFSET


def _where(c, a, b):
    return jnp.where(c, a, b)


class Rec:
    """(ptype, run): ptype conditioned on the lane's previous ptype; the
    run length (n-1) conditioned on the ptype."""

    name = "rec"
    kinds = ("ptype", "nrun")
    rec_width = 2

    def init_state(self, z):
        return (z,)

    def enc_syms(self, j, rec, state):
        if j == 0:
            return state[0], rec[0], None
        return rec[0], rec[1] - 1, None

    def dec_row(self, j, partial, state):
        return (state[0] if j == 0 else partial[0]), None

    def dec_finish(self, partial, state, active):
        rec = [partial[0], partial[1] + 1]
        return rec, (_where(active, partial[0], state[0]),)

    def enc_next_state(self, rec, state, active):
        return (_where(active, rec[0], state[0]),)


class Col:
    """RGB literal triples with the stream-local context chain
    (FORMAT.md "Color context"): R | (prevG, prevB), G | (prevB, R),
    B | (R, G); each plane's rows live in its own COLOR_CTX_ROWS window."""

    name = "col"
    kinds = ("color", "color", "color")
    rec_width = 3

    @staticmethod
    def sub_base(j):
        from screenpressor_tpu.config import COLOR_CTX_ROWS

        return j * COLOR_CTX_ROWS

    def init_state(self, z):
        return (z, z)  # (prevg, prevb)

    def _row(self, j, parts, state):
        from screenpressor_tpu.config import COLOR_CTX_ROWS, color_ctx

        prevg, prevb = state
        if j == 0:
            return color_ctx(prevg, prevb)
        if j == 1:
            return COLOR_CTX_ROWS + color_ctx(prevb, parts[0])
        return 2 * COLOR_CTX_ROWS + color_ctx(parts[0], parts[1])

    def enc_syms(self, j, rec, state):
        return self._row(j, rec, state), rec[j], None

    def dec_row(self, j, partial, state):
        return self._row(j, partial, state), None

    def dec_finish(self, partial, state, active):
        new = (partial[1], partial[2])
        return list(partial), tuple(
            _where(active, n, s) for n, s in zip(new, state)
        )

    def enc_next_state(self, rec, state, active):
        new = (rec[1], rec[2])
        return tuple(_where(active, n, s) for n, s in zip(new, state))


class BT:
    """(block type, run): both on fixed rows."""

    name = "bt"
    kinds = ("bt", "btn")
    rec_width = 2

    def init_state(self, z):
        return (z,)

    def enc_syms(self, j, rec, state):
        zero = jnp.zeros_like(state[0])
        return (zero, rec[0], None) if j == 0 else (zero, rec[1] - 1, None)

    def dec_row(self, j, partial, state):
        return jnp.zeros_like(state[0]), None

    def dec_finish(self, partial, state, active):
        return [partial[0], partial[1] + 1], state

    def enc_next_state(self, rec, state, active):
        return state


class Sxy:
    """Sub-rect coordinates: component i on row i."""

    name = "sxy"
    kinds = ("sxy", "sxy", "sxy", "sxy")
    rec_width = 4

    def init_state(self, z):
        return (z,)

    def enc_syms(self, j, rec, state):
        return jnp.full_like(state[0], j), rec[j], None

    def dec_row(self, j, partial, state):
        return jnp.full_like(state[0], j), None

    def dec_finish(self, partial, state, active):
        return list(partial), state

    def enc_next_state(self, rec, state, active):
        return state


class MV:
    """(mx, my) with the lane-local same-as-previous flag; the component
    sub-steps are conditional on the flag (reference: v3+'s same-MV bit,
    screencap.cpp:1199-1213, made lane-local)."""

    name = "mv"
    kinds = ("mvflag", "mv", "mv")
    rec_width = 2

    def init_state(self, z):
        return (z, z)  # last (mx, my)

    def enc_syms(self, j, rec, state):
        same = (rec[0] == state[0]) & (rec[1] == state[1])
        if j == 0:
            return jnp.zeros_like(state[0]), same.astype(jnp.int32), None
        return jnp.full_like(state[0], j - 1), rec[j - 1] + MV_OFFSET, ~same

    def dec_row(self, j, partial, state):
        if j == 0:
            return jnp.zeros_like(state[0]), None
        skip = partial[0] == 1
        return jnp.full_like(state[0], j - 1), ~skip

    def dec_finish(self, partial, state, active):
        same = partial[0] == 1
        mx = _where(same, state[0], partial[1] - MV_OFFSET)
        my = _where(same, state[1], partial[2] - MV_OFFSET)
        return [mx, my], (
            _where(active, mx, state[0]),
            _where(active, my, state[1]),
        )

    def enc_next_state(self, rec, state, active):
        return (
            _where(active, rec[0], state[0]),
            _where(active, rec[1], state[1]),
        )


class ColW(Col):
    """Encoder-internal compact-color variant of `Col` (NOT a format
    change): the records carry 3 extra fields — this section's color rows
    remapped into a compact touched-row table built by
    `jx.coder.color_compact_sections`. The coding distributions, and
    therefore the emitted bytes, are identical to `Col` over the full
    table; only the table indexing is re-parameterized so the section
    kernels' per-substep gather/scatter touches `compact_rows` rows
    instead of the full COLOR_CTX_ROWS window. Encode-only: decoders
    always run `Col` (rows are data-dependent on decoded symbols)."""

    kinds = ("color", "color", "color")
    rec_width = 6
    compact_rows = 0  # static compact-table rows; set per registered variant

    @staticmethod
    def sub_base(j):
        return 0

    def init_state(self, z):
        return ()

    def enc_syms(self, j, rec, state):
        return rec[3 + j], rec[j], None

    def enc_next_state(self, rec, state, active):
        return ()

    def dec_row(self, j, partial, state):
        raise NotImplementedError("colw is encode-only; decoders use 'col'")

    def dec_finish(self, partial, state, active):
        raise NotImplementedError("colw is encode-only; decoders use 'col'")


SUBSTEP_CODECS = {"rec": Rec(), "col": Col(), "bt": BT(), "sxy": Sxy(),
                  "mv": MV()}


def _register_colw():
    from screenpressor_tpu.config import COL_COMPACT_BUCKETS

    for wrows in COL_COMPACT_BUCKETS:
        cls = type(
            f"ColW{wrows}", (ColW,),
            {"name": f"colw{wrows}", "compact_rows": wrows},
        )
        SUBSTEP_CODECS[f"colw{wrows}"] = cls()


_register_colw()
