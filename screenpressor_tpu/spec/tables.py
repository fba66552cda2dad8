"""BSAC adaptive tables — numpy specification (SPTC2 live-count semantics).

Batched-synchronous shared adaptive contexts (FORMAT.md "Adaptive tables").
Reference analog: `FixedSizeRansCtx<N>` (`ans_contexts.h:1053-1132`) — fixed
alphabet, count/step adaptation — generalized to a batched update so K lanes
code against one table set in lockstep.

SPTC2 revision (round 2): the live counts ARE the coding distribution
(`freq[c] = cnt[c]`, `cum = exclusive prefix(cnt)` computed at coding time),
and rescale scales counts back up to fill the code space
(`target = PROB_SCALE - step - A`) instead of bare halving. This removes the
snapshot arrays (freq/cum) — halving table state and device scatter traffic —
and fixes the round-1 ratio leak where a freshly-halved snapshot coded with
only ~half of the 2^PROB_BITS code space (~up to 1 bit/symbol).
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu.config import (
    PROB_SCALE,
    STEP,
    TABLE_KINDS,
)


class Table:
    """One table kind: `rows` contexts over alphabet `A`."""

    def __init__(self, rows: int, alphabet: int, step: int = STEP) -> None:
        self.rows = rows
        self.A = alphabet
        self.step = step
        assert PROB_SCALE - step - alphabet > 0, (step, alphabet)
        self.cnt = np.zeros((rows, alphabet), np.int32)
        self.cntsum = np.zeros((rows,), np.int32)
        self.renew()

    def renew(self) -> None:
        # init strictly below the rescale threshold: an untouched row must
        # never satisfy the trigger (the batched implementations evaluate the
        # per-row predicate for parked lanes too)
        f = max((PROB_SCALE - self.step - self.A) // self.A, 1)
        self.cnt[:] = f
        self.cntsum[:] = f * self.A

    # -- coding ------------------------------------------------------------

    def interval(self, row: int, sym: int) -> tuple[int, int]:
        c = self.cnt[row]
        return int(c[:sym].sum()), int(c[sym])

    def lookup(self, row: int, some_freq: int) -> tuple[int, int, int]:
        """someFreq -> (symbol, cum, freq). Last slot absorbs the unused tail."""
        cum = np.cumsum(self.cnt[row]) - self.cnt[row]
        c = int(np.searchsorted(cum, some_freq, side="right")) - 1
        return c, int(cum[c]), int(self.cnt[row, c])

    # -- batched update ----------------------------------------------------

    def update_batch(self, rows_syms: list[tuple[int, int]]) -> None:
        """Apply one sub-step's updates for all active lanes, then rescale
        every row that crossed the threshold (scale-to-fill)."""
        if not rows_syms:
            return
        rs = np.asarray([r for r, _ in rows_syms], np.int64)
        ss = np.asarray([s for _, s in rows_syms], np.int64)
        np.add.at(self.cnt, (rs, ss), self.step)
        np.add.at(self.cntsum, rs, self.step)
        for r in np.unique(rs):
            if self.cntsum[r] > PROB_SCALE - self.step:
                self._rescale(int(r))

    def _rescale(self, r: int) -> None:
        target = PROB_SCALE - self.step - self.A
        sc = (target << 13) // int(self.cntsum[r])
        c = np.maximum((self.cnt[r] * sc) >> 13, 1)
        self.cnt[r] = c
        self.cntsum[r] = c.sum()


class TableSet:
    """All table kinds for one stream direction (encoder or decoder)."""

    def __init__(self, kinds=TABLE_KINDS) -> None:
        from screenpressor_tpu.config import kind_step

        self.tables = {
            name: Table(rows, a, kind_step(name)) for name, (rows, a) in kinds.items()
        }

    def __getitem__(self, name: str) -> Table:
        return self.tables[name]

    def renew(self) -> None:
        for t in self.tables.values():
            t.renew()
