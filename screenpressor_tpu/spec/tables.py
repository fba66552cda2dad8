"""BSAC adaptive tables — numpy specification.

Batched-synchronous shared adaptive contexts (FORMAT.md "Adaptive tables").
Reference analog: `FixedSizeRansCtx<N>` (`ans_contexts.h:1053-1132`) — fixed
alphabet, count/step adaptation, halving rescale — generalized to a batched
update so K lanes can code against one table set in lockstep.
"""

from __future__ import annotations

import numpy as np

from screenpressor_tpu.config import (
    INIT_CNT_SHIFT,
    PROB_SCALE,
    RESCALE_PASSES,
    STEP,
    TABLE_KINDS,
)


class Table:
    """One table kind: `rows` contexts over alphabet `A`."""

    def __init__(self, rows: int, alphabet: int, step: int = STEP) -> None:
        self.rows = rows
        self.A = alphabet
        self.step = step
        self.freq = np.zeros((rows, alphabet), np.int32)
        self.cum = np.zeros((rows, alphabet), np.int32)
        self.cnt = np.zeros((rows, alphabet), np.int32)
        self.cntsum = np.zeros((rows,), np.int32)
        self.renew()

    def renew(self) -> None:
        f = PROB_SCALE // self.A
        self.freq[:] = f
        self.cum[:] = np.arange(self.A, dtype=np.int32) * f
        self.cnt[:] = max(f >> INIT_CNT_SHIFT, 1)
        self.cntsum[:] = self.cnt[0].sum()

    # -- coding ------------------------------------------------------------

    def interval(self, row: int, sym: int) -> tuple[int, int]:
        return int(self.cum[row, sym]), int(self.freq[row, sym])

    def lookup(self, row: int, some_freq: int) -> tuple[int, int, int]:
        """someFreq -> (symbol, cum, freq). Last slot absorbs the unused tail."""
        c = int(np.searchsorted(self.cum[row], some_freq, side="right")) - 1
        return c, int(self.cum[row, c]), int(self.freq[row, c])

    # -- batched update ----------------------------------------------------

    def update_batch(self, rows_syms: list[tuple[int, int]]) -> None:
        """Apply one sub-step's updates for all active lanes, then rescale
        every touched row that crossed the threshold."""
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
        c = self.cnt[r].copy()
        for _ in range(RESCALE_PASSES):
            if c.sum() > PROB_SCALE:
                c = np.maximum(c >> 1, 1)
        self.freq[r] = c
        self.cum[r] = np.concatenate(([0], np.cumsum(c)[:-1]))
        self.cnt[r] = np.maximum(c - (c >> 1), 1)
        self.cntsum[r] = self.cnt[r].sum()


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
