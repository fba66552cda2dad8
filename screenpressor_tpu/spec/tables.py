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

import os

import numpy as np

from screenpressor_tpu.config import (
    PROB_SCALE,
    STEP,
    TABLE_KINDS,
)

# --- SPTC3 dynamic-backoff mixing (see config.MIX_KINDS for the scheme) ---
# SPTC_MIX / SPTC_MIX_KINDS / SPTC_MIX_ROW_INIT / SPTC_MIX_GSTEP override the
# format defaults for experiments (spec path only).
_MIX_ENV = os.environ.get("SPTC_MIX")
_MIX_KINDS_ENV = os.environ.get("SPTC_MIX_KINDS")
_MIX_ROW_INIT = int(
    os.environ.get("SPTC_MIX_ROW_INIT", "0")
) or None
_MIX_GSTEP = int(os.environ.get("SPTC_MIX_GSTEP", "0"))  # 0 -> kind gstep
# two-level backoff experiment: row -> group (row >> SPTC_MIX2 bits) ->
# global, with the spare code space split between the two priors
_MIX2 = int(os.environ.get("SPTC_MIX2", "0"))  # 0 off; else group shift
# escalating row weight (SPTC3 default; see config.MIX_ESC_C):
# SPTC_MIX_ESC overrides C for experiments; "0" disables (legacy one-level
# spare-filling backoff with rows initialized at MIX_ROW_INIT or 1).
_MIX_ESC_ENV = os.environ.get("SPTC_MIX_ESC")
# seen-set escalation experiments (VERDICT r3 #3: the decode-affordable
# analog of the reference's escalating per-context alphabets,
# ans_contexts.h:98-160). SPTC_MIX_GATE grammar: "g" masks the global
# backoff to the row's UNSEEN symbols (seen symbols are priced by row
# counts alone, floor 1); "dN" scales the escalation constant by the row's
# distinct-symbol count (C_eff = clip(C * d / N, 1, C)) so a small-alphabet
# row takes nearly the whole code space after a handful of hits; "gdN"
# combines both.
_MIX_GATE_ENV = os.environ.get("SPTC_MIX_GATE", "")


def _esc_c() -> int:
    from screenpressor_tpu.config import MIX_ESC_C

    if _MIX_ESC_ENV is not None:
        return int(_MIX_ESC_ENV)
    return MIX_ESC_C


def _kind_mixed(name: str) -> bool:
    from screenpressor_tpu.config import kind_mixed

    if _MIX_ENV is not None and not int(_MIX_ENV):
        return False
    if _MIX_KINDS_ENV is not None:
        return name in _MIX_KINDS_ENV.split(",")
    if _MIX_ENV is not None and int(_MIX_ENV):
        return name in ("color", "nrun")
    return kind_mixed(name)


class Table:
    """One table kind: `rows` contexts over alphabet `A`.

    Mixed kinds carry `n_globals` global rows; context row r backs off to
    global row `r // (rows // n_globals)` (for the color kind that is the
    plane: each plane's literal distribution differs, and the plane index
    is static per substep so kernels address it with a static offset)."""

    def __init__(self, rows: int, alphabet: int, step: int = STEP,
                 name: str = "", n_globals: int = 1) -> None:
        from screenpressor_tpu.config import MIX_ROW_INIT, kind_gstep

        self.rows = rows
        self.A = alphabet
        self.step = step
        self.mix = _kind_mixed(name)
        assert PROB_SCALE - step - alphabet > 0, (step, alphabet)
        self.cnt = np.zeros((rows, alphabet), np.int32)
        self.cntsum = np.zeros((rows,), np.int32)
        if self.mix:
            self.esc_c = _esc_c()
            self.gate_g = "g" in _MIX_GATE_ENV
            self.gate_d = (
                int(_MIX_GATE_ENV.split("d", 1)[1])
                if "d" in _MIX_GATE_ENV else 0
            )
            self.row_init = _MIX_ROW_INIT or MIX_ROW_INIT
            self.gstep = _MIX_GSTEP or kind_gstep(name)
            self.n_globals = n_globals
            self.g_rows = rows // n_globals
            self.gcnt = np.zeros((n_globals, alphabet), np.int32)
            self.gsum = np.zeros((n_globals,), np.int32)
            self.mix2 = _MIX2 if (name == "color" and _MIX2) else 0
            if self.mix2:
                ng = rows >> self.mix2
                self.g2cnt = np.zeros((ng, alphabet), np.int32)
                self.g2sum = np.zeros((ng,), np.int32)
        self.renew()

    def renew(self) -> None:
        # init strictly below the rescale threshold: an untouched row must
        # never satisfy the trigger (the batched implementations evaluate the
        # per-row predicate for parked lanes too)
        if self.mix:
            f = 0 if self.esc_c else max(self.row_init, 1)
            g = max((PROB_SCALE - self.gstep - self.A) // self.A, 1)
            self.gcnt[:] = g
            self.gsum[:] = g * self.A
            if getattr(self, "mix2", 0):
                self.g2cnt[:] = max(f, 1)
                self.g2sum[:] = max(f, 1) * self.A
        else:
            f = max((PROB_SCALE - self.step - self.A) // self.A, 1)
        self.cnt[:] = f
        self.cntsum[:] = f * self.A

    # -- coding ------------------------------------------------------------

    def _eff(self, row: int) -> np.ndarray:
        c = self.cnt[row]
        if not self.mix:
            return c
        gi = row // self.g_rows
        if self.esc_c:
            s_obs = int(self.cntsum[row])
            c_eff = self.esc_c
            if self.gate_d:
                d = int((c > 0).sum())
                c_eff = min(max((self.esc_c * d) // self.gate_d, 1), self.esc_c)
            target = ((PROB_SCALE - 2 * self.A) * s_obs) // (s_obs + c_eff)
            sc_r = (target << 13) // max(s_obs, 1)
            row_eff = (c.astype(np.int64) * sc_r) >> 13
            spare = (PROB_SCALE - self.A) - int(row_eff.sum())
            if self.gate_g:
                unseen = c == 0
                gsrc = self.gcnt[gi].astype(np.int64) * unseen
                gs = int(gsrc.sum())
                if gs > 0:
                    sc = (spare << 13) // gs
                    g_eff = np.where(
                        unseen, np.maximum((gsrc * sc) >> 13, 1), 0)
                    return np.maximum(row_eff + g_eff, 1).astype(np.int32)
                return np.maximum(row_eff, 1).astype(np.int32)
            sc = (spare << 13) // int(self.gsum[gi])
            g_eff = np.maximum((self.gcnt[gi].astype(np.int64) * sc) >> 13, 1)
            return (row_eff + g_eff).astype(np.int32)
        if getattr(self, "mix2", 0):
            # row -> group -> global: the group prior (rows sharing the
            # high context bits) offers min(its mass, the row's spare) —
            # never scaled UP, so a cold group adds nothing; the global
            # fills whatever space remains
            g2i = row >> self.mix2
            room = max((PROB_SCALE - 2 * self.A) - int(self.cntsum[row]), 0)
            sc2 = min((room << 13) // max(int(self.g2sum[g2i]), 1), 1 << 13)
            grp = np.maximum((self.g2cnt[g2i] * sc2) >> 13, 1)
            used = int(self.cntsum[row]) + int(grp.sum())
            spare = max((PROB_SCALE - self.A) - used, 0)
            sc = (spare << 13) // int(self.gsum[gi])
            g_eff = np.maximum((self.gcnt[gi] * sc) >> 13, 1)
            return c + grp + g_eff
        spare = max((PROB_SCALE - self.A) - int(self.cntsum[row]), 0)
        sc = (spare << 13) // int(self.gsum[gi])
        g_eff = np.maximum((self.gcnt[gi] * sc) >> 13, 1)
        return c + g_eff

    def interval(self, row: int, sym: int) -> tuple[int, int]:
        eff = self._eff(row)
        return int(eff[:sym].sum()), int(eff[sym])

    def lookup(self, row: int, some_freq: int) -> tuple[int, int, int]:
        """someFreq -> (symbol, cum, freq). Last slot absorbs the unused tail."""
        eff = self._eff(row)
        cum = np.cumsum(eff) - eff
        c = int(np.searchsorted(cum, some_freq, side="right")) - 1
        return c, int(cum[c]), int(eff[c])

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
        if self.mix:
            gs = rs // self.g_rows
            np.add.at(self.gcnt, (gs, ss), self.gstep)
            np.add.at(self.gsum, gs, self.gstep)
            for gi in np.unique(gs):
                if self.gsum[gi] > PROB_SCALE - self.gstep:
                    target = PROB_SCALE - self.gstep - self.A
                    sc = (target << 13) // int(self.gsum[gi])
                    g = np.maximum((self.gcnt[gi] * sc) >> 13, 1)
                    self.gcnt[gi] = g
                    self.gsum[gi] = int(g.sum())
            if getattr(self, "mix2", 0):
                g2s = rs >> self.mix2
                np.add.at(self.g2cnt, (g2s, ss), self.step)
                np.add.at(self.g2sum, g2s, self.step)
                for gi in np.unique(g2s):
                    if self.g2sum[gi] > PROB_SCALE - self.step:
                        target = PROB_SCALE - self.step - self.A
                        sc = (target << 13) // int(self.g2sum[gi])
                        g = np.maximum((self.g2cnt[gi] * sc) >> 13, 1)
                        self.g2cnt[gi] = g
                        self.g2sum[gi] = int(g.sum())

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

        from screenpressor_tpu.config import kind_globals

        self.tables = {
            name: Table(rows, a, kind_step(name), name=name,
                        n_globals=kind_globals(name))
            for name, (rows, a) in kinds.items()
        }

    def __getitem__(self, name: str) -> Table:
        return self.tables[name]

    def renew(self) -> None:
        for t in self.tables.values():
            t.renew()
