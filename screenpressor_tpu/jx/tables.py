"""BSAC adaptive tables — JAX implementation (SPTC3 semantics).

State is a pytree {kind: {"cnt" [R, A], "cntsum" [R], ["gcnt" [A],
"gsum" []]}} of int32 arrays (the g-entries exist for mixed kinds,
config.MIX_KINDS). Semantics must match `spec/tables.py` exactly
(FORMAT.md "Adaptive tables"): the live counts are the coding
distribution; rescale scales them back up to `PROB_SCALE - step - A`
(scale-to-fill); mixed kinds add a per-kind global row scaled at coding
time to fill the code space the context row leaves unused (dynamic
backoff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from screenpressor_tpu.config import (
    MIX_ESC_C,
    PROB_SCALE,
    STEP,
    TABLE_KINDS,
    kind_gstep,
    kind_mixed,
)


def renew_table(rows: int, alphabet: int, step: int = STEP,
                name: str = "") -> dict:
    # init strictly below the rescale threshold (see spec.tables.Table.renew)
    if kind_mixed(name):
        # escalating-weight rows start EMPTY (config.MIX_ESC_C)
        gstep = kind_gstep(name)
        g = max((PROB_SCALE - gstep - alphabet) // alphabet, 1)
        return {
            "cnt": jnp.zeros((rows, alphabet), jnp.int32),
            "cntsum": jnp.zeros((rows,), jnp.int32),
            "gcnt": jnp.full((alphabet,), g, jnp.int32),
            "gsum": jnp.asarray(g * alphabet, jnp.int32),
        }
    f = max((PROB_SCALE - step - alphabet) // alphabet, 1)
    cnt = jnp.full((rows, alphabet), f, jnp.int32)
    cntsum = jnp.full((rows,), f * alphabet, jnp.int32)
    return {"cnt": cnt, "cntsum": cntsum}


def renew_tables(kinds=TABLE_KINDS) -> dict:
    from screenpressor_tpu.config import kind_step

    return {
        name: renew_table(r, a, kind_step(name), name)
        for name, (r, a) in kinds.items()
    }


_RENEW_CACHE: dict = {}


def renew_tables_cached() -> dict:
    """Shared renewed-tables pytree (host call sites only).

    Table state is immutable (every update builds new arrays), so all
    sessions can alias one renewed pytree. Host paths call renew on every
    I/flat frame; building it fresh costs ~2 device ops per table kind,
    which dominates small-frame encode on dispatch-latency-bound rigs
    (~3 ms/op over the TPU tunnel). Keyed by backend so CPU tests and TPU
    benches in one process don't share arrays across platforms."""
    key = jax.default_backend()
    tabs = _RENEW_CACHE.get(key)
    if tabs is None:
        tabs = renew_tables()
        _RENEW_CACHE[key] = tabs
    return tabs


def effective_rows(tab: dict, rows: jnp.ndarray) -> jnp.ndarray:
    """[K, A] effective coding distribution for gathered context rows.

    Non-mixed kinds: the live counts. Mixed kinds (escalating backoff,
    spec.tables.Table._eff): the row's counts scaled to a fill target that
    grows with its observation mass, plus the global row scaled into the
    remaining space."""
    g = tab["cnt"][rows]  # [K, A]
    if "gcnt" not in tab:
        return g
    alphabet = tab["cnt"].shape[1]
    s_obs = tab["cntsum"][rows]  # [K]
    target = ((PROB_SCALE - 2 * alphabet) * s_obs) // (s_obs + MIX_ESC_C)
    sc_r = (target << 13) // jnp.maximum(s_obs, 1)
    row_eff = (g * sc_r[:, None]) >> 13
    spare = (PROB_SCALE - alphabet) - row_eff.sum(axis=1)
    sc = (spare << 13) // jnp.maximum(tab["gsum"], 1)
    g_eff = jnp.maximum((tab["gcnt"][None, :] * sc[:, None]) >> 13, 1)
    return row_eff + g_eff


def update_batch(tab: dict, rows: jnp.ndarray, syms: jnp.ndarray, active: jnp.ndarray,
                 step: int = STEP, gstep: int = 0) -> dict:
    """One sub-step's batched update for one table kind.

    rows/syms: [K] int32 (garbage allowed where inactive); active: [K] bool.
    Mirrors `spec.tables.Table.update_batch` + `_rescale` (incl. the global
    row of mixed kinds).
    """
    alphabet = tab["cnt"].shape[1]
    rows = jnp.where(active, rows, 0)
    syms = jnp.where(active, syms, 0)
    add = jnp.where(active, step, 0).astype(jnp.int32)
    cnt = tab["cnt"].at[rows, syms].add(add)
    cntsum = tab["cntsum"].at[rows].add(add)

    # Rescale candidate rows. `need` must be a pure per-row predicate (NOT
    # masked by `active`): inactive lanes are parked on row 0, and duplicate
    # scatter writers to one row must all compute identical values or the
    # write-back order becomes observable. A row no active lane touched can
    # never be above threshold (post-rescale cntsum <= target < threshold),
    # so parked lanes never trigger a spurious rescale.
    need = cntsum[rows] > PROB_SCALE - step
    target = PROB_SCALE - step - alphabet
    c = cnt[rows]  # [K, A]
    s = cntsum[rows]
    sc = (target << 13) // jnp.maximum(s, 1)
    new_cnt = jnp.maximum((c * sc[:, None]) >> 13, 1)
    nd = need[:, None]
    cnt = cnt.at[rows].set(jnp.where(nd, new_cnt, c))
    cntsum = cntsum.at[rows].set(jnp.where(need, new_cnt.sum(axis=1), s))
    out = {"cnt": cnt, "cntsum": cntsum}
    if "gcnt" in tab:
        gadd = jnp.where(active, gstep, 0).astype(jnp.int32)
        gcnt = tab["gcnt"].at[syms].add(gadd)
        gsum = tab["gsum"] + gadd.sum()
        gneed = gsum > PROB_SCALE - gstep
        gtarget = PROB_SCALE - gstep - alphabet
        gsc = (gtarget << 13) // jnp.maximum(gsum, 1)
        gnew = jnp.maximum((gcnt * gsc) >> 13, 1)
        out["gcnt"] = jnp.where(gneed, gnew, gcnt)
        out["gsum"] = jnp.where(gneed, gnew.sum(), gsum)
    return out
