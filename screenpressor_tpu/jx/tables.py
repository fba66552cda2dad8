"""BSAC adaptive tables — JAX implementation.

State is a pytree {kind: {"freq", "cum", "cnt", "cntsum"}} of int32 arrays.
Semantics must match `spec/tables.py` exactly (FORMAT.md "Adaptive tables").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from screenpressor_tpu.config import (
    INIT_CNT_SHIFT,
    PROB_SCALE,
    RESCALE_PASSES,
    STEP,
    TABLE_KINDS,
)


def renew_table(rows: int, alphabet: int) -> dict:
    f = PROB_SCALE // alphabet
    c0 = max(f >> INIT_CNT_SHIFT, 1)
    freq = jnp.full((rows, alphabet), f, jnp.int32)
    cum = jnp.tile(jnp.arange(alphabet, dtype=jnp.int32) * f, (rows, 1))
    cnt = jnp.full((rows, alphabet), c0, jnp.int32)
    cntsum = jnp.full((rows,), c0 * alphabet, jnp.int32)
    return {"freq": freq, "cum": cum, "cnt": cnt, "cntsum": cntsum}


def renew_tables(kinds=TABLE_KINDS) -> dict:
    return {name: renew_table(r, a) for name, (r, a) in kinds.items()}


def update_batch(tab: dict, rows: jnp.ndarray, syms: jnp.ndarray, active: jnp.ndarray,
                 step: int = STEP) -> dict:
    """One sub-step's batched update for one table kind.

    rows/syms: [K] int32 (garbage allowed where inactive); active: [K] bool.
    Mirrors `spec.tables.Table.update_batch` + `_rescale`.
    """
    rows = jnp.where(active, rows, 0)
    syms = jnp.where(active, syms, 0)
    add = jnp.where(active, step, 0).astype(jnp.int32)
    cnt = tab["cnt"].at[rows, syms].add(add)
    cntsum = tab["cntsum"].at[rows].add(add)

    # Rescale candidate rows. `need` must be a pure per-row predicate (NOT
    # masked by `active`): inactive lanes are parked on row 0, and duplicate
    # scatter writers to one row must all compute identical values or the
    # write-back order becomes observable. A row no active lane touched can
    # never be above threshold (post-rescale cntsum <= PROB_SCALE/2 + A),
    # so parked lanes never trigger a spurious rescale.
    need = cntsum[rows] > PROB_SCALE - step
    c = cnt[rows]  # [K, A]
    for _ in range(RESCALE_PASSES):
        over = c.sum(axis=1) > PROB_SCALE
        c = jnp.where(over[:, None], jnp.maximum(c >> 1, 1), c)
    new_freq = c
    new_cum = jnp.cumsum(c, axis=1) - c
    new_cnt = jnp.maximum(c - (c >> 1), 1)
    new_cntsum = new_cnt.sum(axis=1)

    nd = need[:, None]
    freq = tab["freq"].at[rows].set(jnp.where(nd, new_freq, tab["freq"][rows]))
    cum = tab["cum"].at[rows].set(jnp.where(nd, new_cum, tab["cum"][rows]))
    cnt = cnt.at[rows].set(jnp.where(nd, new_cnt, cnt[rows]))
    cntsum = cntsum.at[rows].set(jnp.where(need, new_cntsum, cntsum[rows]))
    return {"freq": freq, "cum": cum, "cnt": cnt, "cntsum": cntsum}
