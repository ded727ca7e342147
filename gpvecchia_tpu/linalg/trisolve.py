"""Level-scheduled sparse triangular solves on the V factor (JAX).

V is lower-triangular in reversed ordering, stored column-wise (v_flat,
diag-first per column).  The host precomputes dependency levels and buckets
consecutive levels of similar width (plan.py); within a level all unknowns
are independent, so each level is one batched gather -> reduce ->
unique-write step and each bucket one lax.scan (compile time scales with
#buckets, not #levels).  Both directions are pure gather formulations:

  forward  (V x = b):  x_j = (b_j - sum_k V[j,k] x_k) / V[j,j]  over row j
  backward (V^T x = b): x_j = (b_j - sum_i V[i,j] x_i) / V[j,j] over col j

Replaces the reference's Matrix::solve triangular solves
(/root/reference/R/vecchia_likelihood.R:88, R/vecchia_prediction.R:122-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sparse import gather0, scatter_set_unique

__all__ = ["forward_solve", "backward_solve"]


def _as_tuple(blk, names):
    """Accept either a plan dataclass or an already-converted tuple."""
    if isinstance(blk, (tuple, list)):
        return tuple(blk)
    return tuple(getattr(blk, n) for n in names)


def _scan_levels(body, carry, xs_raw):
    xs = jax.tree.map(jnp.asarray, xs_raw)
    if xs[0].shape[0] == 1:
        carry, _ = body(carry, jax.tree.map(lambda a: a[0], xs))
        return carry
    carry, _ = jax.lax.scan(body, carry, xs)
    return carry


def forward_solve(v_flat, b, blocks):
    """Solve V x = b (V lower triangular, columns of v_flat)."""

    def body(x, xs):
        cols, dslots, rslots, rcols = xs
        ok = cols >= 0
        if rslots.shape[-1] > 0:
            vv = gather0(v_flat, rslots)
            xx = x[jnp.clip(rcols, 0)]
            dot = jnp.sum(vv * xx, axis=-1)
        else:
            dot = 0.0
        diag = jnp.where(ok, v_flat[jnp.clip(dslots, 0)], 1.0)
        xj = (b[jnp.clip(cols, 0)] - dot) / diag
        return scatter_set_unique(x, cols, xj), None

    x = jnp.zeros_like(b)
    for blk in blocks:
        x = _scan_levels(body, x, _as_tuple(
            blk, ("cols", "diag_slots", "row_slots", "row_cols")))
    return x


def backward_solve(v_flat, b, blocks):
    """Solve V^T x = b."""

    def body(x, xs):
        cols, slots, rows = xs
        ok = cols >= 0
        vals = gather0(v_flat, slots)
        if vals.shape[-1] > 1:
            xr = jnp.where(slots[..., 1:] >= 0,
                           x[jnp.clip(rows[..., 1:], 0)], 0.0)
            dot = jnp.sum(vals[..., 1:] * xr, axis=-1)
        else:
            dot = 0.0
        diag = jnp.where(ok, vals[..., 0], 1.0)
        xj = (b[jnp.clip(cols, 0)] - dot) / diag
        return scatter_set_unique(x, cols, xj), None

    x = jnp.zeros_like(b)
    for blk in blocks:
        x = _scan_levels(body, x, _as_tuple(blk, ("cols", "slots", "rows")))
    return x
