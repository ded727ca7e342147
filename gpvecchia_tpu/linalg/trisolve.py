"""Level-scheduled sparse triangular solves on the V factor (JAX).

V is lower-triangular in reversed ordering, stored column-wise (v_flat,
diag-first per column).  The host precomputes dependency levels (plan.py);
within a level all columns are independent, so each level is one batched
gather/scatter step.  Replaces the reference's Matrix::solve triangular
solves (/root/reference/R/vecchia_likelihood.R:88, R/vecchia_prediction.R:122-126).
"""

from __future__ import annotations

import jax.numpy as jnp

from .sparse import scatter_add

__all__ = ["forward_solve", "backward_solve"]


def _block_vals(v_flat, blk):
    slots = jnp.asarray(blk.slots)
    ok = slots >= 0
    return jnp.where(ok, v_flat[jnp.clip(slots, 0)], 0.0), ok


def forward_solve(v_flat, b, blocks):
    """Solve V x = b (V lower triangular, columns of v_flat)."""
    x = jnp.zeros_like(b)
    acc = b
    for blk in blocks:
        vals, ok = _block_vals(v_flat, blk)
        cols = jnp.asarray(blk.cols)
        xc = acc[cols] / vals[:, 0]
        x = x.at[cols].set(xc)
        if vals.shape[1] > 1:
            upd = -vals[:, 1:] * xc[:, None]
            rows = jnp.asarray(blk.rows)[:, 1:]
            rows = jnp.where(ok[:, 1:], rows, -1)
            acc = scatter_add(acc, rows, upd)
    return x


def backward_solve(v_flat, b, blocks):
    """Solve V^T x = b."""
    x = jnp.zeros_like(b)
    for blk in blocks:
        vals, ok = _block_vals(v_flat, blk)
        cols = jnp.asarray(blk.cols)
        if vals.shape[1] > 1:
            rows = jnp.asarray(blk.rows)[:, 1:]
            xr = jnp.where(ok[:, 1:], x[jnp.clip(rows, 0)], 0.0)
            dot = jnp.sum(vals[:, 1:] * xr, axis=1)
        else:
            dot = 0.0
        xc = (b[cols] - dot) / vals[:, 0]
        x = x.at[cols].set(xc)
    return x
