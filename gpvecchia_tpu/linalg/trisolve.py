"""Level-scheduled sparse triangular solves on the V factor (JAX).

V is lower-triangular in reversed ordering, stored column-wise (v_flat,
diag-first per column).  The host precomputes dependency levels (plan.py) and
buckets consecutive levels of similar width; within a level all columns are
independent, so each level is one batched gather/scatter step and each bucket
one lax.scan (compile time scales with #buckets, not #levels).  Replaces the
reference's Matrix::solve triangular solves
(/root/reference/R/vecchia_likelihood.R:88, R/vecchia_prediction.R:122-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sparse import gather0, scatter_add, scatter_set

__all__ = ["forward_solve", "backward_solve"]


def _run_bucket(body, carry, blk):
    xs = (jnp.asarray(blk.cols), jnp.asarray(blk.slots), jnp.asarray(blk.rows))
    if blk.cols.shape[0] == 1:
        carry, _ = body(carry, jax.tree.map(lambda a: a[0], xs))
        return carry
    carry, _ = jax.lax.scan(body, carry, xs)
    return carry


def forward_solve(v_flat, b, blocks):
    """Solve V x = b (V lower triangular, columns of v_flat)."""

    def body(carry, xs):
        x, acc = carry
        cols, slots, rows = xs
        okrow = cols >= 0
        vals = gather0(v_flat, slots)
        diag = jnp.where(okrow, vals[:, 0], 1.0)
        xc = jnp.where(okrow, acc[jnp.clip(cols, 0)] / diag, 0.0)
        x = scatter_set(x, cols, xc)
        if vals.shape[1] > 1:
            upd = -vals[:, 1:] * xc[:, None]
            tgt = jnp.where(slots[:, 1:] >= 0, rows[:, 1:], -1)
            acc = scatter_add(acc, tgt, upd)
        return (x, acc), None

    x = jnp.zeros_like(b)
    carry = (x, b)
    for blk in blocks:
        carry = _run_bucket(body, carry, blk)
    return carry[0]


def backward_solve(v_flat, b, blocks):
    """Solve V^T x = b."""

    def body(x, xs):
        cols, slots, rows = xs
        okrow = cols >= 0
        vals = gather0(v_flat, slots)
        if vals.shape[1] > 1:
            ok = slots[:, 1:] >= 0
            xr = jnp.where(ok, x[jnp.clip(rows[:, 1:], 0)], 0.0)
            dot = jnp.sum(vals[:, 1:] * xr, axis=1)
        else:
            dot = 0.0
        diag = jnp.where(okrow, vals[:, 0], 1.0)
        xc = jnp.where(okrow, (b[jnp.clip(cols, 0)] - dot) / diag, 0.0)
        x = scatter_set(x, cols, xc)
        return x, None

    x = jnp.zeros_like(b)
    for blk in blocks:
        xs = (jnp.asarray(blk.cols), jnp.asarray(blk.slots),
              jnp.asarray(blk.rows))
        if blk.cols.shape[0] == 1:
            x, _ = body(x, jax.tree.map(lambda a: a[0], xs))
        else:
            x, _ = jax.lax.scan(body, x, xs)
    return x
