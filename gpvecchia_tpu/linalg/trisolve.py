"""Level-scheduled sparse triangular solves on the V factor (JAX).

V is lower-triangular in reversed ordering; values live in the plan's
PHYSICAL level-ordered layout.  The unknown vector x likewise lives in a
level-ordered physical layout so each level writes one contiguous
dynamic_update_slice — the computation contains gathers and dense reductions
only, no scatter ops (XLA compiles long scatter chains pathologically
slowly and serializes them at runtime).

  forward  (V x = b):  x_j = (b_j - sum_k V[j,k] x_k) / V[j,j]  over row j
  backward (V^T x = b): x_j = (b_j - sum_i V[i,j] x_i) / V[j,j] over col j

Replaces the reference's Matrix::solve triangular solves
(/root/reference/R/vecchia_likelihood.R:88, R/vecchia_prediction.R:122-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sparse import gather, gather0

__all__ = ["forward_solve", "backward_solve"]


def _as_tuple(blk, names):
    """Accept either a plan dataclass or an already-converted tuple."""
    if isinstance(blk, (tuple, list)):
        return tuple(blk)
    return tuple(getattr(blk, n) for n in names)


def _run(body, x, xs_raw):
    xs = jax.tree.map(jnp.asarray, xs_raw)
    if xs[0].shape[0] == 1:
        x, _ = body(x, jax.tree.map(lambda a: a[0], xs))
        return x
    x, _ = jax.lax.scan(body, x, xs)
    return x


def forward_solve(v_flat, b, blocks, x_perm=None, x_size=None):
    """Solve V x = b; b in logical (reversed-latent) order.

    Returns x in logical order if `x_perm` is given, otherwise in the padded
    physical layout (padded entries are exactly 0, so reductions like
    sum(x**2) are safe on it).
    """

    def body(x, xs):
        cols, dslots, rslots, rcols, off = xs
        ok = cols >= 0
        if rslots.shape[-1] > 0:
            vv = gather0(v_flat, rslots)
            xx = x[jnp.clip(rcols, 0)]
            dot = jnp.sum(vv * xx, axis=-1)
        else:
            dot = 0.0
        diag = jnp.where(ok, gather(v_flat, jnp.clip(dslots, 0)), 1.0)
        xj = jnp.where(ok, (gather(b, jnp.clip(cols, 0)) - dot) / diag, 0.0)
        return jax.lax.dynamic_update_slice(x, xj, (off,)), None

    if x_size is None:
        x_size = _infer_size(blocks)
    x = jnp.zeros(x_size, b.dtype)
    for blk in blocks:
        x = _run(body, x, _as_tuple(
            blk, ("cols", "diag_slots", "row_slots", "row_cols", "offsets")))
    return x if x_perm is None else gather(x, jnp.asarray(x_perm))


def backward_solve(v_flat, b, blocks, x_perm=None, x_size=None):
    """Solve V^T x = b; b in logical order; see forward_solve on outputs."""

    def body(x, xs):
        cols, slots, rows, off = xs
        ok = cols >= 0
        vals = gather0(v_flat, slots)
        if vals.shape[-1] > 1:
            xr = jnp.where(slots[..., 1:] >= 0,
                           x[jnp.clip(rows[..., 1:], 0)], 0.0)
            dot = jnp.sum(vals[..., 1:] * xr, axis=-1)
        else:
            dot = 0.0
        diag = jnp.where(ok, vals[..., 0], 1.0)
        xj = jnp.where(ok, (gather(b, jnp.clip(cols, 0)) - dot) / diag, 0.0)
        return jax.lax.dynamic_update_slice(x, xj, (off,)), None

    if x_size is None:
        x_size = _infer_size(blocks)
    x = jnp.zeros(x_size, b.dtype)
    for blk in blocks:
        x = _run(body, x, _as_tuple(blk, ("cols", "slots", "rows", "offsets")))
    return x if x_perm is None else gather(x, jnp.asarray(x_perm))


def _infer_size(blocks):
    size = 0
    for blk in blocks:
        t = _as_tuple(blk, ("cols",))[0] if not isinstance(blk, (tuple, list)) \
            else blk[0]
        offs = blk[-1] if isinstance(blk, (tuple, list)) else blk.offsets
        size = max(size, int(offs[-1]) + t.shape[-1])
    return size
