"""Scatter/gather helpers for -1-padded index maps.

JAX's `mode="drop"` drops only *out-of-bounds* indices; -1 is in-bounds
(NumPy wrap semantics) and would silently corrupt the last element.  These
helpers rewrite negative pad indices to an out-of-bounds sentinel first.

`pair_sum` is the TPU-native replacement for scatter-add with colliding
indices (which XLA serializes): the host transposes each scatter map into
per-target gather lists padded by count class (plan.py _build_pair_sum), so
the device does gathers + dense reductions + unique-index writes only.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["oob", "scatter_add", "scatter_set", "scatter_set_unique",
           "gather0", "pair_sum"]


def oob(idx, size):
    """Map negative pad indices to `size` (out of bounds -> dropped)."""
    idx = jnp.asarray(idx)
    return jnp.where(idx < 0, size, idx)


def scatter_add(arr, idx, vals):
    """arr.at[idx].add(vals), dropping entries where idx < 0."""
    return arr.at[oob(idx, arr.shape[0])].add(vals, mode="drop")


def scatter_set(arr, idx, vals):
    """arr.at[idx].set(vals), dropping entries where idx < 0."""
    return arr.at[oob(idx, arr.shape[0])].set(vals, mode="drop")


def scatter_set_unique(arr, idx, vals):
    """scatter_set for index maps known to be collision-free."""
    return arr.at[oob(idx, arr.shape[0])].set(vals, mode="drop",
                                              unique_indices=True)


def gather0(arr, idx):
    """arr[idx] with idx < 0 yielding 0."""
    idx = jnp.asarray(idx)
    return jnp.where(idx >= 0, arr[jnp.clip(idx, 0)], 0.0)


def pair_sum(A, B, buckets, n_out, dtype=None):
    """out[t] = sum_c A[pa[t,c]] * B[pb[t,c]] over count-class buckets.

    `buckets` is a list of (out_idx, pa, pb) index triples built by
    plan._build_pair_sum; out_idx are unique across buckets, pads are -1.
    """
    out = jnp.zeros(n_out, dtype if dtype is not None else A.dtype)
    for out_idx, pa, pb in buckets:
        vals = jnp.sum(gather0(A, pa) * gather0(B, pb), axis=1)
        out = out.at[out_idx].set(vals, unique_indices=True)
    return out
