"""Scatter/gather helpers for -1-padded index maps.

JAX's `mode="drop"` drops only *out-of-bounds* indices; -1 is in-bounds
(NumPy wrap semantics) and would silently corrupt the last element.  These
helpers rewrite negative pad indices to an out-of-bounds sentinel first.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["oob", "scatter_add", "scatter_set", "gather0"]


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


def gather0(arr, idx):
    """arr[idx] with idx < 0 yielding 0."""
    idx = jnp.asarray(idx)
    return jnp.where(idx >= 0, arr[jnp.clip(idx, 0)], 0.0)
