"""Batched U-column entries: the replacement for the reference's hot kernel.

For every ordered point k, build the (m+1)x(m+1) covariance of [self +
conditioning set] (response-conditioned neighbors get their nugget added on
the diagonal), then compute the normalized first column of its inverse:

    x = C^{-1} e_self,   col = x / sqrt(x_self)

col[0] is the U diagonal (1/conditional-sd, positive), col[j] the U entry at
neighbor j's row.  This equals the reference's per-row upper-Cholesky
back-solve (/root/reference/src/U_NZentries.cpp:25-118) but is formulated as
one batched dense SPD solve, which XLA maps onto the TPU MXU; ragged
conditioning sets are identity-padded so shapes stay static.

The OpenMP row loop of the reference becomes vmap/sharding over the batch.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .covariance import _safe_dist

__all__ = ["u_entries", "build_cov_blocks"]


def build_cov_blocks(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
                     covmat=None, sel=None):
    """(n, m+1, m+1) conditioning-set covariance blocks, identity-padded.

    covmat: optional full (n_all, n_all) covariance to gather from instead of
    evaluating the kernel (reference's U_NZentries_mat,
    /root/reference/src/U_NZentries.cpp:126-197).
    sel: optional (flat_selected_values, pair_slots) for hierarchical
    conditioning, where pair_slots[(i, a, b)] indexes the flattened selected
    covariance matrix (reference createUcppM path, R/createU.R:89-139).
    """
    mp1 = NN.shape[1]
    if sel is not None:
        flat_vals, pair_slots = sel
        ok = pair_slots >= 0
        C = jnp.where(ok, flat_vals[jnp.clip(pair_slots, 0)], 0.0)
    elif covmat is not None:
        C = covmat[NN[:, :, None], NN[:, None, :]]
    else:
        # evaluate the kernel only on the packed upper triangle (the blocks
        # are symmetric) -- halves the cost of expensive kernels (general-nu
        # Matern), then scatter back to full (n, m+1, m+1)
        iu, ju = np.triu_indices(mp1)
        pts = locs[NN]                       # (n, m+1, d)
        diff = pts[:, iu, :] - pts[:, ju, :]
        dist = _safe_dist(jnp.sum(diff * diff, axis=-1))   # (n, P)
        Cp = kernel_fn(dist, covparms)
        C = jnp.zeros((NN.shape[0], mp1, mp1), Cp.dtype)
        C = C.at[:, iu, ju].set(Cp).at[:, ju, iu].set(Cp)
    # response-conditioned neighbors contribute their nugget on the diagonal
    nug_nb = jnp.where(valid & ~cond, nug_point[NN], 0.0)
    C = C + jnp.eye(mp1, dtype=C.dtype) * nug_nb[:, None, :]
    # identity-pad invalid slots
    vv = valid[:, :, None] & valid[:, None, :]
    C = jnp.where(vv, C, jnp.eye(mp1, dtype=C.dtype))
    return C


def u_entries(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
              covmat=None, sel=None):
    """U-column coefficients (n, m+1), aligned with NNarray (self first)."""
    C = build_cov_blocks(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
                         covmat, sel)
    e0 = jnp.zeros((C.shape[0], C.shape[1]), C.dtype).at[:, 0].set(1.0)
    chol = jnp.linalg.cholesky(C)
    x = jax.scipy.linalg.cho_solve((chol, True), e0[..., None])[..., 0]
    col = x / jnp.sqrt(x[:, :1])
    return jnp.where(valid, col, 0.0)
