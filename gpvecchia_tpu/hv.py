"""Hierarchical-Vecchia utilities: covariance-side IC0 factor and getMatCov.

  * create_L: sparse factor L of the covariance restricted to the Vecchia
    pattern via zero-fill-in incomplete Cholesky (reference createL at
    /root/reference/R/createU.R:16-45, engine src/ic0.cpp:43-64).  For
    hierarchical (ancestor-closed) patterns this is the exact
    hierarchical-Vecchia factor.
  * get_mat_cov: the (n, m+1) selected covariance matrix aligned with the
    conditioning sets, from a dense matrix, a distance-based function, or a
    (dense/sparse) factor (reference getMatCov at
    /root/reference/R/MRA_utility-functions.r:82-210).

Host-side NumPy/SciPy: these run once per parameter value in filtering-style
workflows; the hot likelihood path uses the selected matrix on device.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.spatial.distance import cdist

from .kernels.covariance import make_kernel_fn

__all__ = ["create_L", "get_mat_cov", "ic0_csr"]


def _pattern_csr(spec):
    """Lower CSR (ptrs, inds) over ordered points: row i = sorted conditioning
    set of i (ancestors + self)."""
    NN = spec.NNarray
    n = NN.shape[0]
    rows = []
    ptrs = np.zeros(n + 1, dtype=np.int64)
    for i in range(n):
        s = np.sort(NN[i][NN[i] >= 0])
        rows.append(s)
        ptrs[i + 1] = ptrs[i] + s.size
    inds = np.concatenate(rows) if rows else np.empty(0, np.int64)
    return ptrs, inds


def ic0_csr(ptrs, inds, vals):
    """In-place up-looking incomplete Cholesky on lower CSR (zero fill-in).

    Row indices must be ascending within each row with the diagonal last,
    mirroring the reference kernel (src/ic0.cpp:43-64).
    """
    vals = np.array(vals, dtype=np.float64)
    n = ptrs.size - 1
    for i in range(n):
        for j in range(ptrs[i], ptrs[i + 1]):
            c = inds[j]
            # sparse dot of row i and row c prefixes (excluding diagonals)
            a1, b1 = ptrs[i], ptrs[i + 1] - 1
            a2, b2 = ptrs[c], ptrs[c + 1] - 1
            dp = 0.0
            while a1 < b1 and a2 < b2:
                if inds[a1] == inds[a2]:
                    dp += vals[a1] * vals[a2]
                    a1 += 1
                    a2 += 1
                elif inds[a1] < inds[a2]:
                    a1 += 1
                else:
                    a2 += 1
            if c < i:
                vals[j] = (vals[j] - dp) / vals[ptrs[c + 1] - 1]
            else:
                vals[j] = np.sqrt(vals[j] - dp)
    return vals


def create_L(spec, covmodel, covparms=None):
    """Sparse lower-triangular factor L (rows back in original input order).

    covmodel: 'matern'/'esqe' (with covparms), a selected (n, m+1) matrix, or
    a distance-based callable.
    """
    ptrs, inds = _pattern_csr(spec)
    locs = spec.locsord
    n = locs.shape[0]
    rows_rep = np.repeat(np.arange(n), np.diff(ptrs))
    d = np.sqrt(np.sum((locs[rows_rep] - locs[inds]) ** 2, axis=1))
    if isinstance(covmodel, str):
        import jax.numpy as jnp
        kf = make_kernel_fn(covmodel)
        vals = np.asarray(kf(jnp.asarray(d), jnp.asarray(covparms, np.float64)))
    elif callable(covmodel):
        vals = np.asarray(covmodel(d)).reshape(-1)
    elif isinstance(covmodel, np.ndarray) and covmodel.shape == (n, spec.m + 1):
        vals = _selected_to_pattern(spec, covmodel, ptrs, inds)
    else:
        raise ValueError("Argument covmodel has incorrect format")
    vals = ic0_csr(ptrs, inds, vals)
    L = sp.csr_matrix((vals, inds, ptrs), shape=(n, n))
    back = np.argsort(spec.ord, kind="stable")
    return L[back]


def _selected_to_pattern(spec, selmat, ptrs, inds):
    """(n, m+1) selected matrix (aligned with NNarray) -> pattern values."""
    NN = spec.NNarray
    n = NN.shape[0]
    out = np.empty(inds.size)
    for i in range(n):
        s = NN[i][NN[i] >= 0]
        order = np.argsort(s)
        vals_row = selmat[i][: s.size][order]
        out[ptrs[i]:ptrs[i + 1]] = vals_row
    return out


def get_mat_cov(spec, source, factor: bool = False) -> np.ndarray:
    """Selected covariance (n, m+1) aligned with NNarray (self first; NaN pad).

    source: dense (n, n) covariance matrix; distance-based callable f(d);
    or (with factor=True) a dense or scipy-sparse factor F with FF^T = Sigma
    in *ordered* indexing.
    """
    NN = spec.NNarray
    n, mp1 = NN.shape
    valid = NN >= 0
    NNc = np.where(valid, NN, 0)
    out = np.full((n, mp1), np.nan)
    if factor:
        F = source
        if sp.issparse(F):
            F = F.tocsr()
            rows_i = np.repeat(np.arange(n), valid.sum(axis=1))
            rows_j = NN[valid]
            vals = np.asarray(F[rows_i].multiply(F[rows_j]).sum(axis=1)).ravel()
            out[valid] = vals
        else:
            F = np.asarray(source)
            prod = np.einsum("ik,ijk->ij", F, F[NNc])
            out = np.where(valid, prod, np.nan)
        return out
    if callable(source):
        d = np.sqrt(np.sum(
            (spec.locsord[:, None, :] - spec.locsord[NNc]) ** 2, axis=2))
        vals = np.asarray(source(d))
        return np.where(valid, vals, np.nan)
    Sigma = np.asarray(source)
    if Sigma.shape == (n, n):
        vals = Sigma[np.arange(n)[:, None], NNc]
        return np.where(valid, vals, np.nan)
    raise ValueError("unsupported getMatCov source")
