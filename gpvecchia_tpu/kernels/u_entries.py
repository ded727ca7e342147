"""Batched U-column entries: the replacement for the reference's hot kernel.

For every ordered point k, build the (m+1)x(m+1) covariance of [self +
conditioning set] (response-conditioned neighbors get their nugget added on
the diagonal), then compute the normalized first column of its inverse:

    x = C^{-1} e_self,   col = x / sqrt(x_self)

col[0] is the U diagonal (1/conditional-sd, positive), col[j] the U entry at
neighbor j's row.  This equals the reference's per-row upper-Cholesky
back-solve (/root/reference/src/U_NZentries.cpp:25-118); the OpenMP row loop
becomes the batch dimension.

TPU layout note: the batch lives in the LAST (lane) dimension.  The small
matrices are kept as a packed triangle of n-vectors, and the Cholesky /
substitutions are a block-unrolled Crout recursion over scalar positions of
the small matrix — every op is a full (n,)-lane vector op, and the cross
block accumulations are einsum contractions.  The (n, m+1, m+1)
batched-cholesky layout XLA would otherwise use pads the two minor dims to
hardware tiles and runs ~2500x slower.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .covariance import _safe_dist, matern
from .pallas_crout import _nu_idx, fused_matern_solve, packed_solve_e0

__all__ = ["u_entries", "build_cov_packed", "crout_solve_e0",
           "packed_pair_dist"]

_CROUT_BLOCK = 8


def _packed_index(mp1):
    iu, ju = np.triu_indices(mp1)
    pk = np.zeros((mp1, mp1), np.int32)
    pk[iu, ju] = np.arange(iu.size)
    pk[ju, iu] = np.arange(iu.size)
    return iu, ju, pk


def packed_pair_dist(locs, NN):
    """Parameter-free packed pairwise distances (n, P) for the U kernel.

    Computed ONCE per spec and cached on the device arrays: the locs[NN]
    gather of d-wide rows is the single most expensive op of the whole
    likelihood on TPU (measured 444 ms of a 549 ms eval at n=1e5, m=20 —
    2-element-row gathers serialize), while the distances themselves never
    change across parameter evaluations.
    """
    mp1 = NN.shape[1]
    iu, ju, _ = _packed_index(mp1)
    pts = locs[NN]                           # (n, m+1, d)
    diff = pts[:, iu, :] - pts[:, ju, :]
    return _safe_dist(jnp.sum(diff * diff, axis=-1))       # (n, P)


def build_cov_packed(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
                     covmat=None, sel=None, pdist=None, nbr_pts=None):
    """Packed upper-triangle covariance blocks, batch-last: (P, n).

    P = (m+1)(m+2)/2 positions (iu, ju) of the conditioning-set covariance;
    response-conditioned neighbors carry their nugget on the diagonal,
    invalid (padded) slots are identity-extended.

    covmat: optional full (n_all, n_all) covariance to gather from instead of
    evaluating a kernel (reference's U_NZentries_mat,
    /root/reference/src/U_NZentries.cpp:126-197).
    sel: optional (flat_selected_values, (n, m+1, m+1) pair_slots) for
    hierarchical conditioning (reference createUcppM, R/createU.R:89-139).
    pdist: optional precomputed packed distances from packed_pair_dist
    (skips the locs[NN] gather in the hot path).
    """
    mp1 = NN.shape[1]
    iu, ju, _ = _packed_index(mp1)
    # geometry is parameter-free: never differentiate through the location /
    # distance gathers (their cotangent scatters materialize O(n * P * d)
    # intermediates that OOM the grad compile at the n=1e6/m=40 config)
    if pdist is not None:
        pdist = jax.lax.stop_gradient(pdist)
    if nbr_pts is not None:
        nbr_pts = jax.lax.stop_gradient(nbr_pts)
    locs = jax.lax.stop_gradient(locs)
    if sel is not None:
        flat_vals, pair_slots = sel
        ps = pair_slots[:, iu, ju]
        Cp = jnp.where(ps >= 0, flat_vals[jnp.clip(ps, 0)], 0.0)
    elif covmat is not None:
        Cp = covmat[NN[:, iu], NN[:, ju]]
    elif getattr(kernel_fn, "takes_locs", False):
        # user covariance over location pairs (reference createU.R:93-108)
        pts = nbr_pts if nbr_pts is not None else locs[NN]
        Cp = kernel_fn(pts[:, iu, :], pts[:, ju, :], covparms)
    else:
        if pdist is not None:
            dist = pdist
        else:
            pts = nbr_pts if nbr_pts is not None else locs[NN]
            diff = pts[:, iu, :] - pts[:, ju, :]
            dist = _safe_dist(jnp.sum(diff * diff, axis=-1))
        Cp = kernel_fn(dist, covparms)
    # response-conditioned neighbors contribute their nugget on the diagonal;
    # the packed diagonal slots are exactly the positions with iu == ju, so
    # this is a static-mask add (scatter-free): at slot (j, j), iu = j
    nug_nb = jnp.where(valid & ~cond, nug_point[NN], 0.0)   # (n, m+1)
    dmask = jnp.asarray(iu == ju)
    Cp = Cp + jnp.where(dmask[None, :], nug_nb[:, iu], 0.0)
    # identity-pad invalid slots
    vv = valid[:, iu] & valid[:, ju]
    Cp = jnp.where(vv, Cp, dmask[None, :].astype(Cp.dtype))
    return Cp.T       # (P, n) batch-last


def crout_solve_e0(Cp, mp1, block=_CROUT_BLOCK):
    """x = C^{-1} e0 for packed batch-last SPD blocks; returns (m+1, n).

    Block-unrolled Crout Cholesky: each L column is a full (m+1, n) array
    (rows above the diagonal hold garbage that is never read), columns are
    processed in blocks of `block`, and all cross-block accumulations are
    einsum contractions — the op count is O(F * block + (F/block)^2)
    instead of O(F^3), keeping XLA compile time reasonable while every op
    stays an (n,)-lane vector op.
    """
    F = mp1
    _, _, pk = _packed_index(F)
    dt = Cp.dtype
    Lcols = [None] * F            # each (F, n); rows < j are garbage
    inv = [None] * F
    for jb in range(0, F, block):
        je = min(jb + block, F)
        if jb > 0:
            Lprev = jnp.stack(Lcols[:jb], axis=1)     # (F, jb, n)
            # acc[i, j-jb] = sum_{k<jb} L[i,k] L[j,k], valid for rows >= jb
            acc = jnp.einsum("ikn,jkn->ijn", Lprev, Lprev[jb:je],
                             precision=jax.lax.Precision.HIGHEST)
        for j in range(jb, je):
            s = Cp[pk[:, j]]                          # column j of C, (F, n)
            if jb > 0:
                s = s - acc[:, j - jb]
            for k in range(jb, j):
                s = s - Lcols[k] * Lcols[k][j][None, :]
            d = jax.lax.rsqrt(s[j])
            inv[j] = d
            Lcols[j] = s * d[None, :]
    L = jnp.stack(Lcols, axis=1)   # (F, F, n); upper part garbage, never read
    # y = L^{-1} e0 (blocked forward substitution)
    y = [None] * F
    for jb in range(0, F, block):
        je = min(jb + block, F)
        if jb > 0:
            Yprev = jnp.stack(y[:jb], axis=0)         # (jb, n)
            acc = jnp.einsum("ikn,kn->in", L[jb:je, :jb], Yprev,
                             precision=jax.lax.Precision.HIGHEST)
        for j in range(jb, je):
            s = -acc[j - jb] if jb > 0 else (
                jnp.ones_like(inv[0]) if j == 0 else jnp.zeros_like(inv[0]))
            if jb == 0 and j == 0:
                y[0] = inv[0]
                continue
            for k in range(jb, j):
                s = s - L[j, k] * y[k]
            y[j] = s * inv[j]
    # x = L^{-T} y (blocked backward substitution)
    x = [None] * F
    for je in range(F, 0, -block):
        jb = max(je - block, 0)
        if je < F:
            Xnext = jnp.stack(x[je:], axis=0)         # (F-je, n)
            acc = jnp.einsum("kin,kn->in", L[je:, jb:je], Xnext,
                             precision=jax.lax.Precision.HIGHEST)
        for j in range(je - 1, jb - 1, -1):
            s = y[j] - (acc[j - jb] if je < F else 0.0)
            for k in range(j + 1, je):
                s = s - L[k, j] * x[k]
            x[j] = s * inv[j]
    return jnp.stack(x, axis=0)    # (F, n)


def _use_crout():
    """Batch-last Crout on TPU; LAPACK-backed batched cholesky elsewhere.

    XLA:TPU lowers (n, F, F) batched cholesky/triangular-solve ~2500x slower
    than the lane-major Crout; XLA:CPU calls LAPACK and compiles the big
    unrolled Crout graph slowly, so each backend gets its native fast path
    (identical math; tests/test_covariance.py checks they agree).
    """
    return jax.default_backend() == "tpu"


def _postprocess(col, valid):
    """Per-row numerical-failure handling: a non-SPD conditioning matrix
    poisons its row with NaN/Inf — replace with e0 (zero quadform terms,
    zero logdet contribution), like the reference's per-row try/catch
    (/root/reference/src/U_NZentries.cpp:60-66); then zero padded slots.

    Returns (col, bad): callers must exclude bad rows from the W assembly
    (the e0 stand-in must not inject a unit element there) and surface
    sum(bad) to the user — on the TPU plugin there is no host callback, so
    the count is threaded out as a value rather than printed."""
    mp1 = col.shape[1]
    bad = ~jnp.all(jnp.isfinite(col), axis=1)
    e0row = jnp.zeros((1, mp1), col.dtype).at[0, 0].set(1.0)
    col = jnp.where(bad[:, None], e0row, col)
    return jnp.where(valid, col, 0.0), bad


def u_entries(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
              covmat=None, sel=None, pdist=None, nbr_pts=None, row_chunks=1,
              fused=None, nugT=None):
    """(col, bad): U-column coefficients (n, m+1) aligned with NNarray
    (self first), and the per-row Cholesky-failure mask (see _postprocess).

    row_chunks > 1 processes the rows in that many sequential chunks
    (lax.map) so the (n, (m+1)(m+2)/2) covariance intermediates never
    materialize at once — required to fit large-n problems in HBM (the
    n=1e6, m=40 north-star needs ~3.3 GB per live intermediate otherwise).

    fused: optional dict of transposed parameter-free geometry caches
    ({pdistT|ptsT, NNT, vcT, validT}) enabling the all-in-VMEM Pallas path
    (pallas_crout.fused_matern_solve) for the built-in Matern on TPU: the
    packed covariance never materializes in HBM.  General smoothness
    dispatches back to the XLA build at runtime (lax.cond).
    """
    mp1 = NN.shape[1]
    if (fused is not None and _use_crout() and covmat is None and sel is None
            and kernel_fn is matern
            and not os.environ.get("GPV_NO_PALLAS")):
        dt = nug_point.dtype
        covparms = jnp.asarray(covparms, dt)
        if nugT is None:
            # vector-nugget fallback: a 41M-element transposed gather costs
            # ~350 ms at n=1e6 — callers with scalar nuggets pass nugT
            # (mask * scalar, gather-free) instead
            nugT = jnp.where(fused["vcT"], nug_point[fused["NNT"]],
                             0.0).astype(dt)
        use_pd = "pdistT" in fused
        geoT = fused["pdistT"] if use_pd else fused["ptsT"]
        d = locs.shape[1]
        if use_pd:
            aux_geo = pdist
        else:
            # FLAT (n, F*d) neighbor coordinates: kept 2-D so the grad
            # residual tiles sanely (see pallas_crout._rebuild_cp)
            pts3 = nbr_pts if nbr_pts is not None else locs[NN]
            aux_geo = pts3.reshape(pts3.shape[0], mp1 * d)

        def _fused():
            x = fused_matern_solve(covparms, nugT, geoT, fused["validT"],
                                   jax.lax.stop_gradient(aux_geo),
                                   mp1, d, use_pd)
            return (x * jax.lax.rsqrt(x[:1])).T

        def _xla():
            return _u_entries_col(locs, NN, valid, cond, nug_point,
                                  kernel_fn, covparms, covmat, sel, pdist,
                                  nbr_pts, row_chunks)

        col = jax.lax.cond(_nu_idx(covparms[2]) < 3, _fused, _xla)
        return _postprocess(col, valid)
    col = _u_entries_col(locs, NN, valid, cond, nug_point, kernel_fn,
                         covparms, covmat, sel, pdist, nbr_pts, row_chunks)
    return _postprocess(col, valid)


def _u_entries_col(locs, NN, valid, cond, nug_point, kernel_fn, covparms,
                   covmat=None, sel=None, pdist=None, nbr_pts=None,
                   row_chunks=1):
    """Raw (pre-masking) U columns via the XLA covariance build."""
    mp1 = NN.shape[1]
    n = NN.shape[0]
    if row_chunks > 1 and covmat is None and sel is not None:
        row_chunks = 1      # selected-matrix path is small; keep simple
    if row_chunks > 1 and covmat is None:
        pad = (-n) % row_chunks

        def padrow(a, fill):
            if a is None:
                return None
            if pad:
                w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, w, constant_values=fill)
            return a.reshape((row_chunks, -1) + a.shape[1:])

        stacked = dict(NN=padrow(NN, 0), valid=padrow(valid, False),
                       cond=padrow(cond, False))
        if pdist is not None and not getattr(kernel_fn, "takes_locs", False):
            stacked["pdist"] = padrow(pdist, 0.0)
        else:
            pts = nbr_pts if nbr_pts is not None else locs[NN]
            stacked["nbr_pts"] = padrow(pts, 0.0)

        def body(ch):
            return _u_entries_col(locs, ch["NN"], ch["valid"], ch["cond"],
                                  nug_point, kernel_fn, covparms,
                                  pdist=ch.get("pdist"),
                                  nbr_pts=ch.get("nbr_pts"))

        # checkpoint: the scan VJP would otherwise stash every chunk's
        # covariance-build residuals stacked over chunks (~40 GB at
        # n=1e6/m=40 — a dozen (chunks, n/chunks, 861) arrays); remat
        # recomputes them per chunk during the backward instead
        col = jax.lax.map(jax.checkpoint(body), stacked)
        return col.reshape(-1, mp1)[:n]
    Cp = build_cov_packed(locs, NN, valid, cond, nug_point, kernel_fn,
                          covparms, covmat, sel, pdist=pdist,
                          nbr_pts=nbr_pts)
    if _use_crout():
        if os.environ.get("GPV_NO_PALLAS"):
            x = crout_solve_e0(Cp, mp1)          # XLA fallback (m+1, n)
        else:
            # Pallas VMEM-resident factor+solve (kernels/pallas_crout.py):
            # one HBM read of Cp, one write of x, custom VJP for MLE grads
            x = packed_solve_e0(Cp, mp1)
        col = (x * jax.lax.rsqrt(x[:1])).T       # (n, m+1)
    else:
        _, _, pk = _packed_index(mp1)
        # packed -> full via a static (F, F) gather (the equivalent scatter
        # formulation compiles pathologically slowly on XLA:CPU)
        C = Cp.T[:, jnp.asarray(pk)]
        e0 = jnp.zeros((C.shape[0], mp1), C.dtype).at[:, 0].set(1.0)
        chol = jnp.linalg.cholesky(C)
        x = jax.scipy.linalg.cho_solve((chol, True), e0[..., None])[..., 0]
        col = x / jnp.sqrt(x[:, :1])
    # per-row numerical-failure handling (non-SPD conditioning covariance)
    # and padding masks are applied by _postprocess in u_entries; chunked
    # recursion comes back through here so masking happens exactly once
    return col
