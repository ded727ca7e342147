"""Literal dense NumPy re-implementation of the general-Vecchia likelihood.

Follows the reference algorithm step by step (createU + vecchia_likelihood_U,
/root/reference/R/createU.R and /root/reference/R/vecchia_likelihood.R) on
dense matrices, driven by a gpvecchia_tpu VecchiaSpec.  Used as a test oracle
for intermediates; only viable at small n.
"""

import numpy as np
from scipy.spatial.distance import cdist
from scipy.special import gamma as _gamma, kv as _kv


def matern_np(D, covparms):
    var, rho, nu = covparms
    s = D / rho
    if nu == 0.5:
        C = np.exp(-s)
    elif nu == 1.5:
        C = (1 + np.sqrt(3) * s) * np.exp(-np.sqrt(3) * s)
    elif nu == 2.5:
        C = (1 + np.sqrt(5) * s + 5 * s**2 / 3) * np.exp(-np.sqrt(5) * s)
    else:
        C = np.ones_like(s)
        pos = s > 0
        sp = s[pos]
        C[pos] = (2 ** (1 - nu) / _gamma(nu)) * sp**nu * _kv(nu, sp)
    return var * np.where(D == 0, 1.0, C)


def build_dense_U(spec, covparms, nuggets, kernel=matern_np):
    """Dense U matrix + row maps, mirroring createU.

    Supports the zero-nugget variant spec (known_pts / zero_obs_mask set by
    zero_nugget_variant): a 'known' point gets a non-latent row whose value
    is the exact observation of the point its self slot references, and the
    Inf-diagonal z-row of an exact observation is deleted, mirroring
    /root/reference/R/createU.R:173-193.  Returns (U, latent, lat_row,
    obs_row, val_obs_pos) where val_obs_pos[r] gives the obs position whose
    z-value each non-latent row carries (-1 for latent rows).
    """
    n_all = spec.n_all
    has_lat = spec.has_latent
    has_obs = spec.has_obs
    known = spec.known_pts if spec.known_pts is not None \
        else np.zeros(n_all, bool)
    zero_obs = spec.zero_obs_mask if spec.zero_obs_mask is not None \
        else np.zeros(spec.n_obs, bool)
    NN = spec.NNarray
    cond = spec.cond_latent
    locs = spec.locsord
    nuggets = np.broadcast_to(np.asarray(nuggets, float), (spec.n_obs,))
    nug_ord = nuggets[spec.ord_z]          # per obs position
    obs_pos = spec.obs_pos

    lat_row = np.full(n_all, -1)
    obs_row = np.full(n_all, -1)
    cur = 0
    for k in range(n_all):
        if has_lat[k]:
            lat_row[k] = cur; cur += 1
        if has_obs[k] and not (obs_pos[k] >= 0 and zero_obs[obs_pos[k]]
                               and not known[k]):
            # the z-row of an exact observation is deleted unless the point
            # itself is the known column (standard layout: one row total)
            obs_row[k] = cur; cur += 1
        elif known[k] and not has_obs[k]:
            obs_row[k] = cur; cur += 1     # zy twin: known non-obs row
    size = cur
    U = np.zeros((size, size))
    latent = np.zeros(size, bool)
    latent[lat_row[lat_row >= 0]] = True
    val_obs_pos = np.full(size, -1)

    # value_row[k]: the row carrying point k's observed value — its own
    # obs row, or (zy layout, deleted z-row) its known twin's merged row
    value_row = obs_row.copy()
    for k in range(n_all):
        if known[k] and not has_obs[k]:
            value_row[NN[k, 0]] = obs_row[k]

    for k in range(n_all):
        if has_lat[k] or known[k]:
            inds = NN[k][NN[k] >= 0]
            ck = cond[k][NN[k] >= 0]
            C = kernel(cdist(locs[inds], locs[inds]), covparms)
            nugv = np.where(ck, 0.0, nug_ord[obs_pos[inds]])
            C = C + np.diag(nugv)
            x = np.linalg.solve(C, np.eye(len(inds))[:, 0])
            colv = x / np.sqrt(x[0])
            col_row = lat_row[k] if has_lat[k] else obs_row[k]
            rows = np.where(ck, lat_row[inds], value_row[inds])
            if known[k]:
                rows = np.where(np.arange(len(inds)) == 0, col_row, rows)
            assert np.all(rows >= 0)
            U[rows, col_row] = colv
        if has_obs[k] and obs_row[k] >= 0 and not known[k]:
            p = obs_pos[k]
            if has_lat[k]:
                U[lat_row[k], obs_row[k]] = -1.0 / np.sqrt(nug_ord[p])
            U[obs_row[k], obs_row[k]] = 1.0 / np.sqrt(nug_ord[p])
        if obs_row[k] >= 0:
            val_obs_pos[obs_row[k]] = obs_pos[k] if has_obs[k] \
                else obs_pos[NN[k, 0]]
    return U, latent, lat_row, obs_row, val_obs_pos


def rev_mat(M):
    return M[::-1, ::-1]


def dense_loglik(z, spec, covparms, nuggets, kernel=matern_np,
                 return_intermediates=False):
    """vecchia_likelihood_U on the dense U."""
    U, latent, lat_row, obs_row, vop = build_dense_U(spec, covparms, nuggets,
                                                     kernel)
    zord = np.asarray(z, float)[spec.ord_z]
    const = spec.n_obs * np.log(2 * np.pi)
    z1 = U[~latent, :].T @ zord[vop[~latent]]
    quad_num = float(z1 @ z1)
    logdet_num = -2 * np.sum(np.log(np.diag(U)))
    Uy = U[latent, :]
    z2 = Uy @ z1
    W = Uy @ Uy.T
    Wrev = rev_mat(W)
    V = np.linalg.cholesky(Wrev)
    z3 = np.linalg.solve(V, z2[::-1])
    quad_denom = float(z3 @ z3)
    logdet_denom = -2 * np.sum(np.log(np.diag(V)))
    ll = -0.5 * (logdet_num - logdet_denom + quad_num - quad_denom + const)
    if return_intermediates:
        return ll, dict(U=U, latent=latent, z1=z1, z2=z2, W=W, V=V, z3=z3,
                        quad_num=quad_num, logdet_num=logdet_num,
                        quad_denom=quad_denom, logdet_denom=logdet_denom)
    return ll


def dense_posterior(z, spec, covparms, nuggets, kernel=matern_np):
    """Posterior mean/vars via dense U -> V (mirrors vecchia_prediction)."""
    U, latent, lat_row, obs_row, vop = build_dense_U(spec, covparms, nuggets,
                                                     kernel)
    zord = np.asarray(z, float)[spec.ord_z]
    z1 = U[~latent, :].T @ zord[vop[~latent]]
    Uy = U[latent, :]
    z2 = Uy @ z1
    W = Uy @ Uy.T
    V = np.linalg.cholesky(rev_mat(W))
    temp = np.linalg.solve(V, z2[::-1])
    mu_rev = -np.linalg.solve(V.T, temp)
    mu_lat = mu_rev[::-1]
    vars_lat = np.diag(np.linalg.inv(rev_mat(W)))[::-1]
    # back to original stacked order (knowns: mean = datum, var = 0)
    n_locs = spec.ord.size
    off = spec.n_all - n_locs
    lat_pts = np.flatnonzero(spec.has_latent)
    mu_ord = np.full(n_locs, np.nan)
    vars_ord = np.full(n_locs, np.nan)
    mu_ord[lat_pts - off] = mu_lat
    vars_ord[lat_pts - off] = vars_lat
    if spec.known_pts is not None and spec.known_pts.any():
        kn = np.flatnonzero(spec.known_pts)
        mu_ord[kn - off] = zord[spec.obs_pos[spec.NNarray[kn, 0]]]
        vars_ord[kn - off] = 0.0
    mu = np.empty(n_locs); mu[spec.ord] = mu_ord
    vr = np.empty(n_locs); vr[spec.ord] = vars_ord
    n = spec.n_obs
    return dict(mu_obs=mu[:n], mu_pred=mu[n:], var_obs=vr[:n], var_pred=vr[n:],
                mu_ord=mu_ord, vars_ord=vars_ord, z2=z2, V=V, U=U, latent=latent)
