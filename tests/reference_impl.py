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
    """Dense U matrix + row maps, mirroring createU."""
    n_all = spec.n_all
    has_lat = spec.has_latent
    has_obs = spec.has_obs
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
        if has_obs[k]:
            obs_row[k] = cur; cur += 1
    size = cur
    U = np.zeros((size, size))
    latent = np.zeros(size, bool)
    latent[lat_row[lat_row >= 0]] = True

    for k in range(n_all):
        if has_lat[k]:
            inds = NN[k][NN[k] >= 0]
            ck = cond[k][NN[k] >= 0]
            C = kernel(cdist(locs[inds], locs[inds]), covparms)
            nugv = np.where(ck, 0.0, nug_ord[obs_pos[inds]])
            C = C + np.diag(nugv)
            x = np.linalg.solve(C, np.eye(len(inds))[:, 0])
            colv = x / np.sqrt(x[0])
            rows = np.where(ck, lat_row[inds], obs_row[inds])
            U[rows, lat_row[k]] = colv
        if has_obs[k]:
            p = obs_pos[k]
            if has_lat[k]:
                U[lat_row[k], obs_row[k]] = -1.0 / np.sqrt(nug_ord[p])
            U[obs_row[k], obs_row[k]] = 1.0 / np.sqrt(nug_ord[p])
    return U, latent, lat_row, obs_row


def rev_mat(M):
    return M[::-1, ::-1]


def dense_loglik(z, spec, covparms, nuggets, kernel=matern_np,
                 return_intermediates=False):
    """vecchia_likelihood_U on the dense U."""
    U, latent, lat_row, obs_row = build_dense_U(spec, covparms, nuggets, kernel)
    zord = np.asarray(z, float)[spec.ord_z]
    const = (~latent).sum() * np.log(2 * np.pi)
    z1 = U[~latent, :].T @ zord
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
    U, latent, lat_row, obs_row = build_dense_U(spec, covparms, nuggets, kernel)
    zord = np.asarray(z, float)[spec.ord_z]
    z1 = U[~latent, :].T @ zord
    Uy = U[latent, :]
    z2 = Uy @ z1
    W = Uy @ Uy.T
    V = np.linalg.cholesky(rev_mat(W))
    temp = np.linalg.solve(V, z2[::-1])
    mu_rev = -np.linalg.solve(V.T, temp)
    mu_ord = mu_rev[::-1]
    vars_ord = np.diag(np.linalg.inv(rev_mat(W)))[::-1]
    # back to original stacked order
    n_locs = spec.ord.size
    mu = np.empty(n_locs); mu[spec.ord] = mu_ord
    vr = np.empty(n_locs); vr[spec.ord] = vars_ord
    n = spec.n_obs
    return dict(mu_obs=mu[:n], mu_pred=mu[n:], var_obs=vr[:n], var_pred=vr[n:],
                mu_ord=mu_ord, vars_ord=vars_ord, z2=z2, V=V, U=U, latent=latent)
