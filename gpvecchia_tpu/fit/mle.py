"""Covariance-parameter estimation (the reference's vecchia_estimate/vecchia_pred).

Mirrors /root/reference/R/vecchia_wrappers.R:28-161 — trend handling, the
theta.ini heuristic, log-parameter Nelder-Mead — and adds what the reference
cannot do: exact gradients of the Vecchia loglikelihood via JAX AD, driving
L-BFGS-B (default) or Adam.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.distance import pdist

from ..inference.likelihood import loglik_fn
from ..inference.prediction import vecchia_prediction
from ..spec import vecchia_specify

__all__ = ["vecchia_estimate", "vecchia_pred"]


def _detrend(data, X):
    """Constant / user-X / no trend (R/vecchia_wrappers.R:32-52)."""
    data = np.asarray(data, np.float64)
    if X is None:
        return data, np.empty(0), "none"
    if isinstance(X, str) and X == "constant":
        beta = np.array([np.nanmean(data)])
        return data - beta[0], beta, "constant"
    X = np.asarray(X, np.float64)
    beta = np.linalg.solve(X.T @ X, X.T @ data)
    return data - X @ beta, beta, "userspecified"


def _theta_ini(z, locs):
    """Default initial parameters (R/vecchia_wrappers.R:59-67)."""
    var_res = np.nanvar(z, ddof=1)
    n = len(z)
    rng = np.random.default_rng(0)
    sub = locs[rng.choice(n, size=min(n, 300), replace=False)]
    mean_dist = pdist(sub).mean()
    return np.array([0.9 * var_res, mean_dist / 4.0, 0.8, 0.1 * var_res])


def vecchia_estimate(data, locs, X="constant", m=20, covmodel="matern",
                     theta_ini=None, method="lbfgs", max_iter=300,
                     reltol=None, output_level=1, **specify_kwargs):
    """Estimate trend and Matern covariance parameters by Vecchia MLE.

    method: 'lbfgs' (AD gradients, default), 'adam', or 'nelder-mead'
    (gradient-free, matching the reference optimizer).
    Returns dict(z, beta_hat, theta_hat, trend, locs, covmodel, spec, ...).
    """
    locs = np.asarray(locs, np.float64)
    z, beta_hat, trend = _detrend(data, X)
    spec = vecchia_specify(locs, m, **specify_kwargs)

    if theta_ini is None:
        if not (isinstance(covmodel, str) and covmodel == "matern"):
            raise ValueError("theta_ini must be given for non-matern models")
        theta_ini = _theta_ini(z, locs)
    theta_ini = np.asarray(theta_ini, np.float64)
    n_par = len(theta_ini)

    from ..inference.likelihood import loglik_core
    core, dev = loglik_core(spec, covmodel)
    zc = jnp.asarray(z)
    is_matern = isinstance(covmodel, str) and covmodel == "matern"

    def _neg_loglik(lg, dev):
        theta = jnp.exp(lg)
        nugs = jnp.broadcast_to(theta[n_par - 1], (spec.n_obs,))
        return -core(dev, zc, theta[:n_par - 1], nugs)

    _neg_jit = jax.jit(_neg_loglik)

    def neg_loglik(lg):
        return _neg_jit(lg, dev)

    if method == "nelder-mead":
        from scipy.optimize import minimize

        def f(lg):
            if is_matern and np.exp(lg[2]) > 10:
                raise RuntimeError(
                    "The default optimization routine to find parameters did "
                    "not converge. Try writing your own optimization.")
            return float(neg_loglik(jnp.asarray(lg)))

        res = minimize(f, np.log(theta_ini), method="Nelder-Mead",
                       options={"maxiter": max_iter,
                                "xatol": 1e-8 if reltol is None else reltol,
                                "fatol": 1e-8 if reltol is None else reltol})
        lg_hat, n_iter, converged = res.x, res.nit, res.success
    elif method == "lbfgs":
        from scipy.optimize import minimize
        _vg = jax.jit(jax.value_and_grad(_neg_loglik))

        def fg(lg):
            lg = jnp.asarray(lg)
            v, g = _vg(lg, dev)
            v = float(v)
            g = np.asarray(g, np.float64)
            if not np.isfinite(v):
                return 1e10, np.zeros_like(g)
            return v, np.where(np.isfinite(g), g, 0.0)

        bounds = None
        if is_matern:
            bounds = [(None, None)] * n_par
            bounds[2] = (np.log(0.05), np.log(10.0))  # smoothness guard
        res = minimize(fg, np.log(theta_ini), jac=True, method="L-BFGS-B",
                       bounds=bounds, options={"maxiter": max_iter})
        lg_hat, n_iter, converged = res.x, res.nit, res.success
    elif method == "adam":
        import optax
        opt = optax.adam(1e-2)
        lg = jnp.asarray(np.log(theta_ini))
        state = opt.init(lg)

        @jax.jit
        def step(lg, state, dev):
            v, g = jax.value_and_grad(_neg_loglik)(lg, dev)
            updates, state = opt.update(g, state)
            return optax.apply_updates(lg, updates), state, v

        last = np.inf
        n_iter = 0
        for i in range(max_iter):
            lg, state, v = step(lg, state, dev)
            n_iter = i + 1
            if abs(float(v) - last) < 1e-9 * (abs(last) + 1):
                break
            last = float(v)
        lg_hat, converged = np.asarray(lg), True
    else:
        raise ValueError(f"unknown method '{method}'")

    theta_hat = np.exp(lg_hat)
    if output_level > 0:
        print("estimated trend coefficients:", beta_hat)
        print("estimated covariance parameters:", theta_hat)
    return {"z": z, "beta_hat": beta_hat, "theta_hat": theta_hat,
            "trend": trend, "locs": locs, "covmodel": covmodel,
            "spec": spec, "n_iter": n_iter, "converged": bool(converged),
            "loglik": -float(neg_loglik(jnp.asarray(np.log(theta_hat))))}


def vecchia_pred(vecchia_est, locs_pred, X_pred=None, m=30, **specify_kwargs):
    """Predictions with estimated parameters (R/vecchia_wrappers.R:134-161)."""
    locs_pred = np.asarray(locs_pred, np.float64)
    spec = vecchia_specify(vecchia_est["locs"], m, locs_pred=locs_pred,
                           **specify_kwargs)
    theta = vecchia_est["theta_hat"]
    preds = vecchia_prediction(vecchia_est["z"], spec, theta[:-1], theta[-1],
                               covmodel=vecchia_est["covmodel"])
    trend = vecchia_est["trend"]
    if X_pred is not None:
        mu_pred = preds["mu_pred"] + np.asarray(X_pred) @ vecchia_est["beta_hat"]
    elif trend == "none":
        mu_pred = preds["mu_pred"]
    elif trend == "constant":
        mu_pred = preds["mu_pred"] + vecchia_est["beta_hat"][0]
    else:
        warnings.warn("X_pred was not specified, so no trend was added back "
                      "to the predictions")
        mu_pred = preds["mu_pred"]
    return {"mean_pred": mu_pred, "var_pred": preds["var_pred"]}
