"""Vecchia-Laplace inference for non-Gaussian data (JAX).

Mirrors /root/reference/R/vecchia_laplace_NR.R: Newton-Raphson on the latent
posterior mode using Gaussian pseudo-data with per-point pseudo-nuggets from
the likelihood's score and Hessian.  Unlike the reference (which re-enters R
each iteration), the whole NR loop runs on device as a lax.while_loop.

Likelihood models (score/hess/llh/link quadruples, reference lines):
  logistic R:213-224, poisson :227-239, gaussian :242-250, gamma :253-281,
  beta :285-322 (negbin is a stub in the reference and omitted here).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.covariance import make_kernel_fn
from ..plan import get_plan
from .likelihood import _device_arrays, vecchia_likelihood
from .prediction import _posterior_core, vecchia_prediction

__all__ = ["calculate_posterior_VL", "vecchia_laplace_likelihood",
           "vecchia_laplace_prediction", "LIKELIHOOD_MODELS"]

_SQRT2PI_LOG = 0.5 * math.log(2.0 * math.pi)
_Z95 = 1.6448536269514722  # qnorm(0.95)


def _gauss_model(likparms):
    sigma = likparms.get("sigma", math.sqrt(0.1))

    return {
        "llh": lambda y, z: jnp.sum(-0.5 * (z - y) ** 2 / sigma ** 2
                                    - jnp.log(sigma) - _SQRT2PI_LOG),
        "hess": lambda y, z: jnp.full_like(y, 1.0 / sigma ** 2),
        "score": lambda y, z: (z - y) / sigma ** 2,
        "link": lambda y: y,
        "invalid": lambda z: False,
    }


def _logistic_model(likparms):
    return {
        "llh": lambda y, z: jnp.sum(z * y - jnp.logaddexp(0.0, y)),
        "hess": lambda y, z: jax.nn.sigmoid(y) * jax.nn.sigmoid(-y),
        "score": lambda y, z: z - jax.nn.sigmoid(y),
        "link": lambda y: jax.nn.sigmoid(y),
        "invalid": lambda z: not np.all(np.isin(z, (0.0, 1.0))),
    }


def _poisson_model(likparms):
    return {
        "llh": lambda y, z: jnp.sum(z * y - jnp.exp(y)
                                    - jax.lax.lgamma(z + 1.0)),
        "hess": lambda y, z: jnp.exp(y),
        "score": lambda y, z: z - jnp.exp(y),
        "link": lambda y: jnp.exp(y),
        "invalid": lambda z: bool(np.any(z < 0) or np.any(np.mod(z, 1) > 0)),
    }


def _gamma_model(likparms):
    # mean parameterization: E[z] = exp(y), fixed shape alpha
    a = likparms.get("alpha", 2.0)
    return {
        "llh": lambda y, z: jnp.sum(-a * z * jnp.exp(-y) + (a - 1) * jnp.log(z)
                                    - a * y + a * jnp.log(a)
                                    - jax.lax.lgamma(jnp.asarray(a, y.dtype))),
        "hess": lambda y, z: a * z * jnp.exp(-y),
        "score": lambda y, z: a * (z * jnp.exp(-y) - 1.0),
        "link": lambda y: jnp.exp(y),
        "invalid": lambda z: bool(np.any(z <= 0)),
    }


def _gamma_alt_model(likparms):
    a = likparms.get("alpha", 2.0)
    return {
        "llh": lambda y, z: jnp.sum(-jnp.exp(y) * z + (a - 1) * jnp.log(z)
                                    + a * y
                                    - jax.lax.lgamma(jnp.asarray(a, y.dtype))),
        "hess": lambda y, z: z * jnp.exp(y),
        "score": lambda y, z: -z * jnp.exp(y) + a,
        "link": lambda y: a / jnp.exp(y),
        "invalid": lambda z: bool(np.any(z <= 0)),
    }


def _beta_model(likparms):
    b = likparms.get("beta", 0.5)

    def hess(y, z):
        ey = jnp.exp(y)
        t1 = (jnp.log(z) - jax.scipy.special.digamma(ey * b)
              + jax.scipy.special.digamma(b * (1 + ey)))
        t2 = (-jax.scipy.special.polygamma(1, ey * b)
              + jax.scipy.special.polygamma(1, b * (1 + ey)))
        return -ey * b * t1 - (ey * b) ** 2 * t2

    def score(y, z):
        ey = jnp.exp(y)
        return ey * b * (jnp.log(z) - jax.scipy.special.digamma(ey * b)
                         + jax.scipy.special.digamma(b * (1 + ey)))

    def llh(y, z):
        ey = jnp.exp(y)
        return jnp.sum((ey * b - 1) * jnp.log(z) + (b - 1) * jnp.log(1 - z)
                       - (jax.lax.lgamma(b * ey) + jax.lax.lgamma(jnp.asarray(b, y.dtype))
                          - jax.lax.lgamma(b * ey + b)))

    return {
        "llh": llh, "hess": hess, "score": score,
        "link": lambda y: jax.nn.sigmoid(y),
        "invalid": lambda z: bool(np.any(z < 0) or np.any(z > 1)),
    }


def _negbin_model(likparms):
    # the reference keeps negative-binomial as a non-functional stub
    # (R/vecchia_laplace_NR.R:327-336); kept here for surface parity
    raise NotImplementedError(
        "The negative-binomial likelihood is a stub in the reference "
        "(R/vecchia_laplace_NR.R:327-336) and is not implemented.")


LIKELIHOOD_MODELS = {
    "gaussian": _gauss_model,
    "logistic": _logistic_model,
    "poisson": _poisson_model,
    "gamma": _gamma_model,
    "gamma_alt": _gamma_alt_model,
    "beta": _beta_model,
    "negbinomial": _negbin_model,
}


def _vl_posterior_fn(spec, model, covmodel, obs_mask, dtype):
    """Compiled NR loop: (z_obs, covparms, y0, prior_obs, max_iter, convg)."""
    plan = get_plan(spec, dtype)
    kernel_fn = make_kernel_fn(covmodel) if not hasattr(covmodel, "shape") \
        else None
    covmat = jnp.asarray(covmodel, dtype) if hasattr(covmodel, "shape") else None
    dev = _device_arrays(plan)
    obs_mask_j = jnp.asarray(obs_mask)
    n_obs_locs = plan.n_obs
    ord_j = jnp.asarray(spec.ord)
    n_locs = spec.ord.shape[0]

    hess, score = model["hess"], model["score"]
    obs_idx = jnp.asarray(np.flatnonzero(obs_mask))

    @jax.jit
    def _run(dev, z_obs, covparms, y0, prior_obs, max_iter, convg):
        def mu_obs_from(pseudo_full, nug_full, covparms):
            mu_ord, v_flat, _, _ = _posterior_core(
                plan, kernel_fn, covmat, dev, pseudo_full, covparms, nug_full)
            mu_orig = jnp.zeros(n_locs, dtype).at[ord_j].set(mu_ord)
            return mu_orig[:n_obs_locs]

        def pseudo_of(y):
            D = 1.0 / hess(y, z_obs)
            u = score(y, z_obs)
            p_obs = D * u + y - prior_obs
            # NA handling as in removeNAs: mean fill + inflated nuggets
            pm = jnp.mean(p_obs)
            pv = jnp.var(p_obs, ddof=1) * 1e8
            p_full = jnp.where(obs_mask_j,
                               jnp.zeros(n_obs_locs, dtype).at[obs_idx].set(p_obs),
                               pm)
            nug_full = jnp.where(obs_mask_j,
                                 jnp.zeros(n_obs_locs, dtype).at[obs_idx].set(D),
                                 pv)
            return p_full, nug_full, D, u

        def body(carry):
            y, _, it, _ = carry
            p_full, nug_full, D, u = pseudo_of(y)
            mu_obs = mu_obs_from(p_full, nug_full, covparms)
            y_new = mu_obs[obs_idx] + prior_obs
            delta = jnp.max(jnp.abs(y_new - y))
            bad = jnp.isnan(delta)
            y_out = jnp.where(bad, y, y_new)
            return (y_out, delta, it + 1, bad)

        def cond(carry):
            _, delta, it, bad = carry
            return (delta >= convg) & (it < max_iter) & (~bad)

        y, delta, iters, bad = jax.lax.while_loop(
            cond, body, (y0, jnp.asarray(jnp.inf, dtype),
                         jnp.asarray(0, jnp.int32),
                         jnp.asarray(False)))
        p_full, nug_full, D, u = pseudo_of(y)
        mu_obs = mu_obs_from(p_full, nug_full, covparms)
        return y, delta, iters, bad, p_full, nug_full, D, mu_obs

    def run(z_obs, covparms, y0, prior_obs, max_iter, convg):
        return _run(dev, z_obs, covparms, y0, prior_obs, max_iter, convg)

    return run


def calculate_posterior_VL(z, spec, likelihood_model, covparms,
                           covmodel="matern", likparms=None, max_iter=50,
                           convg=1e-6, return_all=False, y_init=None,
                           prior_mean=None, verbose=False):
    """Latent posterior under a non-Gaussian likelihood via Vecchia-Laplace NR.

    Mirrors /root/reference/R/vecchia_laplace_NR.R:31-155.
    """
    import time
    t0 = time.time()
    likparms = dict(likparms or {"alpha": 2.0, "sigma": math.sqrt(0.1)})
    if isinstance(covmodel, str) and covmodel == "matern" and len(covparms) != 3:
        raise ValueError(f"Matern kernel requires 3 parameters but "
                         f"{len(covparms)} were passed")
    model = LIKELIHOOD_MODELS[likelihood_model](likparms)

    z = np.asarray(z, np.float64)
    obs_mask = ~np.isnan(z)
    z_obs = z[obs_mask]
    if model["invalid"](z_obs):
        raise ValueError("Data invalid for likelihood type. Make sure that "
                         "your data lies in the support of the likelihood "
                         "function.")
    if prior_mean is None:
        prior_mean = np.zeros(len(z))
    prior_mean = np.broadcast_to(np.asarray(prior_mean, np.float64), z.shape)
    prior_obs = prior_mean[obs_mask]

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    plan = get_plan(spec, dtype)
    key = ("vl", likelihood_model, str(covmodel), tuple(sorted(likparms.items())),
           obs_mask.tobytes())
    run = plan.compiled.get(key)
    if run is None:
        run = _vl_posterior_fn(spec, model, covmodel, obs_mask, dtype)
        plan.compiled[key] = run

    if y_init is None or np.any(np.isnan(np.atleast_1d(y_init))):
        y0 = prior_obs.copy()
    else:
        y0 = np.broadcast_to(np.asarray(y_init, np.float64), z.shape)[obs_mask]

    y, delta, iters, bad, p_full, nug_full, D, mu_obs = run(
        jnp.asarray(z_obs, dtype), jnp.asarray(covparms, dtype),
        jnp.asarray(y0, dtype), jnp.asarray(prior_obs, dtype),
        max_iter, convg)
    runtime = time.time() - t0
    if bool(bad):
        print(f"VL-NR hit NA on iteration {int(iters)}, convergence failed.")

    pseudo = np.full(len(z), np.nan)
    pseudo[obs_mask] = np.asarray(p_full)[obs_mask]
    out = {
        "mean": np.asarray(mu_obs) + prior_mean,
        "cnvgd": bool(delta < convg), "iter": int(iters), "runtime": runtime,
        "t": pseudo + prior_mean, "D": np.asarray(D),
        "y": np.asarray(y),
        "pseudo_full": np.asarray(p_full), "nug_full": np.asarray(nug_full),
        "data_link": model["link"], "model_llh": model["llh"],
        "prior_mean": prior_mean, "obs_mask": obs_mask,
        "likelihood_model": likelihood_model, "likparms": likparms,
    }
    if return_all:
        preds = vecchia_prediction(out["pseudo_full"], spec, covparms,
                                   out["nug_full"], covmodel=covmodel,
                                   return_values="meanmat")
        out["prediction"] = preds
        out["V"] = preds["V"]
    return out


def vecchia_laplace_likelihood(z, spec, likelihood_model, covparms,
                               likparms=None, covmodel="matern", max_iter=50,
                               convg=1e-5, return_all=False, y_init=None,
                               prior_mean=None, spec_iw=None):
    """Marginal loglikelihood under the Vecchia-Laplace approximation.

    Three terms (R/vecchia_laplace_NR.R:396-409): pseudo-marginal Vecchia
    loglik - pseudo conditional loglik + true data loglik.
    """
    post = calculate_posterior_VL(z, spec, likelihood_model, covparms,
                                  covmodel, likparms, max_iter, convg,
                                  False, y_init, prior_mean)
    if not post["cnvgd"]:
        import warnings
        warnings.warn("Convergence Failed, returning -Inf")
        return -np.inf
    return vecchia_laplace_likelihood_from_posterior(
        z, post, spec, covparms, covmodel=covmodel, spec_iw=spec_iw)


def vecchia_laplace_likelihood_from_posterior(z, post, spec, covparms,
                                              covmodel="matern", spec_iw=None):
    """Marginal VL loglik re-using an existing posterior (interweaved option)."""
    z = np.asarray(z, np.float64)
    obs_mask = post["obs_mask"]
    prior_mean = post["prior_mean"]
    z_pseudo = post["t"] - prior_mean
    D = post["D"]
    nug_pseudo = np.full(len(z), np.nan)
    nug_pseudo[obs_mask] = D

    if spec_iw is None:
        spec_iw = spec
        if spec.cond_yz in ("zy", "RVP", "LK"):
            # interweaved re-specification on the observed locations; the
            # reference collapses RVP/LK into cond.yz='zy'
            # (/root/reference/R/vecchia_specify.R:224), so its IW rewrite
            # (R/vecchia_laplace_NR.R:390-395) fires for all three
            from ..spec import vecchia_specify
            locs = np.empty((spec.n_obs, spec.locsord.shape[1]))
            locs[spec.ord_z] = spec.locsord[:spec.n_obs]
            spec_iw = vecchia_specify(locs, spec.m)

    pseudo_marg = vecchia_likelihood(z_pseudo, spec_iw, covparms,
                                     np.where(obs_mask, nug_pseudo, 1.0),
                                     covmodel)
    mean_obs = post["mean"]
    true_llh = float(post["model_llh"](jnp.asarray(mean_obs[obs_mask]),
                                       jnp.asarray(z[obs_mask])))
    resid = z_pseudo[obs_mask] - (mean_obs[obs_mask] - prior_mean[obs_mask])
    pseudo_cond = float(np.sum(
        -0.5 * resid ** 2 / D - 0.5 * np.log(D) - _SQRT2PI_LOG))
    return pseudo_marg - pseudo_cond + true_llh


def vecchia_laplace_prediction(vl_posterior, spec, covparms, pred_mean=0.0,
                               var_exact=False, covmodel="matern",
                               return_values="all"):
    """Prediction from VL pseudo-data, transformed through the data link.

    Mirrors /root/reference/R/vecchia_laplace_NR.R:523-551; `spec` must be a
    specification that includes prediction locations.
    """
    z_pseudo = vl_posterior["t"] - vl_posterior["prior_mean"]
    nug = np.full(len(z_pseudo), np.nan)
    nug[vl_posterior["obs_mask"]] = vl_posterior["D"]
    preds = vecchia_prediction(z_pseudo, spec, covparms, nug,
                               var_exact=var_exact, covmodel=covmodel,
                               return_values=return_values)
    link = vl_posterior["data_link"]
    mu_pred = preds["mu_pred"] + pred_mean
    mu_obs = preds["mu_obs"] + vl_posterior["prior_mean"]
    out = dict(preds)
    out["mu_pred"] = mu_pred
    out["mu_obs"] = mu_obs
    out["data_pred"] = np.asarray(link(jnp.asarray(mu_pred)))
    out["data_obs"] = np.asarray(link(jnp.asarray(mu_obs)))
    if preds.get("var_pred") is not None:
        sd_p = np.sqrt(preds["var_pred"])
        sd_o = np.sqrt(preds["var_obs"])
        out["data_pred_upper_quantile"] = np.asarray(link(jnp.asarray(mu_pred + _Z95 * sd_p)))
        out["data_pred_lower_quantile"] = np.asarray(link(jnp.asarray(mu_pred - _Z95 * sd_p)))
        out["data_obs_upper_quantile"] = np.asarray(link(jnp.asarray(mu_obs + _Z95 * sd_o)))
        out["data_obs_lower_quantile"] = np.asarray(link(jnp.asarray(mu_obs - _Z95 * sd_o)))
    return out
