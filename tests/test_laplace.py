"""Vecchia-Laplace vs exact-covariance Laplace (reference test-VL-mra.r style)."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.laplace import (LIKELIHOOD_MODELS,
                                             calculate_posterior_VL,
                                             vecchia_laplace_likelihood,
                                             vecchia_laplace_prediction)

from reference_impl import matern_np

COVPARMS = (1.5, 0.2, 0.5)


def _latent_field(n=150, seed=1989):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, 2))
    K = matern_np(cdist(locs, locs), COVPARMS)
    y = rng.multivariate_normal(np.zeros(n), K)
    return locs, K, y, rng


def _sample(model, y, rng):
    if model == "gaussian":
        return y + rng.normal(scale=np.sqrt(0.1), size=len(y))
    if model == "logistic":
        return rng.binomial(1, 1 / (1 + np.exp(-y))).astype(float)
    if model == "poisson":
        return rng.poisson(np.exp(y)).astype(float)
    if model == "gamma":
        return rng.gamma(2.0, np.exp(y) / 2.0)
    raise ValueError(model)


def _laplace_exact(z, K, model_fns, max_iter=100, convg=1e-8):
    """Dense-covariance Laplace NR (reference .calculate_posterior_laplace)."""
    import jax.numpy as jnp
    y = np.ones(len(z))
    for _ in range(max_iter):
        D_inv = np.asarray(model_fns["hess"](jnp.asarray(y), jnp.asarray(z)))
        D = 1.0 / D_inv
        u = np.asarray(model_fns["score"](jnp.asarray(y), jnp.asarray(z)))
        t = D * u + y
        y_new = t - D * np.linalg.solve(np.diag(D) + K, t)
        if np.max(np.abs(y_new - y)) < convg:
            y = y_new
            break
        y = y_new
    return y


@pytest.mark.parametrize("model", ["gaussian", "logistic", pytest.param("poisson", marks=pytest.mark.slow), pytest.param("gamma", marks=pytest.mark.slow)])
def test_vl_posterior_close_to_exact_laplace(model):
    locs, K, y, rng = _latent_field()
    z = _sample(model, y, rng)
    fns = LIKELIHOOD_MODELS[model]({"alpha": 2.0, "sigma": np.sqrt(0.1)})
    y_exact = _laplace_exact(z, K, fns)
    spec = vecchia_specify(locs, m=25, cond_yz="y")
    post = calculate_posterior_VL(z, spec, model, COVPARMS)
    assert post["cnvgd"]
    rmse = np.sqrt(np.mean((post["mean"] - y_exact) ** 2))
    assert rmse < 0.16  # reference threshold range (test-VL-mra.r:90-95)


def test_vl_exact_with_full_conditioning():
    locs, K, y, rng = _latent_field(n=60)
    z = _sample("poisson", y, rng)
    fns = LIKELIHOOD_MODELS["poisson"]({})
    y_exact = _laplace_exact(z, K, fns)
    spec = vecchia_specify(locs, m=59, cond_yz="y")
    post = calculate_posterior_VL(z, spec, "poisson", COVPARMS, convg=1e-8)
    np.testing.assert_allclose(post["mean"], y_exact, atol=1e-4)


def test_vl_likelihood_runs_and_is_sane():
    locs, K, y, rng = _latent_field(n=100)
    z = _sample("logistic", y, rng)
    spec = vecchia_specify(locs, m=15, cond_yz="y")
    ll = vecchia_laplace_likelihood(z, spec, "logistic", COVPARMS)
    assert np.isfinite(ll)
    # worse parameters give lower marginal likelihood
    ll_bad = vecchia_laplace_likelihood(z, spec, "logistic", (20.0, 0.01, 0.5))
    assert ll > ll_bad


def test_vl_invalid_data_raises():
    locs, K, y, rng = _latent_field(n=40)
    z = np.full(40, -1.0)
    spec = vecchia_specify(locs, m=10)
    for model in ["logistic", "poisson", "gamma", "beta"]:
        with pytest.raises(ValueError):
            calculate_posterior_VL(z, spec, model, COVPARMS)


@pytest.mark.slow
def test_vl_prediction_links():
    locs, K, y, rng = _latent_field(n=80)
    z = _sample("poisson", y, rng)
    spec = vecchia_specify(locs, m=15, cond_yz="y")
    post = calculate_posterior_VL(z, spec, "poisson", COVPARMS)
    locs_pred = rng.uniform(size=(30, 2))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec_p = vecchia_specify(locs, m=15, locs_pred=locs_pred, cond_yz="y")
        preds = vecchia_laplace_prediction(post, spec_p, COVPARMS)
    assert np.all(preds["data_pred"] > 0)          # exp link
    assert np.all(preds["data_pred_upper_quantile"] >= preds["data_pred"])
    assert np.all(preds["data_pred_lower_quantile"] <= preds["data_pred"])


def test_vl_with_missing_data():
    locs, K, y, rng = _latent_field(n=80)
    z = _sample("gaussian", y, rng)
    z[5] = np.nan
    z[17] = np.nan
    spec = vecchia_specify(locs, m=15, cond_yz="y")
    post = calculate_posterior_VL(z, spec, "gaussian", COVPARMS)
    assert post["cnvgd"]
    assert np.all(np.isfinite(post["mean"]))
