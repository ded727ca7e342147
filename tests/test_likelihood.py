"""Likelihood correctness: dense-GP oracle and literal reference reimplementation.

Mirrors the reference's strongest oracles (SURVEY.md section 4):
Vecchia(m=n-1) == exact dense GP, plus intermediate-level agreement with a
literal dense reimplementation of createU/vecchia_likelihood_U.
"""

import warnings

import numpy as np
import pytest
from scipy.spatial.distance import cdist
from scipy.stats import multivariate_normal

from gpvecchia_tpu import vecchia_specify, vecchia_likelihood

from reference_impl import dense_loglik, matern_np


def _data(n=60, d=2, seed=1988, covparms=(1.0, 0.3, 0.5), nug=0.2):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, d))
    Sigma = matern_np(cdist(locs, locs), covparms)
    z = rng.multivariate_normal(np.zeros(n), Sigma + nug * np.eye(n))
    ll = multivariate_normal.logpdf(z, np.zeros(n), Sigma + nug * np.eye(n))
    return locs, z, ll


COND_MODES = ["y", "z", "SGV", "SGVT"]


@pytest.mark.parametrize("cond", COND_MODES)
def test_exact_when_m_full(cond):
    locs, z, ll_exact = _data()
    spec = vecchia_specify(locs, m=len(z) - 1, cond_yz=cond)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    assert abs(ll - ll_exact) < 1e-8


@pytest.mark.parametrize("cond", COND_MODES)
@pytest.mark.parametrize("m", [5, 15])
def test_matches_dense_reference(cond, m):
    locs, z, _ = _data()
    spec = vecchia_specify(locs, m=m, cond_yz=cond)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    llr = dense_loglik(z, spec, (1.0, 0.3, 0.5), 0.2)
    assert abs(ll - llr) < 1e-9


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 0.8])
def test_matern_smoothness_variants(nu):
    locs, z, _ = _data(covparms=(1.0, 0.3, nu))
    spec = vecchia_specify(locs, m=15)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, nu), 0.2)
    llr = dense_loglik(z, spec, (1.0, 0.3, nu), 0.2)
    assert abs(ll - llr) < 1e-6


def test_approximation_close_to_exact():
    locs, z, ll_exact = _data(n=120)
    spec = vecchia_specify(locs, m=20)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    assert abs(ll - ll_exact) < 0.5


def test_m0_independent():
    locs, z, _ = _data(n=40)
    spec = vecchia_specify(locs, m=0)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    # independent model: sum of univariate normal logpdfs, var = sig2 + nugget
    from scipy.stats import norm
    ll_indep = norm.logpdf(z, scale=np.sqrt(1.0 + 0.2)).sum()
    assert abs(ll - ll_indep) < 1e-8


def test_nugget_vector_and_na_handling():
    locs, z, _ = _data(n=50)
    nug = np.linspace(0.1, 0.4, 50)
    spec = vecchia_specify(locs, m=10)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llr = dense_loglik(z, spec, (1.0, 0.3, 0.5), nug)
    assert abs(ll - llr) < 1e-9
    # NA data: inflate nuggets, mean-fill (R/vecchia_likelihood.R:45-58)
    z_na = z.copy()
    z_na[3] = np.nan
    ll_na = vecchia_likelihood(z_na, spec, (1.0, 0.3, 0.5), nug)
    z_fill = z.copy()
    z_fill[3] = np.nanmean(z_na)
    nug_fill = nug.copy()
    nug_fill[3] = np.nanvar(z_na, ddof=1) * 1e8
    llr_na = dense_loglik(z_fill, spec, (1.0, 0.3, 0.5), nug_fill)
    assert abs(ll_na - llr_na) < 1e-9


def test_esqe_kernel():
    locs, z, _ = _data()
    spec = vecchia_specify(locs, m=12)
    cp = (0.8, 0.5, 0.4, 0.2)
    ll = vecchia_likelihood(z, spec, cp, 0.2, covmodel="esqe")

    def esqe_np(D, p):
        return p[0] * np.exp(-D / p[1]) + p[2] * np.exp(-(D / p[3]) ** 2)

    llr = dense_loglik(z, spec, cp, 0.2, kernel=esqe_np)
    assert abs(ll - llr) < 1e-9


def test_covmodel_matrix_matches_string():
    locs, z, _ = _data()
    spec = vecchia_specify(locs, m=12)
    ll_s = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    covmat = matern_np(cdist(spec.locsord, spec.locsord), (1.0, 0.3, 0.5))
    ll_m = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2, covmodel=covmat)
    assert abs(ll_s - ll_m) < 1e-9


@pytest.mark.slow
def test_gradient_finite():
    import jax
    import jax.numpy as jnp
    from gpvecchia_tpu import loglik_fn

    locs, z, _ = _data(n=40)
    spec = vecchia_specify(locs, m=8)
    fn = loglik_fn(spec)
    g = jax.grad(lambda p: fn(jnp.asarray(z), p[:3], p[3:4][0]))(
        jnp.asarray([1.0, 0.3, 0.5, 0.2]))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # finite-difference check on the variance parameter
    eps = 1e-6
    lp = vecchia_likelihood(z, spec, (1.0 + eps, 0.3, 0.5), 0.2)
    lm = vecchia_likelihood(z, spec, (1.0 - eps, 0.3, 0.5), 0.2)
    assert abs((lp - lm) / (2 * eps) - g[0]) < 1e-4


def test_zy_runs():
    locs, z, _ = _data(n=40)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = vecchia_specify(locs, m=8, cond_yz="zy")
        ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
        llr = dense_loglik(z, spec, (1.0, 0.3, 0.5), 0.2)
    assert abs(ll - llr) < 1e-9


def test_golden_values():
    """Fixed-seed golden log-likelihoods (regression guard, mirroring the
    reference's hard-coded golden value in test-indep-blocks.r:31-36)."""
    rng = np.random.default_rng(1988)
    locs = rng.uniform(size=(200, 2))
    z = rng.normal(size=200)
    golden = {"SGV": -398.7167975671508,
              "y": -397.881292926102,
              "z": -398.55472750828096}
    for cond, want in golden.items():
        spec = vecchia_specify(locs, m=12, cond_yz=cond)
        ll = vecchia_likelihood(z, spec, (1.2, 0.25, 0.5), 0.15)
        np.testing.assert_allclose(ll, want, rtol=1e-12)
