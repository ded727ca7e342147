"""Zero-nugget (exact observation) handling vs the dense MVN oracle.

The density of z ~ N(0, K + diag(nuggets)) is perfectly well defined with
zeros on the nugget diagonal; the Vecchia likelihood must reproduce it with
m = n-1 and approximate it otherwise, NaN-free — the reference handles this
by deleting Inf-diagonal rows and permuting (/root/reference/R/createU.R:
83-86,173-193); here zero-nugget points become 'known' response-type columns.
"""

import warnings

import numpy as np
import pytest

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.likelihood import vecchia_likelihood
from gpvecchia_tpu.inference.prediction import vecchia_prediction
from reference_impl import matern_np


def _dense_ll(z, locs, covparms, nuggets):
    D = np.linalg.norm(locs[:, None] - locs[None, :], axis=-1)
    K = matern_np(D, covparms) + np.diag(nuggets)
    sign, logdet = np.linalg.slogdet(K)
    assert sign > 0
    return -0.5 * (len(z) * np.log(2 * np.pi) + logdet
                   + z @ np.linalg.solve(K, z))


def _data(n=60, seed=1996, frac_zero=0.3):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, 2))
    z = rng.normal(size=n)
    nug = rng.uniform(0.1, 0.4, size=n)
    nug[rng.random(n) < frac_zero] = 0.0
    assert (nug == 0).any() and (nug > 0).any()
    return locs, z, nug


def test_exact_match_m_full():
    locs, z, nug = _data(n=50)
    spec = vecchia_specify(locs, m=49)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llr = _dense_ll(z, locs, (1.0, 0.3, 0.5), nug)
    assert np.isfinite(ll)
    np.testing.assert_allclose(ll, llr, rtol=1e-8)


@pytest.mark.parametrize("cond", ["SGV", "y", "z"])
def test_finite_and_close(cond):
    locs, z, nug = _data(n=80)
    spec = vecchia_specify(locs, m=15, cond_yz=cond)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llr = _dense_ll(z, locs, (1.0, 0.3, 0.5), nug)
    assert np.isfinite(ll)
    assert abs(ll - llr) < 0.05 * abs(llr)


def test_all_zero_nuggets():
    locs, z, _ = _data(n=40)
    nug = np.zeros(40)
    spec = vecchia_specify(locs, m=39)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llr = _dense_ll(z, locs, (1.0, 0.3, 0.5), nug + 1e-12)
    assert np.isfinite(ll)
    np.testing.assert_allclose(ll, llr, rtol=1e-4)


def test_prediction_exact_points():
    locs, z, nug = _data(n=50)
    spec = vecchia_specify(locs, m=49)
    out = vecchia_prediction(z, spec, (1.0, 0.3, 0.5), nug)
    zero = nug == 0
    # at exact observations the posterior interpolates: mean = datum, var = 0
    np.testing.assert_allclose(out["mu_obs"][zero], z[zero], atol=1e-8)
    np.testing.assert_allclose(out["var_obs"][zero], 0.0, atol=1e-8)
    # dense-oracle posterior at the nonzero points
    D = np.linalg.norm(locs[:, None] - locs[None, :], axis=-1)
    K = matern_np(D, (1.0, 0.3, 0.5))
    Sigma = K + np.diag(nug)
    mu_ref = K @ np.linalg.solve(Sigma, z)
    np.testing.assert_allclose(out["mu_obs"], mu_ref, atol=1e-6)


@pytest.mark.parametrize("kw", [dict(cond_yz="zy"), dict(cond_yz="RVP"),
                                dict(cond_yz="LK"),
                                dict(cond_yz="SGV", ic0=True)])
def test_zy_family_and_ic0_match_dense_oracle(kw):
    """Zero nuggets on the response-first family and the ic0 variant: the
    known-twin index surgery (likelihood.zero_nugget_variant) must agree
    with the dense-U oracle evaluated on the transformed spec (the
    reference covers these paths by deleting Inf-diagonal rows,
    /root/reference/R/createU.R:173-193)."""
    from reference_impl import dense_loglik
    from gpvecchia_tpu.inference.likelihood import zero_nugget_variant

    locs, z, nug = _data(n=60)
    spec = vecchia_specify(locs, m=12, **kw)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llo = dense_loglik(z, zero_nugget_variant(spec, nug), (1.0, 0.3, 0.5),
                       nug)
    assert np.isfinite(ll)
    np.testing.assert_allclose(ll, llo, rtol=2e-5)


def test_ic0_full_pattern_zero_nugget_exact():
    # with m = n-1 the unfilled pattern is complete, so IC0 == exact
    # Cholesky and the zero-nugget likelihood must match the dense MVN
    locs, z, nug = _data(n=50)
    spec = vecchia_specify(locs, m=49, cond_yz="SGV", ic0=True)
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)
    llr = _dense_ll(z, locs, (1.0, 0.3, 0.5), nug)
    np.testing.assert_allclose(ll, llr, rtol=1e-5)


@pytest.mark.parametrize("cond", [None, "RVP", "SGV"])
def test_obspred_prediction_zero_nuggets(cond):
    """Prediction with zero nuggets in obspred ordering (all conditioning
    families): posterior must match the dense oracle, interpolate exactly
    at the exact observations, and carry zero variance there."""
    from reference_impl import dense_posterior
    from gpvecchia_tpu.inference.likelihood import zero_nugget_variant

    locs, z, nug = _data(n=60)
    rng = np.random.default_rng(7)
    locs_pred = rng.uniform(size=(15, 2))
    kw = {} if cond is None else dict(cond_yz=cond)
    if cond == "SGV":
        kw["ordering_pred"] = "obspred"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = vecchia_specify(locs, m=12, locs_pred=locs_pred, **kw)
        out = vecchia_prediction(z, spec, (1.0, 0.3, 0.5), nug)
    ref = dense_posterior(z, zero_nugget_variant(spec, nug), (1.0, 0.3, 0.5),
                          nug)
    zero = nug == 0
    np.testing.assert_allclose(out["mu_obs"][zero], z[zero], atol=1e-8)
    np.testing.assert_allclose(out["var_obs"][zero], 0.0, atol=1e-8)
    for kk in ("mu_obs", "mu_pred", "var_obs", "var_pred"):
        np.testing.assert_allclose(np.asarray(out[kk]), ref[kk], atol=1e-4)
