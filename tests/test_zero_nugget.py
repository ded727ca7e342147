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


def test_unsupported_modes_raise():
    locs, z, nug = _data(n=50)
    rng = np.random.default_rng(5)
    spec = vecchia_specify(locs, m=10, locs_pred=rng.uniform(size=(10, 2)))
    with pytest.raises(NotImplementedError):
        vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), nug)


def test_zero_nugget_unsupported_paths_raise():
    """The zy family / ic0 / obspred prediction ordering are guarded with a
    clear error for zero nuggets (the reference handles these by row
    deletion, /root/reference/R/createU.R:173-193; here the known-points
    variant covers the general path and the rest raise rather than return
    silently wrong values — an ic0 probe measured a 12.8-nat error when the
    guard was bypassed)."""
    rng = np.random.default_rng(5)
    n = 50
    locs = rng.uniform(size=(n, 2))
    z = rng.normal(size=n)
    nug = np.full(n, 0.1)
    nug[::5] = 0.0
    for kw in (dict(cond_yz="zy"), dict(cond_yz="RVP"),
               dict(cond_yz="SGV", ic0=True)):
        spec = vecchia_specify(locs, m=10, **kw)
        with pytest.raises(NotImplementedError, match="zero nuggets"):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                vecchia_likelihood(z, spec, [1.0, 0.2, 0.5], nug)
