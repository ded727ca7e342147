"""IC0 factor variant, exported ichol, and RVP/LK conditioning modes.

Covers the reference's ic0=TRUE path (/root/reference/R/vecchia_prediction.R:
77-84), the exported ichol wrapper (R/ichol.R:16-59), and the RVP/LK members
of the response-first family (R/vecchia_specify.R:191-225).
"""

import numpy as np
import pytest

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.likelihood import vecchia_likelihood
from gpvecchia_tpu.inference.prediction import vecchia_prediction
from gpvecchia_tpu.linalg.ichol import ichol
from reference_impl import dense_loglik, matern_np


def _data(n=80, seed=1988):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(n, 2)), rng.normal(size=n)


def test_ichol_full_mask_is_exact_cholesky():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(30, 30))
    M = A @ A.T + 30 * np.eye(30)
    L = ichol(M, np.ones_like(M))
    np.testing.assert_allclose(L, np.linalg.cholesky(M), rtol=1e-10)


def test_ichol_respects_mask():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(25, 25))
    M = A @ A.T + 25 * np.eye(25)
    S = np.tril(rng.random((25, 25)) < 0.3)
    np.fill_diagonal(S, True)
    L = ichol(M, S)
    assert np.all(L[~(S | S.T) & (np.tri(25) > 0)] == 0)
    # retained entries of L L^T reproduce M on the pattern (IC0 property)
    R = L @ L.T
    keep = np.tril(S, -1)
    np.testing.assert_allclose(R[keep], M[keep], rtol=1e-8)
    np.testing.assert_allclose(np.diag(R), np.diag(M), rtol=1e-8)


def test_ic0_likelihood_full_pattern_exact():
    # with m = n-1 the unfilled pattern is complete, so IC0 == exact Cholesky
    locs, z = _data(n=50)
    spec = vecchia_specify(locs, m=49, cond_yz="SGV", ic0=True)
    assert spec.ic0 and not __import__(
        "gpvecchia_tpu.plan", fromlist=["get_plan"]).get_plan(
            spec, np.float64).use_mf
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    llr = dense_loglik(z, spec, (1.0, 0.3, 0.5), 0.2)
    np.testing.assert_allclose(ll, llr, rtol=1e-9)


def test_ic0_likelihood_sgv_close():
    locs, z = _data(n=100)
    spec = vecchia_specify(locs, m=15, cond_yz="SGV", ic0=True)
    spec_x = vecchia_specify(locs, m=15, cond_yz="SGV")
    ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    llx = vecchia_likelihood(z, spec_x, (1.0, 0.3, 0.5), 0.2)
    assert np.isfinite(ll)
    # IC0 approximates the exact factor on the same pattern
    assert abs(ll - llx) < 0.02 * abs(llx)


def test_ic0_prediction_runs():
    rng = np.random.default_rng(7)
    locs, z = _data(n=80)
    spec = vecchia_specify(locs, m=12, locs_pred=rng.uniform(size=(20, 2)),
                           ic0=True)
    out = vecchia_prediction(z, spec, (1.0, 0.3, 0.5), 0.2)
    assert np.all(np.isfinite(out["mu_pred"]))
    assert np.all(out["var_pred"] > 0)


@pytest.mark.parametrize("mode", ["zy", "RVP", "LK"])
def test_zy_family_identity_and_dense_reference(mode):
    import warnings
    locs, z = _data(n=60)
    spec = vecchia_specify(locs, m=10, cond_yz=mode)
    assert spec.cond_yz == mode          # identity preserved (was collapsed)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ll = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    llr = dense_loglik(z, spec, (1.0, 0.3, 0.5), 0.2)
    np.testing.assert_allclose(ll, llr, rtol=1e-9)


def test_rvp_lk_zy_differ():
    locs, z = _data(n=60)
    lls = {}
    import warnings
    for mode in ("zy", "RVP", "LK"):
        spec = vecchia_specify(locs, m=10, cond_yz=mode)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            lls[mode] = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    # LK conditions purely on responses; zy/RVP shift to latents -> different
    assert lls["LK"] != lls["zy"]
