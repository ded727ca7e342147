"""MRA / hierarchical conditioning, covmodel argument types, createL, getMatCov."""

import warnings

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from gpvecchia_tpu import vecchia_specify, vecchia_likelihood
from gpvecchia_tpu.hv import create_L, get_mat_cov
from gpvecchia_tpu.inference.prediction import vecchia_prediction

from reference_impl import dense_loglik, matern_np

COVPARMS = (1.0, 1.0, 0.5)
NUG = 1e-4


def _data(n=64, seed=1988):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, 2))
    K = matern_np(cdist(locs, locs), COVPARMS)
    z = rng.multivariate_normal(np.zeros(n), K + NUG * np.eye(n))
    return locs, z


def test_mra_likelihood_matches_dense_reference():
    locs, z = _data()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = vecchia_specify(locs, m=6, conditioning="mra")
    ll = vecchia_likelihood(z, spec, COVPARMS, NUG)
    llr = dense_loglik(z, spec, COVPARMS, NUG)
    assert abs(ll - llr) < 1e-8


def test_covmodel_argument_types_agree():
    """Reference test-covmodel-argument-types.r:41-62."""
    locs, z = _data(n=36)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = vecchia_specify(locs, m=4, conditioning="mra")
        Sigma = matern_np(cdist(spec.locsord, spec.locsord), COVPARMS)
        sel = get_mat_cov(spec, Sigma)
        lls = [
            vecchia_likelihood(z, spec, COVPARMS, NUG, covmodel="matern"),
            vecchia_likelihood(z, spec, COVPARMS, NUG, covmodel=Sigma),
            vecchia_likelihood(z, spec, COVPARMS, NUG, covmodel=sel),
        ]
    np.testing.assert_allclose(lls[1], lls[0], atol=1e-9)
    np.testing.assert_allclose(lls[2], lls[0], atol=1e-9)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mus = [vecchia_prediction(z, spec, COVPARMS, NUG, covmodel=cm,
                                  return_values="mean")["mu_obs"]
               for cm in ("matern", Sigma, sel)]
    np.testing.assert_allclose(mus[1], mus[0], atol=1e-9)
    np.testing.assert_allclose(mus[2], mus[0], atol=1e-9)


def test_get_mat_cov_variants_agree():
    """Reference test-getMatCov.r:38-51."""
    import scipy.sparse as sp
    locs, _ = _data(n=16)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec = vecchia_specify(locs, m=3, conditioning="mra")
    Sigma = matern_np(cdist(spec.locsord, spec.locsord), (0.5, 0.15, 0.5))
    L = np.linalg.cholesky(Sigma)

    def covfun_d(D):
        return matern_np(D, (0.5, 0.15, 0.5))

    M1 = get_mat_cov(spec, L, factor=True)
    M2 = get_mat_cov(spec, covfun_d)
    M3 = get_mat_cov(spec, Sigma)
    M4 = get_mat_cov(spec, sp.csr_matrix(L), factor=True)
    M5 = get_mat_cov(spec, Sigma + Sigma)
    np.testing.assert_allclose(np.nan_to_num(M2), np.nan_to_num(M3), atol=1e-10)
    np.testing.assert_allclose(np.nan_to_num(M1), np.nan_to_num(M2), atol=1e-10)
    np.testing.assert_allclose(np.nan_to_num(M4), np.nan_to_num(M2), atol=1e-10)
    np.testing.assert_allclose(np.nan_to_num(M1 + M3), np.nan_to_num(M5),
                               atol=1e-10)


def test_create_L_exact_when_full():
    """Reference test-createL.r:36-46: m=n-1 -> ||Sigma - LL^T||_inf ~ 0."""
    locs, _ = _data(n=40)
    spec = vecchia_specify(locs, m=39, cond_yz="y")
    L = create_L(spec, "matern", COVPARMS).toarray()
    Sigma0 = matern_np(cdist(locs, locs), COVPARMS)
    # rows are back-permuted to original order; columns stay ordered
    back = np.argsort(spec.ord, kind="stable")
    LL = L @ L.T
    np.testing.assert_allclose(LL, Sigma0, atol=1e-10)


def test_create_L_bad_covmodel_raises():
    locs, _ = _data(n=20)
    spec = vecchia_specify(locs, m=5)
    with pytest.raises(ValueError):
        create_L(spec, 12345)


def test_mra_special_cases_run():
    """Full-scale M=1, low-rank/MPP r=(m,1), independent blocks r=(0,m)."""
    locs, z = _data(n=60)
    lls = {}
    for name, opts in [("fullscale", {"M": 1}),
                       ("lowrank", {"r": [8, 1]}),
                       ("indep", {"r": [0, 8]})]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            spec = vecchia_specify(locs, m=8, conditioning="mra",
                                   mra_options=opts)
            lls[name] = vecchia_likelihood(z, spec, COVPARMS, NUG)
            llr = dense_loglik(z, spec, COVPARMS, NUG)
        assert abs(lls[name] - llr) < 1e-8, name


def test_firstm_equals_lowrank_mra():
    """Reference test-mra-firstm-equivalent.r:12-25."""
    locs, z = _data(n=50)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        spec_f = vecchia_specify(locs, m=6, conditioning="firstm")
        spec_m = vecchia_specify(locs, m=6, conditioning="mra",
                                 mra_options={"r": [6, 1]})
        ll_f = vecchia_likelihood(z, spec_f, COVPARMS, NUG)
        ll_m = vecchia_likelihood(z, spec_m, COVPARMS, NUG)
    np.testing.assert_allclose(ll_f, ll_m, atol=1e-9)


def test_native_mra_tree_matches_python():
    """csrc mra_tree is an exact behavioral twin of the Python BFS."""
    from gpvecchia_tpu.csrc import get_lib
    from gpvecchia_tpu.geometry.mra import build_mra_nnarray, get_mra_params
    if get_lib() is None:
        pytest.skip("native hostops unavailable")
    rng = np.random.default_rng(41)
    for n, m, opts in [(800, 10, None), (1000, 10, {"r": [0, 32]}),
                       (900, 12, {"r": [12, 1]}), (1100, 9, {"M": 2}),
                       (700, 8, {"J": 4})]:
        locs = rng.uniform(size=(n, 2))
        p = get_mra_params(n, opts, m)
        NN_n, eff_n = build_mra_nnarray(locs, p["J"], p["M"], p["r"])
        NN_p, eff_p = build_mra_nnarray(locs, p["J"], p["M"], p["r"],
                                        force_python=True)
        assert NN_n.shape == NN_p.shape
        assert np.array_equal(NN_n, NN_p)
        assert eff_n == eff_p
