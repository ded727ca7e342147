"""Parameter estimation (vecchia_estimate / vecchia_pred equivalents)."""

import numpy as np
import pytest
from scipy.spatial.distance import cdist

from gpvecchia_tpu.fit.mle import vecchia_estimate, vecchia_pred

from reference_impl import matern_np

pytestmark = pytest.mark.slow

TRUE = (2.0, 0.2, 0.5)
NUG = 0.2


def _data(n=400, seed=7):
    rng = np.random.default_rng(seed)
    locs = rng.uniform(size=(n, 2))
    K = matern_np(cdist(locs, locs), TRUE)
    z = rng.multivariate_normal(np.zeros(n), K + NUG * np.eye(n))
    return locs, z + 1.0  # constant trend of 1


@pytest.mark.parametrize("method", ["lbfgs", "nelder-mead"])
def test_estimate_recovers_parameters(method):
    locs, data = _data()
    est = vecchia_estimate(data, locs, m=15, method=method, output_level=0,
                           max_iter=200)
    # constant trend = sample mean (spatial correlation shifts it from 1.0)
    assert abs(est["beta_hat"][0] - data.mean()) < 1e-8
    assert 0.4 < est["theta_hat"][0] / TRUE[0] < 2.5
    assert 0.3 < est["theta_hat"][3] / NUG < 3.0
    # the MLE must beat the true parameters in Vecchia loglik
    from gpvecchia_tpu import vecchia_likelihood
    ll_true = vecchia_likelihood(data - data.mean(), est["spec"],
                                 TRUE, NUG)
    assert est["loglik"] >= ll_true - 1e-6


def test_estimate_and_predict_pipeline():
    locs, data = _data(n=300)
    est = vecchia_estimate(data, locs, m=15, output_level=0, max_iter=100)
    rng = np.random.default_rng(1)
    locs_pred = rng.uniform(size=(50, 2))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        preds = vecchia_pred(est, locs_pred, m=20)
    assert preds["mean_pred"].shape == (50,)
    assert np.all(np.isfinite(preds["mean_pred"]))
    assert np.all(preds["var_pred"] > 0)
    # predictions in a sane range around the trend
    assert np.all(np.abs(preds["mean_pred"] - 1.0) < 6 * np.sqrt(TRUE[0]))


def test_estimate_no_trend_and_user_X():
    locs, data = _data(n=200)
    est_none = vecchia_estimate(data, locs, X=None, m=10, output_level=0,
                                max_iter=50)
    assert est_none["trend"] == "none"
    X = np.column_stack([np.ones(200), locs[:, 0]])
    est_x = vecchia_estimate(data, locs, X=X, m=10, output_level=0,
                             max_iter=50)
    assert est_x["beta_hat"].shape == (2,)
