"""Spec serialization round-trip (SURVEY §5 checkpoint analogue)."""

import numpy as np

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.likelihood import vecchia_likelihood
from gpvecchia_tpu.utils.serialize import load_spec, save_spec


def test_spec_roundtrip(tmp_path):
    rng = np.random.default_rng(1988)
    locs = rng.uniform(size=(120, 2))
    z = rng.normal(size=120)
    spec = vecchia_specify(locs, m=10, cond_yz="SGV")
    path = tmp_path / "spec.npz"
    save_spec(spec, path)
    spec2 = load_spec(path)
    for f in ("locsord", "NNarray", "cond_latent", "has_latent", "has_obs",
              "ord", "ord_z"):
        np.testing.assert_array_equal(getattr(spec, f), getattr(spec2, f))
    assert (spec2.cond_yz, spec2.ic0, spec2.n_obs, spec2.n_pred) == \
        (spec.cond_yz, spec.ic0, spec.n_obs, spec.n_pred)
    ll1 = vecchia_likelihood(z, spec, (1.0, 0.3, 0.5), 0.2)
    ll2 = vecchia_likelihood(z, spec2, (1.0, 0.3, 0.5), 0.2)
    np.testing.assert_allclose(ll1, ll2, rtol=1e-14)


def test_pred_spec_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    locs = rng.uniform(size=(80, 2))
    spec = vecchia_specify(locs, m=8, locs_pred=rng.uniform(size=(15, 2)))
    path = tmp_path / "spec.npz"
    save_spec(spec, path)
    spec2 = load_spec(path)
    assert spec2.n_pred == 15 and spec2.ordering_pred == spec.ordering_pred
    np.testing.assert_array_equal(spec.NNarray, spec2.NNarray)
