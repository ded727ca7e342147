"""Covariance kernels vs closed forms and scipy (reference test-MaternFun.r)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sp

from gpvecchia_tpu.kernels.bessel import kv, log_kv
from gpvecchia_tpu.kernels.covariance import esqe, matern


def test_matern_closed_forms():
    d = jnp.asarray(np.linspace(0, 3, 50))
    var, rho = 1.3, 0.4
    s = np.asarray(d) / rho
    want = {
        0.5: var * np.exp(-s),
        1.5: var * (1 + np.sqrt(3) * s) * np.exp(-np.sqrt(3) * s),
        2.5: var * (1 + np.sqrt(5) * s + 5 * s**2 / 3) * np.exp(-np.sqrt(5) * s),
    }
    for nu, w in want.items():
        got = np.asarray(matern(d, jnp.asarray([var, rho, nu])))
        np.testing.assert_allclose(got, w, atol=1e-10)


def test_matern_general_nu_matches_scipy():
    # nu = 1.5/2.5 excluded: at those the reference (and we, for parity) use
    # the sqrt(3)/sqrt(5)-scaled closed forms, which differ from the plain
    # s^nu K_nu(s) convention of the general path (see src/Matern.cpp:43-71
    # vs :72-84 in the reference)
    d = np.linspace(0.0, 3.0, 40)
    for nu in [0.3, 0.8, 1.0, 2.0, 3.2, 0.5]:
        got = np.asarray(matern(jnp.asarray(d), jnp.asarray([1.0, 0.4, nu])))
        s = np.where(d == 0, 1.0, d / 0.4)
        want = np.where(
            d == 0, 1.0,
            2.0 ** (1 - nu) / sp.gamma(nu) * s ** nu * sp.kv(nu, s))
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_kv_accuracy_and_grads():
    nus = np.array([0.1, 0.7, 1.0, 2.3, 5.5, 9.9])
    xs = np.array([1e-5, 0.1, 1.0, 2.9, 3.1, 10.0, 80.0])
    NU, X = np.meshgrid(nus, xs, indexing="ij")
    got = np.asarray(kv(jnp.asarray(NU), jnp.asarray(X)))
    want = sp.kv(NU, X)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    gn, gx = jax.grad(lambda n, x: jnp.sum(log_kv(n, x)), argnums=(0, 1))(
        jnp.asarray(NU), jnp.asarray(X))
    assert np.all(np.isfinite(np.asarray(gn)))
    assert np.all(np.isfinite(np.asarray(gx)))
    h = 1e-7 * X
    fd = (np.log(sp.kv(NU, X + h)) - np.log(sp.kv(NU, X - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(gx), fd, rtol=1e-4, atol=1e-6)


def test_esqe():
    d = jnp.asarray(np.linspace(0, 2, 20))
    p = jnp.asarray([0.7, 0.5, 0.3, 0.2])
    got = np.asarray(esqe(d, p))
    dd = np.asarray(d)
    want = 0.7 * np.exp(-dd / 0.5) + 0.3 * np.exp(-((dd / 0.2) ** 2))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_matern_grad_wrt_nu():
    f = lambda nu: jnp.sum(matern(jnp.asarray([0.5, 1.0]), jnp.stack(
        [jnp.asarray(1.0), jnp.asarray(0.4), nu])))
    g = jax.grad(f)(jnp.asarray(0.8))
    h = 1e-6
    fd = (float(f(jnp.asarray(0.8 + h))) - float(f(jnp.asarray(0.8 - h)))) / (2 * h)
    assert abs(float(g) - fd) < 1e-5


def test_user_location_pair_covariance():
    """String / dist-callable / location-pair-callable consistency
    (reference covmodel argument types, test-covmodel-argument-types.r and
    createU.R:93-108)."""
    import numpy as np
    import jax.numpy as jnp
    from gpvecchia_tpu import vecchia_specify
    from gpvecchia_tpu.inference.likelihood import vecchia_likelihood
    from gpvecchia_tpu.kernels.covariance import matern

    rng = np.random.default_rng(11)
    locs = rng.uniform(size=(80, 2))
    z = rng.normal(size=80)
    spec = vecchia_specify(locs, m=10, cond_yz="SGV")
    cp = (1.3, 0.25, 0.5)

    ll_str = vecchia_likelihood(z, spec, cp, 0.2)

    def distfun(dist, covparms):
        return matern(dist, covparms)

    ll_dist = vecchia_likelihood(z, spec, cp, 0.2, covmodel=distfun)

    def locfun(locs1, locs2, covparms):
        d2 = jnp.sum((locs1 - locs2) ** 2, axis=-1)
        pos = d2 > 0
        d = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
        return matern(d, covparms)

    ll_loc = vecchia_likelihood(z, spec, cp, 0.2, covmodel=locfun)
    np.testing.assert_allclose(ll_dist, ll_str, rtol=1e-12)
    np.testing.assert_allclose(ll_loc, ll_str, rtol=1e-12)
