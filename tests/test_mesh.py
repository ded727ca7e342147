"""Multi-device correctness on the virtual CPU mesh (SURVEY §2.4/§4).

conftest forces 8 virtual CPU devices; the sharded likelihood must agree
with the single-device value (and gradient) to fp64 round-off on 1/2/4/8
device meshes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.likelihood import loglik_fn
from gpvecchia_tpu.parallel.mesh import make_mesh, sharded_loglik_core


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1988)
    n = 600
    locs = rng.uniform(size=(n, 2))
    spec = vecchia_specify(locs, m=12, cond_yz="SGV")
    z = rng.normal(size=n)
    covparms = np.array([1.3, 0.25, 0.5])
    nuggets = np.full(n, 0.15)
    ref = float(loglik_fn(spec, "matern")(z, covparms, nuggets))
    return spec, z, covparms, nuggets, ref


@pytest.mark.parametrize("ndev", [pytest.param(1, marks=pytest.mark.slow), 2, pytest.param(4, marks=pytest.mark.slow), 8])
def test_sharded_matches_unsharded(problem, ndev):
    spec, z, covparms, nuggets, ref = problem
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = make_mesh(jax.devices()[:ndev], chains=1)
    core, sdev = sharded_loglik_core(spec, "matern", mesh=mesh)
    val = float(jax.jit(core)(sdev, jnp.asarray(z), jnp.asarray(covparms),
                              jnp.asarray(nuggets)))
    np.testing.assert_allclose(val, ref, rtol=1e-12)


@pytest.mark.slow
def test_sharded_gradient_matches(problem):
    spec, z, covparms, nuggets, ref = problem
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")

    def neg(core):
        return lambda p, dev: -core(dev, jnp.asarray(z), p,
                                    jnp.asarray(nuggets))

    mesh = make_mesh(jax.devices()[:4], chains=1)
    core_s, sdev = sharded_loglik_core(spec, "matern", mesh=mesh)
    mesh1 = make_mesh(jax.devices()[:1], chains=1)
    core_1, sdev1 = sharded_loglik_core(spec, "matern", mesh=mesh1)
    p = jnp.asarray(covparms)
    g4 = jax.jit(jax.grad(neg(core_s)))(p, sdev)
    g1 = jax.jit(jax.grad(neg(core_1)))(p, sdev1)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g1), rtol=1e-10)


def test_chains_axis(problem):
    spec, z, covparms, nuggets, ref = problem
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = make_mesh(jax.devices()[:4], chains=2)
    core, sdev = sharded_loglik_core(spec, "matern", mesh=mesh)
    ps = jnp.asarray(np.stack([covparms, covparms * 1.1]))

    @jax.jit
    def batched(ps, dev):
        return jax.vmap(lambda p: core(dev, jnp.asarray(z), p,
                                       jnp.asarray(nuggets)))(ps)

    vals = np.asarray(batched(ps, sdev))
    np.testing.assert_allclose(vals[0], ref, rtol=1e-12)
    assert vals[0] != vals[1]


@pytest.mark.slow
def test_mf_levels_sharded_and_collectives_emitted(problem):
    """The multifrontal factor must actually SHARD across the mesh (round-3
    regression: it was silently replicated, so 'sharded' tests passed while
    every device redundantly computed the whole tree).  Asserts (a) the deep
    levels' node arrays carry a 'rows' sharding — per-device factor work is
    ~1/n_dev by construction since contiguous node ranges are subtrees —
    and (b) the compiled HLO contains collectives (the top-level transition
    must communicate, not replicate)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(7)
    n = 5000                      # deep enough for >= 2 levels of 8+ nodes
    locs = rng.uniform(size=(n, 2))
    spec = vecchia_specify(locs, m=10, cond_yz="SGV")
    z = rng.normal(size=n)
    covparms = np.array([1.3, 0.25, 0.5])
    nuggets = np.full(n, 0.15)
    ref = float(loglik_fn(spec, "matern")(z, covparms, nuggets))
    mesh = make_mesh(jax.devices()[:8], chains=1)
    core, sdev = sharded_loglik_core(spec, "matern", mesh=mesh)
    assert "mf" in sdev, "problem too small for the multifrontal path"
    n_dev = 8
    sharded_levels = 0
    for lv in sdev["mf"]["levels"]:
        N = lv["piv_ids"].shape[0]
        parts = lv["piv_ids"].sharding.spec
        if N >= n_dev:
            assert parts and parts[0] == "rows", (N, parts)
            sharded_levels += 1
        else:
            assert not parts or parts[0] is None
    assert sharded_levels >= 2

    lowered = jax.jit(core).lower(sdev, jnp.asarray(z), jnp.asarray(covparms),
                                  jnp.asarray(nuggets))
    hlo = lowered.compile().as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo) or (
        "reduce-scatter" in hlo), "no collectives in compiled HLO"
    # and the value still matches the single-device reference
    val = float(jax.jit(core)(sdev, jnp.asarray(z), jnp.asarray(covparms),
                              jnp.asarray(nuggets)))
    np.testing.assert_allclose(val, ref, rtol=1e-12)
