"""Fused multifrontal level kernels (interpret mode) vs dense reference.

Validates linalg/pallas_level.py: the monotone-panel extend-add, the
in-VMEM factor, the augmented-RHS row (which must reproduce the forward
solve y = L_pp^{-1} b and the RHS Schur propagation), and both custom
VJPs against JAX autodiff of an equivalent dense formulation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpvecchia_tpu.linalg import pallas_level as PL


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PL, "INTERPRET", True)
    # keep compile sizes small in interpret mode
    monkeypatch.setattr(PL, "_MAX_GB", 2)
    PL._make_fused.cache_clear()
    PL._make_leaf.cache_clear()
    yield
    PL._make_fused.cache_clear()
    PL._make_leaf.cache_clear()


def _rand_ext(rng, N, Bc1, F1):
    """Monotone bijections [0, Bc1) -> sorted positions of F1 (aug last)."""
    ext = np.full((N, 2, F1), -1, np.int32)
    for n in range(N):
        for s in (0, 1):
            pos = np.sort(rng.choice(F1 - 1, size=Bc1 - 1, replace=False))
            ext[n, s, pos] = np.arange(Bc1 - 1)
            ext[n, s, F1 - 1] = Bc1 - 1          # aug row -> aug row
    return ext


def _dense_level(ch, ext, diag, rhs, P, F1):
    """Reference: front = sum_s G_s upd_s G_s^T + diag + rhs row/col."""
    N, _, Bc1, _ = ch.shape
    ch = np.asarray(ch)
    front_np = np.zeros((N, F1, F1), np.float32)
    for n in range(N):
        for s in (0, 1):
            g = np.asarray(ext[n, s])
            idx = np.flatnonzero(g >= 0)
            front_np[n][np.ix_(idx, idx)] += ch[n, s][
                np.ix_(g[idx], g[idx])]
    front = jnp.asarray(front_np) + jax.vmap(jnp.diag)(diag)
    front = front.at[:, F1 - 1, :].add(rhs)
    front = front.at[:, :, F1 - 1].add(rhs)
    return front


def _dense_factor(front, P):
    L_pp = jnp.linalg.cholesky(front[:, :P, :P])
    L_bp = jax.lax.linalg.triangular_solve(
        L_pp, front[:, P:, :P], left_side=False, lower=True,
        transpose_a=True)
    upd = front[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", L_bp, L_bp)
    return L_pp, L_bp, upd


def _mk_level_inputs(seed=0, N=4, P=13, B=9, Bc=17):
    rng = np.random.default_rng(seed)
    B1 = B + 1
    Bc1 = Bc + 1
    F1 = P + B1
    Bc1p = PL._ru(max(Bc1, PL._srows(Bc1)), 8)
    ch = rng.normal(size=(N, 2, Bc1, Bc1)).astype(np.float32)
    ch = ch + np.swapaxes(ch, 2, 3)
    chp = np.zeros((N, 2, Bc1p, Bc1), np.float32)
    chp[:, :, :Bc1] = ch
    ext = _rand_ext(rng, N, Bc1, F1)
    starts, rel, T, F1p = PL.level_kernel_plan(ext, Bc1)
    diag = (rng.uniform(1.0, 2.0, size=(N, F1)).astype(np.float32)
            + 4.0 * F1)        # strong diagonal -> SPD pivots
    diag[:, F1 - 1] = 0.0
    rhs = rng.normal(size=(N, F1)).astype(np.float32)
    rhs[:, F1 - 1] = 0.0
    diag2 = np.zeros((N, 8, F1p), np.float32)
    diag2[:, 0, :F1] = diag
    diag2[:, 1, :F1] = rhs
    return (ch, chp, ext, starts, rel, T, F1p, diag, rhs, diag2,
            P, B1, Bc1, F1)


def test_fused_level_matches_dense():
    (ch, chp, ext, starts, rel, T, F1p, diag, rhs, diag2,
     P, B1, Bc1, F1) = _mk_level_inputs()
    L_pp, L_bp, upd = PL.fused_level(
        jnp.asarray(chp), jnp.asarray(starts), jnp.asarray(rel),
        jnp.asarray(diag2), P, B1, Bc1, F1, T)
    front = _dense_level(jnp.asarray(ch), ext, jnp.asarray(diag),
                         jnp.asarray(rhs), P, F1)
    L_pp_r, L_bp_r, upd_r = _dense_factor(front, P)
    np.testing.assert_allclose(np.asarray(L_pp), np.asarray(L_pp_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(L_bp), np.asarray(L_bp_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(upd)[:, :B1, :],
                               np.asarray(upd_r), rtol=0, atol=2e-4)
    # the augmented row IS the forward solve
    b = front[:, F1 - 1, :P]
    y = jax.lax.linalg.triangular_solve(
        L_pp_r, b[:, None, :], left_side=False, lower=True,
        transpose_a=True)[:, 0, :]
    np.testing.assert_allclose(np.asarray(L_bp[:, B1 - 1, :]),
                               np.asarray(y), rtol=0, atol=2e-4)


@pytest.mark.slow
def test_fused_level_vjp_matches_autodiff():
    (ch, chp, ext, starts, rel, T, F1p, diag, rhs, diag2,
     P, B1, Bc1, F1) = _mk_level_inputs(seed=3, N=2, P=9, B=6, Bc=11)
    w1 = np.random.default_rng(7).normal(size=(2, B1 + 2, P)).astype(
        np.float32)

    def loss_fused(chp_in):
        L_pp, L_bp, upd = PL.fused_level(
            chp_in, jnp.asarray(starts), jnp.asarray(rel),
            jnp.asarray(diag2), P, B1, Bc1, F1, T)
        return (jnp.sum(jnp.log(jnp.diagonal(L_pp, axis1=1, axis2=2)))
                + jnp.sum(jnp.asarray(w1)[:, :B1] * L_bp)
                + jnp.sum(jnp.sin(upd[:, :B1])))

    def loss_dense(chp_in):
        chd = chp_in[:, :, :Bc1, :]
        oh = (jnp.asarray(ext)[..., None]
              == jnp.arange(Bc1)[None, None, None, :]).astype(jnp.float32)
        front = jnp.einsum("nsfb,nsbc,nsgc->nfg", oh, chd, oh)
        front = front + jax.vmap(jnp.diag)(jnp.asarray(diag))
        front = front.at[:, F1 - 1, :].add(jnp.asarray(rhs))
        front = front.at[:, :, F1 - 1].add(jnp.asarray(rhs))
        L_pp, L_bp, upd = _dense_factor(front, P)
        return (jnp.sum(jnp.log(jnp.diagonal(L_pp, axis1=1, axis2=2)))
                + jnp.sum(jnp.asarray(w1)[:, :B1] * L_bp)
                + jnp.sum(jnp.sin(upd)))

    chj = jnp.asarray(chp)
    v1, g1 = jax.value_and_grad(loss_fused)(chj)
    v2, g2 = jax.value_and_grad(loss_dense)(chj)
    assert abs(float(v1) - float(v2)) < 2e-3
    # the dense autodiff also produces (symmetric) cotangents; the fused
    # bwd symmetrizes explicitly — compare symmetrized grads
    g1s = np.asarray(g1)[:, :, :Bc1, :]
    g2s = np.asarray(g2)[:, :, :Bc1, :]
    g1sym = 0.5 * (g1s + np.swapaxes(g1s, 2, 3))
    g2sym = 0.5 * (g2s + np.swapaxes(g2s, 2, 3))
    np.testing.assert_allclose(g1sym, g2sym, rtol=0, atol=5e-3)


def _mk_leaf_inputs(seed=1, N=2, P=11, B=7, EL=15, K=5):
    rng = np.random.default_rng(seed)
    B1 = B + 1
    F1 = P + B1
    ELp = PL._ru(EL, 8)
    Kp = K + 1
    u = np.zeros((N, ELp, Kp), np.float32)
    epos = np.full((N, ELp, Kp), -1, np.int32)
    for n in range(N):
        for e in range(EL):
            k = rng.integers(1, K + 1)
            pos = np.sort(rng.choice(F1 - 1, size=k, replace=False))
            epos[n, e, :k] = pos
            u[n, e, :k] = rng.normal(size=k)
            epos[n, e, K] = F1 - 1
            u[n, e, K] = rng.normal()        # rhs weight
    diag = rng.uniform(1.0, 2.0, size=(N, F1)).astype(np.float32) + 2.0 * F1
    diag[:, F1 - 1] = 0.0
    rhs = rng.normal(size=(N, F1)).astype(np.float32)
    rhs[:, F1 - 1] = 0.0
    F1p = PL._ru(F1, PL._TE)
    diag2 = np.zeros((N, 8, F1p), np.float32)
    diag2[:, 0, :F1] = diag
    diag2[:, 1, :F1] = rhs
    return u, epos, diag, rhs, diag2, P, B1, F1


def _dense_leaf_front(u, epos, diag, rhs, F1):
    N, ELp, Kp = u.shape
    ua = np.zeros((N, ELp, F1), np.float32)
    for n in range(N):
        for e in range(ELp):
            for k in range(Kp):
                if epos[n, e, k] >= 0:
                    ua[n, e, epos[n, e, k]] += u[n, e, k]
    front = jnp.einsum("nef,neg->nfg", jnp.asarray(ua), jnp.asarray(ua))
    front = front + jax.vmap(jnp.diag)(jnp.asarray(diag))
    front = front.at[:, F1 - 1, :].add(jnp.asarray(rhs))
    front = front.at[:, :, F1 - 1].add(jnp.asarray(rhs))
    return front


def test_fused_leaf_matches_dense():
    u, epos, diag, rhs, diag2, P, B1, F1 = _mk_leaf_inputs()
    L_pp, L_bp, upd = PL.fused_leaf(
        jnp.asarray(np.swapaxes(u, 1, 2)),
        jnp.asarray(np.swapaxes(epos, 1, 2)), jnp.asarray(diag2), P, B1, F1)
    front = _dense_leaf_front(u, epos, diag, rhs, F1)
    L_pp_r, L_bp_r, upd_r = _dense_factor(front, P)
    np.testing.assert_allclose(np.asarray(L_pp), np.asarray(L_pp_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(L_bp), np.asarray(L_bp_r),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(upd)[:, :B1, :],
                               np.asarray(upd_r), rtol=0, atol=2e-4)


def test_fused_leaf_vjp_matches_autodiff():
    u, epos, diag, rhs, diag2, P, B1, F1 = _mk_leaf_inputs(seed=5)

    def loss_fused(uin):
        L_pp, L_bp, upd = PL.fused_leaf(
            jnp.swapaxes(uin, 1, 2),
            jnp.asarray(np.swapaxes(epos, 1, 2)),
            jnp.asarray(diag2), P, B1, F1)
        return (jnp.sum(jnp.log(jnp.diagonal(L_pp, axis1=1, axis2=2)))
                + jnp.sum(jnp.cos(L_bp)) + jnp.sum(jnp.sin(upd[:, :B1])))

    def loss_dense(uin):
        N, ELp, Kp = uin.shape
        lane = jnp.arange(F1)
        ua = jnp.zeros((N, ELp, F1), uin.dtype)
        ep = jnp.asarray(epos)
        for k in range(Kp):
            ua = ua + jnp.where(lane[None, None, :] == ep[:, :, k:k + 1],
                                uin[:, :, k:k + 1], 0.0)
        front = jnp.einsum("nef,neg->nfg", ua, ua)
        front = front + jax.vmap(jnp.diag)(jnp.asarray(diag))
        front = front.at[:, F1 - 1, :].add(jnp.asarray(rhs))
        front = front.at[:, :, F1 - 1].add(jnp.asarray(rhs))
        L_pp, L_bp, upd = _dense_factor(front, P)
        return (jnp.sum(jnp.log(jnp.diagonal(L_pp, axis1=1, axis2=2)))
                + jnp.sum(jnp.cos(L_bp)) + jnp.sum(jnp.sin(upd)))

    uj = jnp.asarray(u)
    v1, g1 = jax.value_and_grad(loss_fused)(uj)
    v2, g2 = jax.value_and_grad(loss_dense)(uj)
    assert abs(float(v1) - float(v2)) < 2e-3
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=0, atol=5e-3)


@pytest.mark.slow
def test_fused_level_matches_dense_large_panels():
    """Shapes big enough that panel starts are nonzero (exercises the
    sublane-count start storage and the static aug slab)."""
    (ch, chp, ext, starts, rel, T, F1p, diag, rhs, diag2,
     P, B1, Bc1, F1) = _mk_level_inputs(seed=9, N=2, P=60, B=420, Bc=450)
    assert np.asarray(starts).max() > 0
    L_pp, L_bp, upd = PL.fused_level(
        jnp.asarray(chp), jnp.asarray(starts), jnp.asarray(rel),
        jnp.asarray(diag2), P, B1, Bc1, F1, T)
    front = _dense_level(jnp.asarray(ch), ext, jnp.asarray(diag),
                         jnp.asarray(rhs), P, F1)
    L_pp_r, L_bp_r, upd_r = _dense_factor(front, P)
    np.testing.assert_allclose(np.asarray(L_pp), np.asarray(L_pp_r),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(L_bp), np.asarray(L_bp_r),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(upd)[:, :B1, :],
                               np.asarray(upd_r), rtol=0, atol=5e-3)


def test_assemble_fronts_matches_dense():
    """The assembly-only kernel (big levels) builds the same augmented
    front as the dense reference, including diag/rhs adds and padding."""
    (ch, chp, ext, starts, rel, T, F1p, diag, rhs, diag2,
     P, B1, Bc1, F1) = _mk_level_inputs(seed=13, N=2, P=40, B=280, Bc=300)
    diagT = np.zeros((2, F1p, 8), np.float32)
    diagT[:, :F1, 0] = diag
    diagT[:, :F1, 1] = rhs
    front = PL.assemble_fronts(
        jnp.asarray(chp), jnp.asarray(starts), jnp.asarray(rel),
        jnp.asarray(diag2), jnp.asarray(diagT), Bc1, F1, T)
    ref = _dense_level(jnp.asarray(ch), ext, jnp.asarray(diag),
                       jnp.asarray(rhs), P, F1)
    np.testing.assert_allclose(np.asarray(front)[:, :F1, :F1],
                               np.asarray(ref), rtol=0, atol=2e-4)
    # pad region carries the unit diagonal
    fr = np.asarray(front)
    assert np.allclose(np.diagonal(fr, axis1=1, axis2=2)[:, F1:], 1.0)

    # VJP vs autodiff of the dense formulation (wrt children)
    w = np.random.default_rng(3).normal(size=(2, F1, F1)).astype(np.float32)

    def loss_fused(chin):
        f = PL.assemble_fronts(chin, jnp.asarray(starts), jnp.asarray(rel),
                               jnp.asarray(diag2), jnp.asarray(diagT),
                               Bc1, F1, T)
        return jnp.sum(jnp.asarray(w) * f[:, :F1, :F1])

    def loss_dense(chin):
        chd = chin[:, :, :Bc1, :]
        oh = (jnp.asarray(ext)[..., None]
              == jnp.arange(Bc1)[None, None, None, :]).astype(jnp.float32)
        f = jnp.einsum("nsfb,nsbc,nsgc->nfg", oh, chd, oh)
        return jnp.sum(jnp.asarray(w) * f)

    chj = jnp.asarray(chp)
    g1 = jax.grad(loss_fused)(chj)
    g2 = jax.grad(loss_dense)(chj)
    g1s = np.asarray(g1)[:, :, :Bc1, :]
    g2s = np.asarray(g2)[:, :, :Bc1, :]
    np.testing.assert_allclose(0.5 * (g1s + np.swapaxes(g1s, 2, 3)),
                               0.5 * (g2s + np.swapaxes(g2s, 2, 3)),
                               rtol=0, atol=5e-3)


@pytest.mark.slow
def test_fused_leaf_vjp_node_chunked_matches(monkeypatch):
    """The node-chunked VJP path (threshold patched down so tiny shapes
    trigger it) must agree with the unchunked backward exactly — this is
    the path the n=1e6 gradient takes, where unchunked front-sized
    pullback temporaries OOM'd the compile."""
    u, epos, diag, rhs, diag2, P, B1, F1 = _mk_leaf_inputs(seed=7)

    def loss(uin):
        L_pp, L_bp, upd = PL.fused_leaf(
            jnp.swapaxes(uin, 1, 2),
            jnp.asarray(np.swapaxes(epos, 1, 2)),
            jnp.asarray(diag2), P, B1, F1)
        return (jnp.sum(jnp.log(jnp.diagonal(L_pp, axis1=1, axis2=2)))
                + jnp.sum(jnp.cos(L_bp)) + jnp.sum(jnp.sin(upd[:, :B1])))

    uj = jnp.asarray(u)
    g_ref = jax.grad(loss)(uj)
    monkeypatch.setattr(PL, "_BWD_CHUNK_ELEMS", 1)
    g_ch = jax.grad(loss)(uj)
    np.testing.assert_allclose(np.asarray(g_ch), np.asarray(g_ref),
                               rtol=0, atol=1e-6)
