"""Interpret-mode tests of the Pallas TPU kernels (CPU-runnable).

The kernels' Mosaic lowering is exercised on the real chip by bench.py /
the driver; these tests run the same kernel bodies through the Pallas
interpreter and pin their math (and custom VJPs) against dense references.
"""

import numpy as np
import pytest
import scipy.linalg as sla

import jax
import jax.numpy as jnp

import gpvecchia_tpu.kernels.pallas_crout as pc
import gpvecchia_tpu.linalg.pallas_eadd as pe
import gpvecchia_tpu.linalg.pallas_frontal as pf
from gpvecchia_tpu.kernels.u_entries import _packed_index


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pc, "INTERPRET", True)
    monkeypatch.setattr(pe, "INTERPRET", True)
    monkeypatch.setattr(pf, "INTERPRET", True)


def _packed_spd(rng, n, F):
    A = rng.normal(size=(n, F, F))
    C = A @ np.swapaxes(A, 1, 2) + F * np.eye(F)
    iu, ju, _ = _packed_index(F)
    return C, jnp.asarray(C[:, iu, ju].T, jnp.float32), iu, ju


@pytest.mark.parametrize("F", [3, 9, 21])
def test_packed_solve_e0(F):
    rng = np.random.default_rng(0)
    n = 300
    C, Cp, iu, ju = _packed_spd(rng, n, F)
    x = pc.packed_solve_e0(Cp, F)
    xref = np.linalg.solve(C, np.eye(F)[0])
    assert np.abs(np.asarray(x).T - xref).max() < 1e-4 * np.abs(xref).max()


def test_packed_solve_e0_vjp():
    rng = np.random.default_rng(1)
    F, n = 9, 200
    C, Cp, iu, ju = _packed_spd(rng, n, F)
    key = rng.normal(size=(F, n)).astype(np.float32)
    g = jax.grad(lambda cp: jnp.vdot(jnp.asarray(key),
                                     pc.packed_solve_e0(cp, F)))(Cp)
    x = np.linalg.solve(C, np.eye(F)[0])
    w = np.linalg.solve(C, np.asarray(key).T[..., None])[..., 0]
    gfull = -(w[:, :, None] * x[:, None, :] + x[:, :, None] * w[:, None, :])
    gfull[:, np.arange(F), np.arange(F)] *= 0.5
    gref = gfull[:, iu, ju].T
    assert np.abs(np.asarray(g) - gref).max() < 1e-4 * np.abs(gref).max()


@pytest.mark.parametrize("F,P", [(12, 5), (200, 150), (50, 50), (37, 16)])
def test_factor_fronts(F, P):
    rng = np.random.default_rng(2)
    N = 3
    A = rng.normal(size=(N, F, F)).astype(np.float32) * 0.1
    front = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                        + np.eye(F, dtype=np.float32) * 3)
    L_pp, L_bp = pf.factor_fronts(front, P)
    Lref = np.linalg.cholesky(np.asarray(front)[:, :P, :P])
    assert np.abs(np.asarray(L_pp) - Lref).max() < 5e-5
    B = F - P
    if B:
        Lbp_ref = np.stack([
            sla.solve_triangular(Lref[i], np.asarray(front)[i, P:, :P].T,
                                 lower=True).T for i in range(N)])
        assert np.abs(np.asarray(L_bp) - Lbp_ref).max() < 5e-5


@pytest.mark.slow
def test_factor_fronts_vjp():
    rng = np.random.default_rng(3)
    N, F, P = 2, 60, 40
    B = F - P
    Z = jnp.asarray(rng.normal(size=(N, F, F)).astype(np.float32))
    key1 = jnp.asarray(rng.normal(size=(N, P, P)).astype(np.float32))
    key2 = jnp.asarray(rng.normal(size=(N, B, P)).astype(np.float32))

    def mk(Z):
        return jnp.einsum("nij,nkj->nik", Z, Z) + F * jnp.eye(F)

    def loss_pal(Z):
        lp, lb = pf.factor_fronts(mk(Z), P)
        return jnp.vdot(key1, lp) + jnp.vdot(key2, lb)

    def loss_ref(Z):
        fr = mk(Z)
        lp = jnp.linalg.cholesky(fr[:, :P, :P])
        lb = jax.lax.linalg.triangular_solve(
            lp, fr[:, P:, :P], left_side=False, lower=True, transpose_a=True)
        return jnp.vdot(key1, lp) + jnp.vdot(key2, lb)

    g1 = jax.grad(loss_pal)(Z)
    g2 = jax.grad(loss_ref)(Z)
    assert float(jnp.abs(g1 - g2).max()) < 1e-4 * float(jnp.abs(g2).max())


def test_eadd_fronts_and_vjp():
    rng = np.random.default_rng(4)
    N, F, Bc = 4, 30, 17
    upd2 = jnp.asarray(rng.normal(size=(N, 2, Bc, Bc)).astype(np.float32))
    ext = np.full((N, 2, F), -1, np.int32)
    for n in range(N):
        for s in range(2):
            k = int(rng.integers(5, Bc))
            pos = rng.choice(F, size=k, replace=False)
            ext[n, s, pos] = rng.choice(Bc, size=k, replace=False)
    extj = jnp.asarray(ext)
    out = pe.eadd_fronts(upd2, extj, F)
    ref = np.zeros((N, F, F), np.float32)
    u = np.asarray(upd2)
    for n in range(N):
        for s in range(2):
            ok = np.flatnonzero(ext[n, s] >= 0)
            ref[n][np.ix_(ok, ok)] += u[n, s][np.ix_(ext[n, s][ok],
                                                     ext[n, s][ok])]
    assert np.abs(np.asarray(out) - ref).max() == 0.0

    key = jnp.asarray(rng.normal(size=(N, F, F)).astype(np.float32))
    g = jax.grad(lambda u_: jnp.vdot(key, pe.eadd_fronts(u_, extj, F)))(upd2)
    gref = np.zeros((N, 2, Bc, Bc), np.float32)
    k = np.asarray(key)
    for n in range(N):
        for s in range(2):
            ok = np.flatnonzero(ext[n, s] >= 0)
            gref[n, s][np.ix_(ext[n, s][ok], ext[n, s][ok])] += k[n][
                np.ix_(ok, ok)]
    assert np.abs(np.asarray(g) - gref).max() == 0.0


@pytest.mark.slow
def test_fused_matern_matches_xla_path(monkeypatch):
    import gpvecchia_tpu.kernels.u_entries as ue
    from gpvecchia_tpu.kernels.covariance import matern
    monkeypatch.setattr(ue, "_use_crout", lambda: True)

    rng = np.random.default_rng(5)
    n, m, d = 300, 6, 2
    F = m + 1
    locs = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))
    NN = np.full((n, F), -1, np.int64)
    NN[:, 0] = np.arange(n)
    for i in range(n):
        k = min(i, m)
        if k:
            NN[i, 1:k + 1] = rng.choice(i, size=k, replace=False)
    valid = NN >= 0
    cond = valid & (rng.uniform(size=(n, F)) < 0.7)
    cond[:, 0] = False
    NNj = jnp.asarray(np.maximum(NN, 0))
    validj = jnp.asarray(valid)
    condj = jnp.asarray(cond)
    nug_point = jnp.asarray(rng.uniform(0.05, 0.2, size=n).astype(np.float32))
    pts = locs[NNj]
    fused = dict(NNT=NNj.T, vcT=(validj & ~condj).T,
                 validT=validj.T.astype(jnp.float32),
                 ptsT=jnp.transpose(pts, (2, 1, 0)).reshape(-1, n))
    for nu in (0.5, 1.5, 2.5, 0.9):   # 0.9 exercises the XLA fallback cond
        cv = jnp.asarray([1.3, 0.2, nu], jnp.float32)
        col_f, _ = ue.u_entries(locs, NNj, validj, condj, nug_point, matern,
                                cv, nbr_pts=pts, fused=fused)
        col_x, _ = ue.u_entries(locs, NNj, validj, condj, nug_point, matern,
                                cv, nbr_pts=pts)
        assert float(jnp.abs(col_f - col_x).max()) < 1e-4

    def loss(fn_kwargs):
        def inner(cv, ng):
            c, _ = ue.u_entries(locs, NNj, validj, condj, ng, matern, cv,
                                nbr_pts=pts, **fn_kwargs)
            return jnp.sum(c ** 2)
        return inner

    cv = jnp.asarray([1.3, 0.2, 0.5], jnp.float32)
    g1 = jax.grad(loss(dict(fused=fused)), argnums=(0, 1))(cv, nug_point)
    g2 = jax.grad(loss(dict()), argnums=(0, 1))(cv, nug_point)
    for a, b in zip(g1, g2):
        assert float(jnp.abs(a - b).max()) < 1e-3 * (
            float(jnp.abs(b).max()) + 1e-6)
