"""Micro-profile of u_entries internals on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gpvecchia_tpu.kernels.covariance import make_kernel_fn, _safe_dist

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
mp1 = m + 1
dt = jnp.float32

rng = np.random.default_rng(0)
locs = jnp.asarray(rng.uniform(size=(n, 2)), dt)
NN = jnp.asarray(np.minimum(np.arange(n)[:, None],
                            np.maximum(0, np.arange(n)[:, None] - 1 -
                                       rng.integers(0, 50, size=(n, mp1)))),
                 jnp.int32)
valid = jnp.ones((n, mp1), bool)
kernel_fn = make_kernel_fn("matern")
covparms = jnp.asarray([1.0, 0.1, 1.5], dt)
iu, ju = np.triu_indices(mp1)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"{name:32s} compile {t1-t0:6.1f}s per-run {(t2-t1)/reps*1e3:8.2f} ms")
    return out


@jax.jit
def f_kernel_packed(locs, NN, covparms):
    pts = locs[NN]
    diff = pts[:, iu, :] - pts[:, ju, :]
    dist = _safe_dist(jnp.sum(diff * diff, axis=-1))
    return kernel_fn(dist, covparms)


# packed -> full via static-index scatter (current) vs gather (candidate)
SYM = np.zeros((mp1, mp1), np.int32)
SYM[iu, ju] = np.arange(iu.size)
SYM[ju, iu] = np.arange(iu.size)
SYM = jnp.asarray(SYM)


@jax.jit
def f_full_scatter(Cp):
    C = jnp.zeros((n, mp1, mp1), dt)
    return C.at[:, iu, ju].set(Cp).at[:, ju, iu].set(Cp)


@jax.jit
def f_full_gather(Cp):
    return Cp[:, SYM]


@jax.jit
def f_chol(C):
    return jnp.linalg.cholesky(C)


@jax.jit
def f_cho_solve(chol):
    e0 = jnp.zeros((n, mp1), dt).at[:, 0].set(1.0)
    return jax.scipy.linalg.cho_solve((chol, True), e0[..., None])[..., 0]


@jax.jit
def f_fwd_sub_e0(chol):
    # forward substitution L y = e0 unrolled over mp1 steps, then norm:
    # x = C^{-1} e0, x0 = 1/(L00^2)... actually col = (L^{-T} L^{-1} e0)/sqrt(.)
    # here just time a hand-rolled double substitution
    y = [None] * mp1
    y[0] = 1.0 / chol[:, 0, 0]
    for i in range(1, mp1):
        acc = sum(chol[:, i, j] * y[j] for j in range(i))
        y[i] = -acc / chol[:, i, i]
    yv = jnp.stack(y, axis=1)
    # backward: L^T x = y
    x = [None] * mp1
    for i in range(mp1 - 1, -1, -1):
        acc = sum(chol[:, j, i] * x[j] for j in range(i + 1, mp1))
        x[i] = (yv[:, i] - acc) / chol[:, i, i]
    return jnp.stack(x, axis=1)


def _chol_unrolled(C):
    # hand-unrolled Cholesky-Crout on (n, F, F), column lists
    F = C.shape[1]
    L = [[None] * F for _ in range(F)]
    for j in range(F):
        acc = C[:, j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(acc)
        L[j][j] = d
        inv = 1.0 / d
        for i in range(j + 1, F):
            acc = C[:, i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv
    return L


@jax.jit
def f_chol_unrolled_solve(C):
    L = _chol_unrolled(C)
    F = C.shape[1]
    y = [None] * F
    y[0] = 1.0 / L[0][0]
    for i in range(1, F):
        acc = sum(L[i][j] * y[j] for j in range(i))
        y[i] = -acc / L[i][i]
    x = [None] * F
    for i in range(F - 1, -1, -1):
        acc = sum(L[j][i] * x[j] for j in range(i + 1, F))
        x[i] = (y[i] - acc) / L[i][i]
    return jnp.stack(x, axis=1)


Cp = timeit("kernel packed (gather+matern)", f_kernel_packed, locs, NN, covparms)
C1 = timeit("packed->full scatter", f_full_scatter, Cp)
C2 = timeit("packed->full gather", f_full_gather, Cp)
C2 = C2 + 2.0 * jnp.eye(mp1, dtype=dt)[None]
chol = timeit("jnp.linalg.cholesky", f_chol, C2)
timeit("cho_solve", f_cho_solve, chol)
timeit("unrolled subst e0", f_fwd_sub_e0, chol)
timeit("unrolled chol+solve", f_chol_unrolled_solve, C2)
