"""Test batch-last unrolled Cholesky-Crout + substitution layout on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
F = m + 1
dt = jnp.float32
iu, ju = np.triu_indices(F)
P = iu.size
# packed index lookup: pk[i][j] = slot of (min,max) pair in packed triangle
pk = np.zeros((F, F), np.int32)
pk[iu, ju] = np.arange(P)
pk[ju, iu] = np.arange(P)

rng = np.random.default_rng(0)
A = rng.standard_normal((n, F, F))
C = A @ np.transpose(A, (0, 2, 1)) + 3 * np.eye(F)
Cp = jnp.asarray(C[:, iu, ju].T.copy(), dt)          # (P, n) packed, batch-last


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"{name:32s} compile {t1-t0:6.1f}s per-run {(t2-t1)/reps*1e3:8.3f} ms")
    return out


@jax.jit
def crout_solve(Cp):
    # unrolled Crout Cholesky on packed batch-last layout; then x = C^{-1} e0
    L = [[None] * F for _ in range(F)]
    inv = [None] * F
    for j in range(F):
        acc = Cp[pk[j][j]]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jax.lax.rsqrt(acc)
        inv[j] = d
        L[j][j] = acc * d     # = sqrt(acc)
        for i in range(j + 1, F):
            acc = Cp[pk[i][j]]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * d
    # forward: y = L^{-1} e0
    y = [None] * F
    y[0] = inv[0]
    for i in range(1, F):
        acc = L[i][0] * y[0]
        for k in range(1, i):
            acc = acc + L[i][k] * y[k]
        y[i] = -acc * inv[i]
    # backward: x = L^{-T} y
    x = [None] * F
    x[F - 1] = y[F - 1] * inv[F - 1]
    for i in range(F - 2, -1, -1):
        acc = L[i + 1][i] * x[i + 1]
        for k in range(i + 2, F):
            acc = acc + L[k][i] * x[k]
        x[i] = (y[i] - acc) * inv[i]
    return jnp.stack(x, axis=0)      # (F, n)


x = timeit("crout packed batch-last", crout_solve, Cp)
# correctness check vs numpy
x_np = np.linalg.solve(C[:100], np.eye(F)[0])
err = np.abs(np.asarray(x)[:, :100].T - x_np).max() / np.abs(x_np).max()
print("rel err vs numpy:", err)
