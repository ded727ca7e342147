"""Blocked batch-last Crout: einsum cross-block updates to cut op count."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
B = int(os.environ.get("B", 8))
F = m + 1
dt = jnp.float32
iu, ju = np.triu_indices(F)
P = iu.size
pk = np.zeros((F, F), np.int32)
pk[iu, ju] = np.arange(P)
pk[ju, iu] = np.arange(P)

rng = np.random.default_rng(0)
A = rng.standard_normal((n, F, F))
C = A @ np.transpose(A, (0, 2, 1)) + 3 * np.eye(F)
Cp = jnp.asarray(C[:, iu, ju].T.copy(), dt)


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
def crout_blocked(Cp):
    nb = Cp.shape[1]
    Lcols = []          # list of (F, n) column arrays (rows < j are zero/unused)
    inv = [None] * F
    # process columns in blocks of B
    for jb in range(0, F, B):
        je = min(jb + B, F)
        # cross-block accumulation: acc[i, j-jb] = sum_{k<jb} L[i,k] L[j,k]
        if jb > 0:
            Lprev = jnp.stack(Lcols, axis=1)          # (F, jb, n)
            acc = jnp.einsum("ikn,jkn->ijn", Lprev[jb:], Lprev[jb:je],
                             precision=jax.lax.Precision.HIGHEST)
        else:
            acc = jnp.zeros((F - jb, je - jb, nb), dt)
        # in-block unrolled Crout on the Schur complement
        Lb = [[None] * (je - jb) for _ in range(F)]
        for j in range(jb, je):
            s = Cp[pk[j][j]] - acc[j - jb, j - jb]
            for k in range(jb, j):
                s = s - Lb[j][k - jb] * Lb[j][k - jb]
            d = jax.lax.rsqrt(s)
            inv[j] = d
            Lb[j][j - jb] = s * d
            for i in range(j + 1, F):
                s = Cp[pk[i][j]] - acc[i - jb, j - jb]
                for k in range(jb, j):
                    s = s - Lb[i][k - jb] * Lb[j][k - jb]
                Lb[i][j - jb] = s * d
        for j in range(jb, je):
            colj = jnp.stack([Lb[i][j - jb] if i >= j else jnp.zeros(nb, dt)
                              for i in range(F)], axis=0)
            Lcols.append(colj)
    L = jnp.stack(Lcols, axis=1)   # (F, F, n) lower
    # forward/backward substitution for x = C^{-1} e0 (unrolled; F^2 ops)
    y = [None] * F
    y[0] = inv[0]
    for i in range(1, F):
        acc = L[i, 0] * y[0]
        for k in range(1, i):
            acc = acc + L[i, k] * y[k]
        y[i] = -acc * inv[i]
    x = [None] * F
    x[F - 1] = y[F - 1] * inv[F - 1]
    for i in range(F - 2, -1, -1):
        acc = L[i + 1, i] * x[i + 1]
        for k in range(i + 2, F):
            acc = acc + L[k, i] * x[k]
        x[i] = (y[i] - acc) * inv[i]
    return jnp.stack(x, axis=0)


x = timeit(f"blocked crout B={B}", crout_blocked, Cp)
x_np = np.linalg.solve(C[:100], np.eye(F)[0])
err = np.abs(np.asarray(x)[:, :100].T - x_np).max() / np.abs(x_np).max()
print("rel err vs numpy:", err)
