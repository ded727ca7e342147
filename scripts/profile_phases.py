"""Per-phase TPU timing of the likelihood pipeline at a bench config.

Times (after warmup): u_entries, W build, chol levels, forward solve, and the
full loglik, each as its own jit, to locate the hot phase.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gpvecchia_tpu.spec import vecchia_specify
from gpvecchia_tpu.plan import get_plan
from gpvecchia_tpu.inference import likelihood as lk
from gpvecchia_tpu.linalg.trisolve import forward_solve
from gpvecchia_tpu.linalg.sparse import scatter_add
from gpvecchia_tpu.kernels.u_entries import u_entries
from gpvecchia_tpu.kernels.covariance import make_kernel_fn

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
cond = os.environ.get("COND", "SGV")
REPS = int(os.environ.get("REPS", 5))

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
locs = rng.uniform(size=(n, 2))
z = rng.standard_normal(n)

t0 = time.perf_counter()
spec = vecchia_specify(locs, m, cond_yz=cond)
t1 = time.perf_counter()
plan = get_plan(spec, np.float32)
t2 = time.perf_counter()
print(f"spec {t1-t0:.1f}s plan {t2-t1:.1f}s")

dev = lk._device_arrays(plan)
dt = plan.dtype
covparms = jnp.asarray([1.0, 0.1, 1.5], dt)
nuggets = jnp.full((plan.n_obs,), 0.1, dt)
kernel_fn = make_kernel_fn("matern")


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    for _ in range(REPS):
        out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    print(f"{name:24s} compile+1st {t1-t0:7.2f}s   per-run {(t2-t1)/REPS*1e3:9.2f} ms")
    return out


@jax.jit
def f_uentries(dev, covparms, nug_point):
    return u_entries(dev["locs"], dev["NN"], dev["valid"], dev["cond"],
                     nug_point, kernel_fn, covparms)


@jax.jit
def f_wbuild(dev, col, nug_ord):
    u = jnp.where(dev["cond"] & dev["has_lat"][:, None], col, 0.0)
    vals = u[:, dev["pair_a"]] * u[:, dev["pair_b"]]
    w_flat = scatter_add(jnp.zeros(plan.w_nnz, dt), dev["w_pair_slots"], vals)
    d_add = 1.0 / nug_ord[dev["w_diag_obs_pos"]]
    return w_flat.at[dev["w_diag_slots"]].add(d_add)


@jax.jit
def f_vfactor(dev, col, nug_ord):
    return lk.compute_v_factor(plan, dev, col, nug_ord, dt)


@jax.jit
def f_fwd(v_flat, b):
    return forward_solve(v_flat, b, plan.fwd_blocks)


nug_ord, nug_point = jax.jit(
    lambda nu: lk._nugget_vectors(plan, dev, nu, dt))(nuggets)

col = timeit("u_entries", f_uentries, dev, covparms, nug_point)
w_flat = timeit("W build (scatter_add)", f_wbuild, dev, col, nug_ord)
v_flat = timeit("v_factor (W+chol)", f_vfactor, dev, col, nug_ord)
b = jnp.asarray(rng.standard_normal(plan.n_lat), dt)
timeit("forward_solve", f_fwd, v_flat, b)

fn = lk.loglik_fn(spec, "matern")
zf = jnp.asarray(z[spec.ord_z if hasattr(spec, 'ord_z') else slice(None)], dt)
timeit("full loglik", fn, jnp.asarray(z, dt), covparms, nuggets)
