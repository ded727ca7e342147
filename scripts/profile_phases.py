"""Per-phase TPU timing of the likelihood pipeline at a bench config.

Times (after warmup): u_entries, W build, V factor, forward solve, and the
full loglik, each as its own jit, to locate the hot phase.  Also prints the
static schedule structure (levels / bucket shapes) of the plan.

Env: N, M, COND, REPS.
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
from gpvecchia_tpu.linalg.sparse import pair_sum
from gpvecchia_tpu.kernels.u_entries import u_entries
from gpvecchia_tpu.kernels.covariance import make_kernel_fn

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
cond = os.environ.get("COND", "SGV")
REPS = int(os.environ.get("REPS", 10))

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

# ---- static structure ----
print(f"mode={plan.mode} n_lat={plan.n_lat} v_nnz={plan.v_nnz} "
      f"v_phys={plan.v_phys_size} n_dir={plan.n_dir}")
tot_lev = 0
for b in plan.factor_buckets:
    nlev = b.offsets.shape[0]
    tot_lev += nlev
    dd = [f"d{c[0].shape[-2]}x{c[0].shape[-1]}" for c in b.diag_classes]
    oo = [f"o{c[0].shape[-2]}x{c[0].shape[-1]}" for c in b.off_classes]
    print(f"  factor bucket nlev={nlev} S={b.S} {' '.join(dd + oo)}")
print(f"factor: total levels={tot_lev} buckets={len(plan.factor_buckets)}")
for name, blocks in (("fwd", plan.fwd_blocks), ("bwd", plan.bwd_blocks)):
    tot = 0
    for b in blocks:
        tot += b.cols.shape[0]
    shapes = [tuple(b.cols.shape) + ((b.row_slots.shape[-1],)
              if hasattr(b, "row_slots") else (b.slots.shape[-1],))
              for b in blocks]
    print(f"{name}: levels={tot} buckets={len(blocks)} shapes={shapes}")
wb = plan.w_schedule.buckets if plan.w_schedule else []
print("w_sched buckets:", [(b.pa.shape) for b in wb])

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
    ucat = jnp.concatenate([col.ravel(), 1.0 / nug_ord, jnp.ones(1, dt)])
    return pair_sum(ucat, ucat, dev["w_sched"], dt)


@jax.jit
def f_vfactor(dev, col, nug_ord):
    return lk.compute_v_factor(plan, dev, col, nug_ord, dt)


@jax.jit
def f_fwd(dev, v_flat, b):
    return forward_solve(v_flat, b, dev["fwd"], x_size=plan.fwd_x_size)


nug_ord, nug_point = jax.jit(
    lambda nu: lk._nugget_vectors(plan, dev, nu, dt))(nuggets)

col = timeit("u_entries", f_uentries, dev, covparms, nug_point)
w_flat = timeit("W build (pair_sum)", f_wbuild, dev, col, nug_ord)
v_flat = timeit("v_factor (W+chol)", f_vfactor, dev, col, nug_ord)
b = jnp.asarray(rng.standard_normal(plan.n_lat), dt)
timeit("forward_solve", f_fwd, dev, v_flat, b)

fn = lk.loglik_fn(spec, "matern")
timeit("full loglik", fn, jnp.asarray(z, dt), covparms, nuggets)
