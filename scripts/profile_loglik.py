#!/usr/bin/env python
"""Per-component timing of the Vecchia loglikelihood pipeline."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

n = int(os.environ.get("PROF_N", 100_000))
m = int(os.environ.get("PROF_M", 20))
cond = os.environ.get("PROF_COND", "SGV")

import jax
import jax.numpy as jnp

from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.plan import get_plan
from gpvecchia_tpu.inference.likelihood import (
    _device_arrays, _nugget_vectors, compute_v_factor)
from gpvecchia_tpu.kernels.u_entries import u_entries
from gpvecchia_tpu.kernels.covariance import make_kernel_fn
from gpvecchia_tpu.linalg.trisolve import forward_solve

rng = np.random.default_rng(0)
locs = rng.uniform(size=(n, 2))
t0 = time.time()
spec = vecchia_specify(locs, m=m, cond_yz=cond)
t1 = time.time()
dt = jnp.float32
plan = get_plan(spec, dt)
t2 = time.time()
print(f"spec {t1-t0:.1f}s plan {t2-t1:.1f}s "
      f"chol_levels={len(plan.chol_levels)} "
      f"level_rows={[lv.col_slots.shape for lv in plan.chol_levels][:8]}",
      file=sys.stderr)

dev = _device_arrays(plan)
covparms = jnp.asarray([1.0, 0.2, 0.5], dt)
nuggets = jnp.full((spec.n_obs,), 0.1, dt)
kernel_fn = make_kernel_fn("matern")

nug_ord, nug_point = _nugget_vectors(plan, dev, nuggets, dt)

f_u = jax.jit(lambda dev, nug_point, covparms: u_entries(
    dev["locs"], dev["NN"], dev["valid"], dev["cond"], nug_point,
    kernel_fn, covparms))
f_v = jax.jit(lambda dev, col, nug_ord: compute_v_factor(
    plan, dev, col, nug_ord, dt))
f_s = jax.jit(lambda v_flat, b: forward_solve(v_flat, b, plan.fwd_blocks))


def bench(label, f, *args):
    out = jax.block_until_ready(f(*args))
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:24s} {ms:9.2f} ms")
    return out


col = bench("u_entries", f_u, dev, nug_point, covparms)
v_flat = bench("compute_v_factor", f_v, dev, col, nug_ord)
b = jnp.asarray(rng.normal(size=plan.n_lat), dt)
bench("forward_solve", f_s, v_flat, b)
