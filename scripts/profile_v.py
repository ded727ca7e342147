"""Time the V-factor / solve phases on the current backend (see profile_phases)."""
import sys
import os
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
PHASES = os.environ.get("PHASES", "wbuild,vfactor,fwd").split(",")

rng = np.random.default_rng(0)
locs = rng.uniform(size=(n, 2))
t0 = time.time()
spec = vecchia_specify(locs, m, cond_yz="SGV")
plan = get_plan(spec, np.float32)
dev = lk._device_arrays(plan)
jax.block_until_ready(dev)
dt = plan.dtype
kernel_fn = make_kernel_fn("matern")
covparms = jnp.asarray([1.0, 0.1, 1.5], dt)
nuggets = jnp.full((plan.n_obs,), 0.1, dt)
nug_ord, nug_point = jax.jit(
    lambda nu: lk._nugget_vectors(plan, dev, nu, dt))(nuggets)
col = jax.jit(lambda l, N, v, c, ng, cp: u_entries(
    l, N, v, c, ng, kernel_fn, cp))(
        dev["locs"], dev["NN"], dev["valid"], dev["cond"], nug_point, covparms)
jax.block_until_ready(col)
print(f"setup done {time.time()-t0:.0f}s", flush=True)


def timeit(name, f, *a):
    t0 = time.time()
    out = jax.block_until_ready(f(*a))
    t1 = time.time()
    for _ in range(5):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: compile {t1-t0:.1f}s  per-run {(time.time()-t1)/5*1e3:.2f} ms",
          flush=True)
    return out


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


if "wbuild" in PHASES:
    w = timeit("wbuild", f_wbuild, dev, col, nug_ord)
v_flat = None
if "vfactor" in PHASES:
    v_flat = timeit("vfactor", f_vfactor, dev, col, nug_ord)
if "fwd" in PHASES:
    if v_flat is None:
        v_flat = f_vfactor(dev, col, nug_ord)
    b = jnp.asarray(rng.standard_normal(plan.n_lat), dt)
    timeit("fwd", f_fwd, dev, v_flat, b)
