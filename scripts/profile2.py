#!/usr/bin/env python
"""Find where the end-to-end loglik time goes (vs component microbench)."""
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
from gpvecchia_tpu.inference.likelihood import loglik_fn

rng = np.random.default_rng(0)
locs = rng.uniform(size=(n, 2))
spec = vecchia_specify(locs, m=m, cond_yz=cond)
dt = jnp.float32
fn = loglik_fn(spec, "matern", dtype=dt)
z = jnp.asarray(rng.normal(size=n), dt)
nuggets = jnp.full((n,), 0.1, dt)
p0 = jnp.asarray([1.0, 0.2, 0.5], dt)

t0 = time.time()
fn(z, p0, nuggets).block_until_ready()
print(f"first eval (compile) {time.time()-t0:.1f}s")

# same args repeated
t0 = time.time()
for _ in range(10):
    out = fn(z, p0, nuggets)
jax.block_until_ready(out)
print(f"same-args     {(time.time()-t0)/10*1e3:9.2f} ms/eval")

# varying covparms
params = [jnp.asarray([1.0 * (1 + 0.01 * k), 0.2, 0.5], dt) for k in range(10)]
for p in params[:2]:
    fn(z, p, nuggets).block_until_ready()
t0 = time.time()
vals = [fn(z, p, nuggets) for p in params]
jax.block_until_ready(vals)
print(f"varying-args  {(time.time()-t0)/10*1e3:9.2f} ms/eval")

# varying, one at a time blocking
t0 = time.time()
for p in params:
    fn(z, p, nuggets).block_until_ready()
print(f"varying-sync  {(time.time()-t0)/10*1e3:9.2f} ms/eval")

# saturation test: long runs reveal true sustained rate if blocking is lazy
for reps in (50, 200):
    t0 = time.time()
    for k in range(reps):
        out = fn(z, params[k % 10], nuggets)
    jax.block_until_ready(out)
    print(f"sustained x{reps}  {(time.time()-t0)/reps*1e3:9.2f} ms/eval")
