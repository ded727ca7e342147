#!/usr/bin/env python
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from gpvecchia_tpu import vecchia_specify
from gpvecchia_tpu.inference.likelihood import loglik_fn

n, m = 100_000, 20
rng = np.random.default_rng(1988)
locs = rng.uniform(size=(n, 2))
spec = vecchia_specify(locs, m=m, cond_yz="SGV")
dt = jnp.float32
fn = loglik_fn(spec, "matern", dtype=dt)
z = jnp.asarray(rng.normal(size=n), dt)
nuggets = jnp.full((n,), 0.1, dt)
covparms0 = np.array([1.0, 0.2, 0.5])

t3 = time.time()
out = fn(z, jnp.asarray(covparms0, dt), nuggets)
out.block_until_ready()
print(f"compile+first {time.time()-t3:.1f}s")
print(f"loglik={float(out):.2f}")   # the host fetch bench does

params = [jnp.asarray(covparms0 * (1.0 + 0.01 * k), dt) for k in range(20)]
for p in params[:2]:
    fn(z, p, nuggets).block_until_ready()
for k, p in enumerate(params):
    t0 = time.time()
    fn(z, p, nuggets).block_until_ready()
    print(f"eval {k:2d}: {(time.time()-t0)*1e3:9.2f} ms")
