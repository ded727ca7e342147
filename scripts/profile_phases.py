"""Per-phase timing of the Vecchia loglikelihood pipeline on the current
backend (the single profiling entry point; consolidates the former
profile_* scripts).

Env knobs: N (default 100000), M (20), COND (SGV), REPS (5), DTYPE (f32),
TRACE (directory: capture a jax.profiler trace of the timed region, view
with `tensorboard --logdir $TRACE` or perfetto via the generated .json.gz).
Phases: u_entries, mf_factor (factor+forward of W), full loglik, grad.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 100_000))
M = int(os.environ.get("M", 20))
COND = os.environ.get("COND", "SGV")
REPS = int(os.environ.get("REPS", 5))
DTYPE = jnp.float64 if os.environ.get("DTYPE") == "f64" else jnp.float32

from gpvecchia_tpu import vecchia_specify               # noqa: E402
from gpvecchia_tpu.inference.likelihood import (        # noqa: E402
    _device_arrays, _mf_denominator, loglik_core)
from gpvecchia_tpu.kernels.covariance import make_kernel_fn   # noqa: E402
from gpvecchia_tpu.kernels.u_entries import u_entries   # noqa: E402
from gpvecchia_tpu.linalg.sparse import gather          # noqa: E402
from gpvecchia_tpu.plan import get_mf_plan, get_plan    # noqa: E402

rng = np.random.default_rng(1988)
locs = rng.uniform(size=(N, 2))
t0 = time.time()
spec = vecchia_specify(locs, m=M, cond_yz=COND)
t1 = time.time()
plan = get_plan(spec, DTYPE)
dev = _device_arrays(plan)
t2 = time.time()
print(f"backend={jax.default_backend()} n={N} m={M} cond={COND} "
      f"mode={plan.mode} use_mf={plan.use_mf}")
print(f"spec {t1 - t0:.1f}s  plan+dev {t2 - t1:.1f}s")
if plan.use_mf:
    mf, _ = get_mf_plan(plan)
    sizes = [(1 << d, lv.npiv, lv.nbord) for d, lv in enumerate(mf.levels)]
    print("mf levels (N, P, B):", sizes)

kernel_fn = make_kernel_fn("matern")
z = jnp.asarray(rng.normal(size=spec.n_obs), DTYPE)
covparms = jnp.asarray([1.0, 0.2, 0.5], DTYPE)
nuggets = jnp.full((spec.n_obs,), 0.1, DTYPE)
dt = DTYPE


def _sync(out):
    """True device sync: value readback (block_until_ready is unreliable on
    the axon runtime — executions whose outputs are never consumed get
    skipped/queued, so only a float() readback measures honestly)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.real(jnp.ravel(leaf)[0]))


TRACE = os.environ.get("TRACE")


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    t1 = time.time()
    per = []
    if TRACE:
        # device trace of one steady-state run per phase (annotated); the
        # axon plugin may lack device-side tracing — host spans still land
        import contextlib
        trace_ctx = jax.profiler.TraceAnnotation(name)
    else:
        import contextlib
        trace_ctx = contextlib.nullcontext()
    for _ in range(REPS):
        t = time.time()
        with trace_ctx:
            _sync(fn(*args))
        per.append(time.time() - t)
    per_run = sorted(per)[len(per) // 2]
    print(f"{name:16s} compile+1st {t1 - t0:7.1f}s   per-run "
          f"{per_run * 1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def f_u(dev, covparms, nuggets):
    nug_ord = gather(nuggets, dev["ord_z"])
    nug_point = jnp.zeros(plan.n_all, dt).at[dev["obs_points"]].set(nug_ord)
    return u_entries(dev["locs"], dev["NN"], dev["valid"], dev["cond"],
                     nug_point, kernel_fn, covparms, pdist=dev.get("pdist"),
                     nbr_pts=dev.get("nbr_pts"),
                     row_chunks=plan.compiled.get("u_row_chunks", 1),
                     fused=dev.get("fused"))[0]


if TRACE:
    jax.profiler.start_trace(TRACE)

col = timed("u_entries", f_u, dev, covparms, nuggets)

if plan.use_mf:
    @jax.jit
    def f_mf(dev, col, z, nuggets):
        nug_ord = gather(nuggets, dev["ord_z"])
        zord = gather(z, dev["ord_z"])
        znb = zord[dev["nb_obs_pos"]]
        z1L = jnp.sum(jnp.where(dev["nb_resp"], col * znb, 0.0), axis=1)
        fac = _mf_denominator(plan, dev, col, z1L, zord, nug_ord, dt)
        return fac["logdet"], fac["quad"]

    timed("mf_factor+fwd", f_mf, dev, col, z, nuggets)

core, dev2 = loglik_core(spec, "matern", DTYPE)
f_ll = jax.jit(core)
timed("full loglik", f_ll, dev2, z, covparms, nuggets)

f_grad = jax.jit(jax.grad(lambda d, z, c, n: core(d, z, c, n), argnums=2))
timed("grad loglik", f_grad, dev2, z, covparms, nuggets)

if TRACE:
    jax.profiler.stop_trace()
    print(f"trace written to {TRACE} (view: tensorboard --logdir {TRACE})")
