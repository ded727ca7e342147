#!/usr/bin/env python
"""Benchmark: Vecchia loglikelihood throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config via env: BENCH_N (default 100000), BENCH_M (20), BENCH_COND (SGV),
BENCH_EVALS (20).

vs_baseline models the reference's OpenMP C++/R pipeline on a 16-core CPU
(the reference publishes no numbers, BASELINE.md): per likelihood
evaluation it must (a) run n dense (m+1)-Cholesky solves (U_NZentries,
/root/reference/src/U_NZentries.cpp:37-69; ~2(m+1)^3/3 flops each plus m^2
kernel evaluations, ~3 GFLOP/s effective for tiny LAPACK factorizations,
16-way parallel), and (b) a *sequential* sparse Cholesky of W.rev plus
triangular solves (~30 flops/nnz at ~1 GFLOP/s single-core).  This is a
deliberately generous model of the reference.
"""

import json
import os
import sys
import time

import numpy as np


def modeled_reference_seconds(n, m, w_nnz):
    mp1 = m + 1
    per_row = (2.0 * mp1 ** 3 / 3.0 + 50.0 * mp1 * mp1) / 3e9  # chol+kernel
    part_a = n * per_row / 16.0                 # OpenMP over 16 cores
    part_b = w_nnz * 30.0 / 1e9                # sequential sparse chol+solves
    return part_a + part_b


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    m = int(os.environ.get("BENCH_M", 20))
    cond = os.environ.get("BENCH_COND", "SGV")
    n_evals = int(os.environ.get("BENCH_EVALS", 20))

    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from gpvecchia_tpu import vecchia_specify
    from gpvecchia_tpu.inference.likelihood import loglik_fn
    from gpvecchia_tpu.plan import get_plan

    dtype = jnp.float32
    platform = jax.devices()[0].platform
    print(f"[bench] backend={platform} n={n} m={m} cond={cond}",
          file=sys.stderr)

    rng = np.random.default_rng(1988)
    locs = rng.uniform(size=(n, 2))
    t0 = time.time()
    spec = vecchia_specify(locs, m=m, cond_yz=cond)
    t1 = time.time()
    plan = get_plan(spec, dtype)
    t2 = time.time()
    print(f"[bench] spec {t1 - t0:.1f}s plan {t2 - t1:.1f}s "
          f"v_nnz={plan.v_nnz} "
          f"fwd_levels={len(plan.fwd_blocks)}", file=sys.stderr)

    fn = loglik_fn(spec, "matern", dtype=dtype)
    z = jnp.asarray(rng.normal(size=n), dtype)
    nuggets = jnp.full((n,), 0.1, dtype)
    covparms0 = np.array([1.0, 0.2, 0.5])

    t3 = time.time()
    out = fn(z, jnp.asarray(covparms0, dtype), nuggets)
    out.block_until_ready()
    t4 = time.time()
    print(f"[bench] compile+first eval {t4 - t3:.1f}s  loglik={float(out):.2f}",
          file=sys.stderr)

    # steady state: vary parameters so nothing can be constant-folded
    params = [jnp.asarray(covparms0 * (1.0 + 0.01 * k), dtype)
              for k in range(n_evals)]
    for p in params[:2]:
        fn(z, p, nuggets).block_until_ready()
    t5 = time.time()
    vals = [fn(z, p, nuggets) for p in params]
    jax.block_until_ready(vals)
    t6 = time.time()
    per_eval = (t6 - t5) / n_evals
    evals_per_sec = 1.0 / per_eval

    ref_sec = modeled_reference_seconds(n, m, plan.v_nnz)
    vs_baseline = ref_sec / per_eval
    print(f"[bench] per-eval {per_eval * 1000:.2f} ms; modeled reference "
          f"{ref_sec * 1000:.1f} ms; total bench {time.time() - t_start:.0f}s",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"vecchia_loglik_evals_per_sec_n{n}_m{m}_{cond}",
        "value": round(evals_per_sec, 3),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
