"""Analyze the static structure of the likelihood plan at a bench config.

Reports elimination-level distribution and padded-vs-useful work volumes of
the gather-based schedules.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from gpvecchia_tpu.spec import vecchia_specify
from gpvecchia_tpu.plan import get_plan

n = int(os.environ.get("N", 100000))
m = int(os.environ.get("M", 20))
cond = os.environ.get("COND", "SGV")

rng = np.random.default_rng(0)
locs = rng.uniform(size=(n, 2))

t0 = time.perf_counter()
spec = vecchia_specify(locs, m, cond_yz=cond)
t1 = time.perf_counter()
plan = get_plan(spec, np.float32)
t2 = time.perf_counter()
print(f"spec {t1-t0:.1f}s plan {t2-t1:.1f}s")
print(f"mode={plan.mode} n_lat={plan.n_lat} v_nnz={plan.v_nnz}")


def pair_stats(name, buckets):
    pad = use = 0
    for b in buckets:
        pad += b.pa.size
        use += int((b.pa >= 0).sum())
    print(f"{name}: buckets={len(buckets)} padded={pad/1e6:.2f}M "
          f"useful={use/1e6:.2f}M")


pair_stats("w_schedule", plan.w_schedule)
pair_stats("z2_schedule", plan.z2_schedule)

pad = use = nlev = 0
for b in plan.factor_buckets:
    nlev += b.classes[0][0].shape[0] if b.classes else 0
    desc = []
    for out, cols, dtar, pa, pb in b.classes:
        pad += pa.size
        use += int((pa >= 0).sum())
        desc.append(f"E={out.shape[1]}xC={pa.shape[2]}")
    print(f"  factor bucket nlev={b.classes[0][0].shape[0] if b.classes else 0} "
          + " ".join(desc))
print(f"factor: levels={nlev} buckets={len(plan.factor_buckets)} "
      f"padded_pairs={pad/1e6:.2f}M useful={use/1e6:.2f}M")

for name, blocks, fields in (("fwd", plan.fwd_blocks, ("row_slots",)),
                             ("bwd", plan.bwd_blocks, ("slots",))):
    pad = use = nlev = 0
    for b in blocks:
        a = getattr(b, fields[0])
        pad += a.size
        use += int((a >= 0).sum())
        nlev += b.cols.shape[0]
    print(f"{name}: levels={nlev} buckets={len(blocks)} "
          f"padded={pad/1e6:.2f}M useful={use/1e6:.2f}M")
