"""Per-LEVEL timing of the multifrontal factor at the bench config.

For each tree level, times (a) the extend-add that builds its fronts and
(b) the factor (chol+trsm+schur) of those fronts, as separate jitted calls
with value-readback sync.  Synthetic SPD fronts of the exact plan shapes —
timing depends on shapes, not values.

Env: N (1e6), M (40), COND (SGV), REPS (3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GPV_COMPILE_CACHE", "/tmp/gpv_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

N = int(os.environ.get("N", 1_000_000))
M = int(os.environ.get("M", 40))
COND = os.environ.get("COND", "SGV")
REPS = int(os.environ.get("REPS", 3))

from gpvecchia_tpu.utils.serialize import load_spec          # noqa: E402
from gpvecchia_tpu import vecchia_specify                    # noqa: E402
from gpvecchia_tpu.plan import get_mf_plan, get_plan         # noqa: E402
from gpvecchia_tpu.linalg import multifrontal as mfmod       # noqa: E402
from gpvecchia_tpu.linalg.pallas_eadd import eadd_fits_vmem  # noqa: E402
from gpvecchia_tpu.linalg.pallas_frontal import fits_vmem    # noqa: E402

cache = f"/tmp/gpv_spec_{N}_{M}_{COND}.npz"
if os.path.exists(cache):
    spec = load_spec(cache)
else:
    rng = np.random.default_rng(1988)
    spec = vecchia_specify(rng.uniform(size=(N, 2)), m=M, cond_yz=COND)

plan = get_plan(spec, jnp.float32)
mf, mfdev = get_mf_plan(plan)
static, arrays = mfmod.mf_device_arrays(mf)
D = static.depth
print(f"backend={jax.default_backend()} n={N} m={M} depth={D}")
tot_flops_fac = 0.0
for d in range(D + 1):
    nn = 1 << d
    P, B = static.npiv[d], static.nbord[d]
    F = P + B
    fl = nn * (P**3 / 3 + P * P * B + P * B * B)  # chol+trsm+syrk
    tot_flops_fac += fl
    print(f"  d={d:2d} N={nn:5d} P={P:4d} B={B:4d} F={F:4d} "
          f"pallas_fac={fits_vmem(F, P)} pallas_eadd={eadd_fits_vmem(F, B and (static.nbord[d+1] if d < D else 0))} "
          f"fac_gflops={fl/1e9:7.2f}")
print(f"total factor gflops={tot_flops_fac/1e9:.1f}")


def sync(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    t1 = time.time()
    per = []
    for _ in range(REPS):
        t = time.time()
        sync(fn(*args))
        per.append(time.time() - t)
    ms = sorted(per)[len(per) // 2] * 1e3
    print(f"{name:24s} compile {t1-t0:6.1f}s  per-run {ms:8.2f} ms",
          flush=True)
    return ms


rng = np.random.default_rng(0)
levels = arrays["levels"]

# ---- leaf level: assembly + factor (chunked), real u_vals shapes ----
E, K = mf.levels[D].elem_pt.shape[0] * 0 + plan.NN.shape[0], plan.NN.shape[1]
lvD = levels[D]
EL = lvD["elem_pt"].shape[1]
u_vals = jnp.asarray(rng.normal(size=(plan.NN.shape[0], K)) * 0.1,
                     jnp.float32)
dvec = jnp.full((static.n_vert,), 3.0, jnp.float32)
rhs_elem = jnp.asarray(rng.normal(size=(plan.NN.shape[0],)), jnp.float32)

_F = static.npiv[D] + static.nbord[D]
_NL = lvD["piv_ids"].shape[0]
need = _NL * EL * _F * 4
leaf_chunks = 1
while need // leaf_chunks > 800_000_000 and leaf_chunks < _NL:
    leaf_chunks *= 2
print(f"leaf_chunks={leaf_chunks} EL={EL}")


def leaf_only(u_vals, dvec, rhs_elem):
    P, B = static.npiv[D], static.nbord[D]
    F = P + B
    lv = levels[D]
    nchunk = leaf_chunks if (leaf_chunks > 1
                             and lv["piv_ids"].shape[0] % leaf_chunks == 0) \
        else 1
    NL = lv["piv_ids"].shape[0]
    ept_r = lv["elem_pt"].reshape(nchunk, NL // nchunk, -1)
    epos_r = lv["elem_pos"].reshape(nchunk, NL // nchunk, ept_r.shape[-1], -1)
    piv_r = lv["piv_ids"].reshape(nchunk, NL // nchunk, -1)

    def body(args):
        ch = dict(elem_pt=args[0], elem_pos=args[1], piv_ids=args[2])
        ul = mfmod._leaf_uloc(ch, F, u_vals, jnp.float32)
        fr = jnp.einsum("nef,neg->nfg", ul, ul, precision=mfmod._PREC)
        df = mfmod._piv_gather(ch, dvec, 1.0, F, jnp.float32)
        fr = fr + df[:, :, None] * jnp.eye(F, dtype=jnp.float32)
        re = mfmod._gather_elem(ch, rhs_elem, jnp.float32)
        bb = jnp.einsum("nef,ne->nf", ul, re, precision=mfmod._PREC)
        Lpp_c, Lbp_c = mfmod._factor_level(fr, P, B)
        y_c = mfmod.lower_solve_vec(Lpp_c, bb[:, :P])
        upd_c = fr[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", Lbp_c, Lbp_c,
                                           precision=mfmod._PREC)
        return Lpp_c, Lbp_c, y_c, upd_c

    return jax.lax.map(body, (ept_r, epos_r, piv_r))


def leaf_assembly(u_vals, dvec):
    P, B = static.npiv[D], static.nbord[D]
    F = P + B
    lv = levels[D]
    nchunk = leaf_chunks if (leaf_chunks > 1
                             and lv["piv_ids"].shape[0] % leaf_chunks == 0) \
        else 1
    NL = lv["piv_ids"].shape[0]
    ept_r = lv["elem_pt"].reshape(nchunk, NL // nchunk, -1)
    epos_r = lv["elem_pos"].reshape(nchunk, NL // nchunk, ept_r.shape[-1], -1)
    piv_r = lv["piv_ids"].reshape(nchunk, NL // nchunk, -1)

    def body(args):
        ch = dict(elem_pt=args[0], elem_pos=args[1], piv_ids=args[2])
        ul = mfmod._leaf_uloc(ch, F, u_vals, jnp.float32)
        fr = jnp.einsum("nef,neg->nfg", ul, ul, precision=mfmod._PREC)
        return jnp.sum(fr, axis=(1, 2))

    return jax.lax.map(body, (ept_r, epos_r, piv_r))


ms_leaf = timed(f"d={D} leaf asm+factor", jax.jit(leaf_only),
                u_vals, dvec, rhs_elem)
ms_asm = timed(f"d={D} leaf asm only", jax.jit(leaf_assembly), u_vals, dvec)

# ---- internal levels ----
tot_eadd = 0.0
tot_fac = 0.0
for d in range(D - 1, -1, -1):
    lv = levels[d]
    P, B = static.npiv[d], static.nbord[d]
    F = P + B
    nn = 1 << d
    Bc = static.nbord[d + 1]
    upd = jnp.asarray(rng.normal(size=(2 * nn, Bc, Bc)), jnp.float32)
    upd = upd + jnp.swapaxes(upd, 1, 2)

    def eadd_level(upd, lv=lv, F=F, d=d, Bc=Bc, nn=nn):
        if (jax.default_backend() == "tpu" and Bc > 0
                and eadd_fits_vmem(F, Bc)
                and not os.environ.get("GPV_NO_PALLAS")):
            return mfmod.eadd_fronts(upd.reshape(nn, 2, Bc, Bc), lv["ext"], F)
        return mfmod._extend_add_mat(lv, F, upd, jnp.float32)

    ms_e = timed(f"d={d} eadd (Bc={Bc})", jax.jit(eadd_level), upd)
    tot_eadd += ms_e

    fr = jnp.asarray(rng.normal(size=(nn, F, F)), jnp.float32)
    fr = fr + jnp.swapaxes(fr, 1, 2) + 4.0 * F * jnp.eye(F)[None]

    def fac_level(fr, P=P, B=B):
        Lpp, Lbp = mfmod._factor_level(fr, P, B)
        upd = fr[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", Lbp, Lbp,
                                         precision=mfmod._PREC)
        return Lpp, Lbp, upd

    ms_f = timed(f"d={d} factor (pallas={fits_vmem(F, P)})",
                 jax.jit(fac_level), fr)
    tot_fac += ms_f

print(f"\nleaf asm+fac {ms_leaf:.1f} ms (asm {ms_asm:.1f}); "
      f"internal eadd {tot_eadd:.1f} ms; internal fac {tot_fac:.1f} ms; "
      f"sum {ms_leaf + tot_eadd + tot_fac:.1f} ms")
