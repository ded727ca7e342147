"""Vecchia marginal likelihood (JAX, jit + grad capable).

Implements the general-Vecchia Gaussian loglikelihood
(/root/reference/R/vecchia_likelihood.R:63-99) on the padded-dense
representation: numerator from response columns of U, denominator through the
reverse-ordered factor V of W = U_y U_y^T + D.  Unlike the reference, the
whole computation is differentiable in the covariance parameters and nuggets.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.covariance import make_kernel_fn
from ..kernels.u_entries import u_entries
from ..linalg.sparse import gather0, pair_sum, scatter_set_unique
from ..linalg.trisolve import forward_solve
from ..plan import get_plan

__all__ = ["vecchia_likelihood", "loglik_fn", "loglik_core",
           "compute_v_factor"]


def _device_arrays(plan):
    """Device copies of the plan's index arrays (cached).

    These are passed to the jitted kernels as ARGUMENTS (one shared buffer),
    never captured as closure constants: constants get baked into the
    executable and XLA constant-folds gathers like locs[NN] into
    O(n * (m+1)^2) materialized arrays at compile time.
    """
    if "dev" in plan.compiled:
        return plan.compiled["dev"]
    dt = plan.dtype
    dev = {
        "locs": jnp.asarray(plan.locs, dt),
        "NN": jnp.asarray(plan.NN),
        "valid": jnp.asarray(plan.valid),
        "cond": jnp.asarray(plan.cond),
        "nb_resp": jnp.asarray(plan.nb_resp),
        "nb_obs_pos": jnp.asarray(plan.nb_obs_pos),
        "obs_points": jnp.asarray(plan.obs_points),
        "ord_z": jnp.asarray(plan.ord_z),
        "has_lat": jnp.asarray(plan.has_latent_pts),
        "latent_rank": jnp.asarray(plan.latent_rank),
        "obs_pos": jnp.asarray(plan.obs_pos),
    }
    dev.update(
        v_rows=jnp.asarray(plan.v_rows),
        v_diag_slots=jnp.asarray(plan.v_diag_slots),
        dir_slots=jnp.asarray(plan.dir_slots),
        dir_pt=jnp.asarray(plan.dir_pt),
        dir_nn=jnp.asarray(plan.dir_nn),
        w_sched=[(jnp.asarray(b.out_idx), jnp.asarray(b.pa), jnp.asarray(b.pb))
                 for b in plan.w_schedule],
        z2_sched=[(jnp.asarray(b.out_idx), jnp.asarray(b.pa), jnp.asarray(b.pb))
                  for b in plan.z2_schedule],
        factor=[[tuple(jnp.asarray(x) for x in cl) for cl in b.classes]
                for b in plan.factor_buckets],
        fwd=[(jnp.asarray(b.cols), jnp.asarray(b.diag_slots),
              jnp.asarray(b.row_slots), jnp.asarray(b.row_cols))
             for b in plan.fwd_blocks],
        bwd=[(jnp.asarray(b.cols), jnp.asarray(b.slots), jnp.asarray(b.rows))
             for b in plan.bwd_blocks],
    )
    plan.compiled["dev"] = dev
    return dev


def _nugget_vectors(plan, dev, nuggets, dt):
    """(nug_ord over obs positions, nug_point over ordered points).

    `nuggets` is a length-n_obs vector in original observation order.
    """
    nug_vec = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(nuggets, dt)),
                               (plan.n_obs,))
    nug_ord = nug_vec[dev["ord_z"]]
    nug_point = jnp.zeros(plan.n_all, dt).at[dev["obs_points"]].set(nug_ord)
    return nug_ord, nug_point


def compute_v_factor(plan, dev, col, nug_ord, dt):
    """Numeric V factor values (v_flat) from U columns and nuggets.

    Up-looking exact factorization on the static schedule (plan.py): W is
    assembled once as a gather-based pair reduction, then each elimination
    level computes whole columns from already-final values — no mutable W,
    no colliding scatters (cf. the reference's Matrix::chol / ic0 at
    /root/reference/R/vecchia_prediction.R:74-84, src/ic0.cpp:43-64).
    """
    v_flat = jnp.zeros(plan.v_nnz, dt)
    # direct columns: reversed U columns copied verbatim
    if plan.dir_slots.size:
        v_flat = scatter_set_unique(v_flat, dev["dir_slots"],
                                    col[dev["dir_pt"], dev["dir_nn"]])
    if not dev["factor"]:
        return v_flat
    # W on the factor pattern from U products + 1/nugget diagonal terms
    ucat = jnp.concatenate([col.ravel(), 1.0 / nug_ord, jnp.ones(1, dt)])
    w_init = pair_sum(ucat, ucat, dev["w_sched"], plan.v_nnz, dt)

    tiny = jnp.asarray(1e-30, dt)

    def body(carry, xs):
        v_flat, dbuf = carry
        raws = []
        for out, cols, dtar, pa, pb in xs:
            w0 = gather0(w_init, out)
            if pa.shape[-1] > 0:
                prods = gather0(v_flat, pa) * gather0(v_flat, pb)
                raw = w0 - jnp.sum(prods, axis=-1)
            else:
                raw = w0
            dbuf = scatter_set_unique(dbuf, dtar, raw)
            raws.append(raw)
        for (out, cols, dtar, pa, pb), raw in zip(xs, raws):
            colv = raw * jax.lax.rsqrt(
                jnp.maximum(dbuf[jnp.clip(cols, 0)], tiny))
            v_flat = scatter_set_unique(v_flat, out, colv)
        return (v_flat, dbuf), None

    dbuf = jnp.zeros(plan.n_lat, dt)
    carry = (v_flat, dbuf)
    for bucket in dev["factor"]:
        if bucket[0][0].shape[0] == 1:
            carry, _ = body(carry, jax.tree.map(lambda a: a[0], bucket))
        else:
            carry, _ = jax.lax.scan(body, carry, bucket)
    return carry[0]


def _dispatch_covmodel(spec, covmodel, dtype):
    """Resolve covmodel into (full covmat | selected (vals, slots) | kernel)."""
    covmat = sel = kernel_fn = None
    if isinstance(covmodel, np.ndarray) or (hasattr(covmodel, "shape")
                                            and not callable(covmodel)):
        arr = np.asarray(covmodel, np.float64)
        n_all, mp1 = spec.NNarray.shape
        if arr.shape == (n_all, n_all):
            covmat = jnp.asarray(arr, dtype)
        elif arr.shape == (n_all, mp1):
            from ..plan import get_sel_pair_slots
            slots = get_sel_pair_slots(spec)
            sel = (jnp.asarray(np.nan_to_num(arr).ravel(), dtype),
                   jnp.asarray(slots))
        else:
            raise ValueError(
                f"covariance matrix shape {arr.shape} matches neither the "
                f"full ({n_all},{n_all}) nor selected ({n_all},{mp1}) layout")
    else:
        kernel_fn = make_kernel_fn(covmodel)
    return covmat, sel, kernel_fn


def _loglik_core(plan, kernel_fn, covmat, dev, z, covparms, nuggets, sel=None):
    dt = plan.dtype
    z = jnp.asarray(z, dt)
    covparms = jnp.asarray(covparms, dt)

    # NA handling by nugget inflation (R/vecchia_likelihood.R:45-58)
    isnan = jnp.isnan(z)
    any_nan = jnp.any(isnan)
    zm = jnp.nanmean(z)
    n_ok = jnp.sum(~isnan)
    zv = jnp.nansum(jnp.where(isnan, 0.0, (z - zm) ** 2)) / jnp.maximum(n_ok - 1, 1)
    z = jnp.where(isnan, zm, z)
    nuggets = jnp.where(
        any_nan,
        jnp.where(isnan, zv * 1e8,
                  jnp.broadcast_to(jnp.asarray(nuggets, dt), z.shape)),
        jnp.broadcast_to(jnp.asarray(nuggets, dt), z.shape))

    nug_ord, nug_point = _nugget_vectors(plan, dev, nuggets, dt)
    col = u_entries(dev["locs"], dev["NN"], dev["valid"], dev["cond"],
                    nug_point, kernel_fn, covparms, covmat=covmat, sel=sel)

    zord = z[dev["ord_z"]]

    # z1 over U columns: latent cols gather response-conditioned neighbors
    znb = zord[dev["nb_obs_pos"]]
    z1L = jnp.sum(jnp.where(dev["nb_resp"], col * znb, 0.0), axis=1)
    z1L = jnp.where(dev["has_lat"], z1L, 0.0)
    z1Z = zord / jnp.sqrt(nug_ord)

    quad_num = jnp.sum(z1L * z1L) + jnp.sum(z1Z * z1Z)
    lat_mask = dev["has_lat"]
    logdet_num = (-2.0 * jnp.sum(jnp.where(lat_mask, jnp.log(jnp.where(
        lat_mask, col[:, 0], 1.0)), 0.0)) + jnp.sum(jnp.log(nug_ord)))

    n_lat = plan.n_lat
    # z2 = U_y z1 over latent rows, as a gather-based pair reduction:
    # z2[r] = sum col[p,a]*z1L[p] over in-edges, minus z1Z/sqrt(nug) at the
    # point's own latent row (schedule built in plan.py)
    ucat_z = jnp.concatenate([col.ravel(), jnp.ones(1, dt)])
    zcat = jnp.concatenate([z1L, -z1Z / jnp.sqrt(nug_ord)])
    z2 = pair_sum(ucat_z, zcat, dev["z2_sched"], n_lat, dt)

    # denominator through V
    v_flat = compute_v_factor(plan, dev, col, nug_ord, dt)
    z2rev = z2[::-1]
    z3 = forward_solve(v_flat, z2rev, dev["fwd"])
    quad_denom = jnp.sum(z3 * z3)
    logdet_denom = -2.0 * jnp.sum(jnp.log(v_flat[dev["v_diag_slots"]]))

    const = plan.n_obs * math.log(2.0 * math.pi)
    neg2 = logdet_num - logdet_denom + quad_num - quad_denom + const
    return -0.5 * neg2


def loglik_core(spec, covmodel="matern", dtype=None):
    """(core, dev) for composition under jit/grad/vmap.

    ``core(dev, z, covparms, nuggets)`` is un-jitted; callers must pass the
    ``dev`` index-array pytree through their own jit boundary as an ARGUMENT
    (closure capture would bake it into the executable as constants and
    invite XLA to constant-fold O(n m^2)-sized gathers at compile time).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    plan = get_plan(spec, dtype)
    covmat, sel, kernel_fn = _dispatch_covmodel(spec, covmodel, dtype)
    dev = _device_arrays(plan)

    def core(dev, z, covparms, nuggets):
        return _loglik_core(plan, kernel_fn, covmat, dev, z, covparms,
                            nuggets, sel=sel)

    return core, dev


def loglik_fn(spec, covmodel="matern", dtype=None):
    """Compiled loglik(z, covparms, nuggets) for a given spec (cached)."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    plan = get_plan(spec, dtype)
    key = ("loglik", str(covmodel), np.dtype(dtype).name)
    if key in plan.compiled:
        return plan.compiled[key]
    core, dev = loglik_core(spec, covmodel, dtype)
    _fn = jax.jit(core)

    def fn(z, covparms, nuggets):
        return _fn(dev, z, covparms, nuggets)

    plan.compiled[key] = fn
    return fn


def vecchia_likelihood(z, spec, covparms, nuggets, covmodel="matern"):
    """Gaussian Vecchia loglikelihood (scalar).

    Mirrors /root/reference/R/vecchia_likelihood.R:14-27; `z` in original
    observation order, `nuggets` scalar or per-observation vector.
    """
    if spec.cond_yz == "zy":
        import warnings
        warnings.warn("cond.yz='zy' will produce a poor likelihood "
                      "approximation. Use 'SGV' instead.")
    fn = loglik_fn(spec, covmodel)
    nuggets = np.broadcast_to(np.asarray(nuggets, dtype=np.float64),
                              (spec.n_obs,))
    return float(fn(np.asarray(z, np.float64), np.asarray(covparms, np.float64),
                    nuggets))
