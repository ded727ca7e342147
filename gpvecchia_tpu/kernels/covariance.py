"""Covariance kernels (JAX, device-side).

Isotropic kernels evaluated elementwise on distance arrays, designed to fuse
into the batched conditioning-set covariance build.  All functions are
jit/vmap/grad friendly and handle d == 0 without NaN gradients.

Reference parity targets (behavior, not code):
  - MaternFun ~ /root/reference/src/Matern.cpp:24-86 (closed forms for
    nu = 0.5/1.5/2.5; general nu via modified Bessel K)
  - EsqeFun   ~ /root/reference/src/Esqe.cpp:17-39 (exponential + squared
    exponential sum kernel)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .bessel import _log_kv_impl, log_kv

__all__ = ["matern", "esqe", "pairwise_dist", "cross_dist", "make_kernel_fn"]

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.2360679774997896


def _safe_dist(d2):
    """sqrt with a zero-safe gradient (grad -> 0 at d2 == 0)."""
    z = d2 > 0
    return jnp.where(z, jnp.sqrt(jnp.where(z, d2, 1.0)), 0.0)


def pairwise_dist(pts):
    """Pairwise Euclidean distances of (..., k, d) -> (..., k, k)."""
    d = pts[..., :, None, :] - pts[..., None, :, :]
    return _safe_dist(jnp.sum(d * d, axis=-1))


def cross_dist(a, b):
    """Distances between (..., p, d) and (..., q, d) -> (..., p, q)."""
    d = a[..., :, None, :] - b[..., None, :, :]
    return _safe_dist(jnp.sum(d * d, axis=-1))


def _matern_dispatch_idx(nu):
    """Runtime branch index for a traced smoothness, matching the
    reference's value-based closed-form fast paths (src/Matern.cpp:32-71)."""
    return jnp.where(nu == 0.5, 0,
                     jnp.where(nu == 1.5, 1, jnp.where(nu == 2.5, 2, 3)))


def _matern_raw(dist, covparms):
    sig2, rho, nu = covparms[0], covparms[1], covparms[2]
    s = dist / rho

    def _m05(s, nu):
        return jnp.exp(-s)

    def _m15(s, nu):
        return (1.0 + _SQRT3 * s) * jnp.exp(-_SQRT3 * s)

    def _m25(s, nu):
        return (1.0 + _SQRT5 * s + 5.0 * s * s / 3.0) * jnp.exp(-_SQRT5 * s)

    def _mgen(s, nu):
        # general smoothness: 2^(1-nu)/Gamma(nu) * s^nu * K_nu(s)
        pos = s > 0
        s_safe = jnp.where(pos, s, 1.0)
        logc = ((1.0 - nu) * jnp.log(2.0) - jax.lax.lgamma(nu)
                + nu * jnp.log(s_safe) + log_kv(nu, s_safe))
        return jnp.where(pos, jnp.exp(logc), 1.0)

    nu_static = None
    if not isinstance(nu, jax.core.Tracer):
        try:
            nu_static = float(nu)
        except TypeError:
            nu_static = None

    if nu_static is not None:
        fn = {0.5: _m05, 1.5: _m15, 2.5: _m25}.get(nu_static, _mgen)
        c = fn(s, covparms[2])
    else:
        idx = _matern_dispatch_idx(nu)
        c = jax.lax.switch(idx, [_m05, _m15, _m25, _mgen], s, nu)
    return sig2 * jnp.where(dist > 0, c, 1.0)


@jax.custom_vjp
def matern(dist, covparms):
    """Matern covariance on a distance array.

    covparms = (variance, range, smoothness).  Closed forms are used when the
    smoothness is a static 0.5 / 1.5 / 2.5; any other (or traced) smoothness
    goes through the differentiable log-Bessel-K path.

    Carries a custom VJP with analytic branch derivatives: reverse mode
    through the runtime smoothness dispatch (lax.switch) nested in a row
    chunking scan would otherwise stack per-iteration residuals of the
    Bessel series loops — (ITERS, n, P)-sized arrays that OOM the gradient
    compile at the n=1e6/m=40 config.
    """
    return _matern_raw(dist, covparms)


def _matern_fwd(dist, covparms):
    c = _matern_raw(dist, covparms)
    return c, (dist, covparms, c)


def _matern_bwd(res, g):
    dist, covparms, c = res
    dt = c.dtype
    sig2, rho, nu = covparms[0], covparms[1], covparms[2]
    pos = dist > 0
    s = jnp.where(pos, dist, 1.0) / rho
    G = c / sig2                      # the unit-variance correlation g(s)

    # dG/ds per smoothness branch — plain forward evaluations only
    def _d05(s, nu, G):
        return -G                     # G = exp(-s)

    def _d15(s, nu, G):
        return -3.0 * s * jnp.exp(-_SQRT3 * s)

    def _d25(s, nu, G):
        return -(5.0 / 3.0) * s * (1.0 + _SQRT5 * s) * jnp.exp(-_SQRT5 * s)

    def _dgen(s, nu, G):
        # dG/ds = G * (2 nu / s - K_{nu+1}(s)/K_nu(s))
        r = jnp.exp(_log_kv_impl(nu + 1.0, s) - _log_kv_impl(nu, s))
        return G * (2.0 * nu / s - r)

    nu_static = None
    if not isinstance(nu, jax.core.Tracer):
        try:
            nu_static = float(nu)
        except TypeError:
            nu_static = None
    if nu_static is not None:
        fn = {0.5: _d05, 1.5: _d15, 2.5: _d25}.get(nu_static, _dgen)
        dGds = fn(s, nu, G)
        is_gen = nu_static not in (0.5, 1.5, 2.5)
        idx = None
    else:
        idx = _matern_dispatch_idx(nu)
        dGds = jax.lax.switch(idx, [_d05, _d15, _d25, _dgen], s, nu, G)
        is_gen = None
    dGds = jnp.where(pos, dGds, 0.0)

    gsig2 = jnp.sum(g * G)
    grho = jnp.sum(g * (sig2 * dGds) * (-(s / rho)))    # ds/drho = -s/rho

    def _dnu_sum():
        # dG/dnu = G * (-log 2 - digamma(nu) + log s + dlogK/dnu), fd on nu
        h = jnp.asarray(3e-6 if dt == jnp.float64 else 1e-3, dt)
        dlk = (_log_kv_impl(nu + h, s)
               - _log_kv_impl(jnp.abs(nu - h), s)) / (2.0 * h)
        dGdnu = G * (-jnp.log(jnp.asarray(2.0, dt))
                     - jax.lax.digamma(nu) + jnp.log(s) + dlk)
        return jnp.sum(g * sig2 * jnp.where(pos, dGdnu, 0.0))

    if idx is None:
        gnu = _dnu_sum() if is_gen else jnp.zeros((), dt)
    else:
        gnu = jax.lax.cond(idx == 3, _dnu_sum, lambda: jnp.zeros((), dt))

    dcov = jnp.zeros_like(covparms)
    dcov = dcov.at[0].set(gsig2.astype(dcov.dtype))
    dcov = dcov.at[1].set(grho.astype(dcov.dtype))
    dcov = dcov.at[2].set(gnu.astype(dcov.dtype))
    ddist = (g * sig2 * dGds / rho).astype(dt)
    return ddist, dcov


matern.defvjp(_matern_fwd, _matern_bwd)


def esqe(dist, covparms):
    """Exponential + squared-exponential sum kernel.

    covparms = (var1, range1, var2, range2).
    """
    v1, r1, v2, r2 = covparms[0], covparms[1], covparms[2], covparms[3]
    s1 = dist / r1
    s2 = dist / r2
    return v1 * jnp.exp(-s1) + v2 * jnp.exp(-(s2 * s2))


def make_kernel_fn(covmodel) -> Callable:
    """Resolve a covariance model spec into a covariance evaluator.

    Accepts 'matern', 'esqe', or a callable:
      * f(dist) or f(dist, covparms) — evaluated on distance arrays;
      * f(locs1, locs2) or f(locs1, locs2, covparms) with first parameter
        named 'locs1'/'loc1'/'x1' — evaluated on broadcastable (..., d)
        location-pair arrays (the reference's user covariance function over
        location pairs, /root/reference/R/createU.R:93-108).  The returned
        function carries ``takes_locs = True`` so callers feed coordinates.
    """
    if isinstance(covmodel, str):
        if covmodel == "matern":
            return matern
        if covmodel == "esqe":
            return esqe
        raise ValueError(f"covariance model '{covmodel}' is not implemented")
    if callable(covmodel):
        import inspect
        try:
            params = list(inspect.signature(covmodel).parameters)
        except (TypeError, ValueError):
            params = ["dist", "covparms"]
        if params and params[0] in ("locs1", "loc1", "x1"):
            if len(params) == 2:
                fn = lambda a, b, covparms: covmodel(a, b)
            else:
                fn = lambda a, b, covparms: covmodel(a, b, covparms)
            fn.takes_locs = True
            return fn
        if len(params) == 1:
            return lambda dist, covparms: covmodel(dist)
        return covmodel
    raise ValueError("covmodel must be a string or callable")
