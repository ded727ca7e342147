"""Pallas TPU kernel: batched packed-triangle Cholesky solve x = C^{-1} e0.

This is the device replacement for the reference's hot per-row loop
(/root/reference/src/U_NZentries.cpp:37-69): every ordered point's
(m+1)x(m+1) conditioning covariance is factored and solved against e_self.
The batch lives in the lane (last) dimension; the packed upper triangle of
each small matrix is a (P, n) array with P = (m+1)(m+2)/2 (row-major rows of
the upper triangle, so row i of the triangle occupies the contiguous slab
[off_i, off_i + F - i)).

Kernel layout (per n-tile of TN lanes, everything VMEM-resident):

  * unpack: column j of C for rows >= j IS the row-i slab at off_j (symmetry),
    so F contiguous slab copies fill the lower part of a (F, F, TN) scratch
    whose first axis indexes COLUMNS (tiles) and second axis ROWS (sublanes).
  * right-looking Cholesky, in place: at step j read column tile j, scale by
    rsqrt(diag), write the finished L column back over it, and subtract the
    rank-1 outer update only from the trailing column tiles (j+1:) — the
    triangular update halves the flops and the finished columns double as
    the stored factor (no second buffer, no HBM round trip).
  * the forward solve L y = b rides the factorization (b updated by
    -Lcol * y_j each step), and the backward solve L^T x = y reads the
    stored column tiles directly (L[k, j] = column-tile j, sublane k).

One HBM read of the packed block and one HBM write of the (F, TN) solution
per tile — the XLA einsum formulation this replaces round-trips every
intermediate column through HBM and ran at ~1% VPU utilization.

The custom VJP uses w = C^{-1} xbar (one more factor+solve of the SAME
matrix, recomputed in VMEM rather than storing the (F, F, n) factor) and
emits the packed symmetric gradient  gbar[i<=j] = -(w_i x_j + w_j x_i)
(halved on the diagonal) as contiguous slab writes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_solve_e0", "has_pallas_support"]

# flipped to True by tests to run the kernels through the Pallas interpreter
# on CPU (the TPU lowering itself is exercised by bench/driver runs)
INTERPRET = False

_VMEM_BUDGET = 10 * 2 ** 20      # bytes of VMEM the tile sizing aims for


def has_pallas_support():
    return jax.default_backend() == "tpu"


def _slab_offsets(F):
    """Packed row-major upper triangle: row i occupies [off_i, off_i + F - i)."""
    off = np.zeros(F + 1, np.int64)
    off[1:] = np.cumsum(F - np.arange(F))
    return tuple(int(o) for o in off)


def _tile_n(F, P, itemsize):
    """Lane-tile size fitting the kernel's buffers in the VMEM budget."""
    per_lane = (2 * P + F * F + 8 * F) * itemsize   # Cp in+grad, CL, vectors
    tn = _VMEM_BUDGET // max(per_lane, 1)
    return int(max(256, min(1024, (tn // 128) * 128)))


def _unpack_factor_forward(F, off, cp_ref, CL, bv, yv, dinv):
    """Factor C (packed in cp_ref) into L column tiles in CL, forward-solving
    L y = b (bv must hold b on entry; yv holds y on exit)."""
    for j in range(F):
        CL[j, j:F, :] = cp_ref[off[j]:off[j] + (F - j), :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    for j in range(F):
        di = jax.lax.rsqrt(CL[j, j:j + 1, :])             # (1, TN)
        dinv[j:j + 1, :] = di
        Lcol = jnp.where(rows >= j, CL[j] * di, 0.0)      # (F, TN)
        CL[j] = Lcol
        yj = bv[j:j + 1, :] * di
        yv[j:j + 1, :] = yj
        bv[:] = bv[:] - Lcol * yj
        if j + 1 < F:
            # trailing-column rank-1 update: CL[b, a] -= Lcol[a] * Lcol[b]
            # (explicit lax slice: jnp's a[j+1:] on traced values lowers to
            # lax.gather, which Mosaic cannot lower)
            Ltail = jax.lax.slice_in_dim(Lcol, j + 1, F, axis=0)
            CL[j + 1:F] = CL[j + 1:F] - Lcol[None] * Ltail[:, None, :]


def _backward_subst(F, CL, yv, dinv, xv):
    """Solve L^T x = y into xv, reading L columns from CL tiles."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    for j in range(F - 1, -1, -1):
        if j + 1 < F:
            s = jnp.sum(jnp.where(rows > j, CL[j] * xv[:], 0.0),
                        axis=0, keepdims=True)            # (1, TN)
            xv[j:j + 1, :] = (yv[j:j + 1, :] - s) * dinv[j:j + 1, :]
        else:
            xv[j:j + 1, :] = yv[j:j + 1, :] * dinv[j:j + 1, :]


def _solve_e0_kernel(F, off, cp_ref, x_ref, CL, bv, yv, dinv):
    rows = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 0)
    bv[:] = jnp.where(rows == 0, 1.0, 0.0).astype(bv.dtype)
    _unpack_factor_forward(F, off, cp_ref, CL, bv, yv, dinv)
    _backward_subst(F, CL, yv, dinv, x_ref)


def _solve_e0_bwd_kernel(F, off, cp_ref, xbar_ref, x_ref, g_ref,
                         CL, bv, yv, dinv, wv):
    bv[:] = xbar_ref[:]
    _unpack_factor_forward(F, off, cp_ref, CL, bv, yv, dinv)
    _backward_subst(F, CL, yv, dinv, wv)                  # w = C^{-1} xbar
    for i in range(F):
        g_ref[off[i]:off[i] + 1, :] = -(wv[i:i + 1, :] * x_ref[i:i + 1, :])
        if i + 1 < F:
            g_ref[off[i] + 1:off[i] + (F - i), :] = -(
                wv[i:i + 1, :] * x_ref[i + 1:F, :]
                + x_ref[i:i + 1, :] * wv[i + 1:F, :])


def _pad_lanes(arrs, TN):
    n = arrs[0].shape[-1]
    pad = (-n) % TN
    if pad:
        arrs = [jnp.pad(a, ((0, 0), (0, pad))) for a in arrs]
    return arrs, n, (n + pad) // TN


def _solve_e0_impl(Cp, F):
    P = Cp.shape[0]
    off = _slab_offsets(F)
    TN = _tile_n(F, P, Cp.dtype.itemsize)
    (Cp,), n, nt = _pad_lanes([Cp], TN)
    x = pl.pallas_call(
        functools.partial(_solve_e0_kernel, F, off),
        out_shape=jax.ShapeDtypeStruct((F, nt * TN), Cp.dtype),
        grid=(nt,),
        in_specs=[pl.BlockSpec((P, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, F, TN), Cp.dtype)]
        + [pltpu.VMEM((F, TN), Cp.dtype)] * 3,
        interpret=INTERPRET,
    )(Cp)
    return x[:, :n]


def _solve_e0_bwd_impl(Cp, x, xbar, F):
    P = Cp.shape[0]
    off = _slab_offsets(F)
    TN = _tile_n(F, P, Cp.dtype.itemsize)
    (Cp, x, xbar), n, nt = _pad_lanes([Cp, x, xbar], TN)
    g = pl.pallas_call(
        functools.partial(_solve_e0_bwd_kernel, F, off),
        out_shape=jax.ShapeDtypeStruct((P, nt * TN), Cp.dtype),
        grid=(nt,),
        in_specs=[pl.BlockSpec((P, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((P, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, F, TN), Cp.dtype)]
        + [pltpu.VMEM((F, TN), Cp.dtype)] * 4,
        interpret=INTERPRET,
    )(Cp, xbar, x)
    return g[:, :n]


@functools.lru_cache(maxsize=None)
def _make_solver(F):
    @jax.custom_vjp
    def solve(Cp):
        return _solve_e0_impl(Cp, F)

    def fwd(Cp):
        x = _solve_e0_impl(Cp, F)
        return x, (Cp, x)

    def bwd(res, xbar):
        Cp, x = res
        return (_solve_e0_bwd_impl(Cp, x, xbar, F),)

    solve.defvjp(fwd, bwd)
    return solve


def packed_solve_e0(Cp, F):
    """x = C^{-1} e0 for packed batch-last SPD blocks: (P, n) -> (F, n).

    Differentiable in Cp (custom VJP; the backward pass refactors in VMEM).
    Non-SPD lanes surface as NaN in their own lane only.
    """
    return _make_solver(F)(Cp)

# --------------------------------------------------------------------------
# fused covariance-build + factor + solve (closed-form Matern fast path)
# --------------------------------------------------------------------------

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.2360679774997896


def _cov_slab(dist, sig2, rho, idxf):
    """Closed-form Matern on a distance slab; all three branches computed
    elementwise and selected by idxf (0/1/2) — Mosaic-friendly (no control
    flow), and the extra exps are noise next to the factorization."""
    pos = dist > 0.0
    s = jnp.where(pos, dist, 1.0) / rho
    c05 = jnp.exp(-s)
    c15 = (1.0 + _SQRT3 * s) * jnp.exp(-_SQRT3 * s)
    c25 = (1.0 + _SQRT5 * s + 5.0 / 3.0 * s * s) * jnp.exp(-_SQRT5 * s)
    c = jnp.where(idxf < 0.5, c05, jnp.where(idxf < 1.5, c15, c25))
    return sig2 * jnp.where(pos, c, 1.0)


def _build_cov_vmem(F, d, off, use_pd, geo_ref, nugT_ref, validT_ref,
                    par_ref, CP):
    """Fill the packed-covariance scratch CP (P, TN) from transposed
    geometry blocks, one row-slab at a time (slab i = packed rows
    [off_i, off_i + F - i) = conditioning pairs (i, j >= i))."""
    sig2 = par_ref[0, 0]
    rho = par_ref[0, 1]
    idxf = par_ref[0, 2]
    for i in range(F):
        L = F - i
        if use_pd:
            dist = geo_ref[off[i]:off[i] + L, :]
        else:
            acc = None
            for dd in range(d):
                base = dd * F
                diff = (geo_ref[base + i:base + F, :]
                        - geo_ref[base + i:base + i + 1, :])
                acc = diff * diff if acc is None else acc + diff * diff
            pos = acc > 0.0
            dist = jnp.where(pos, jnp.sqrt(jnp.where(pos, acc, 1.0)), 0.0)
        cov = _cov_slab(dist, sig2, rho, idxf)
        rows0 = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == 0
        # response-conditioned neighbors' nugget on the diagonal slot (the
        # first row of the slab), then identity-extension of invalid pairs
        cov = cov + jnp.where(rows0, nugT_ref[i:i + 1, :], 0.0)
        vslab = validT_ref[i:F, :] * validT_ref[i:i + 1, :]
        cov = jnp.where(vslab > 0.0, cov,
                        jnp.where(rows0, 1.0, 0.0).astype(cov.dtype))
        CP[off[i]:off[i] + L, :] = cov


def _fused_kernel(F, d, off, use_pd, geo_ref, nugT_ref, validT_ref, par_ref,
                  x_ref, CP, CL, bv, yv, dinv):
    _build_cov_vmem(F, d, off, use_pd, geo_ref, nugT_ref, validT_ref,
                    par_ref, CP)
    rows = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 0)
    bv[:] = jnp.where(rows == 0, 1.0, 0.0).astype(bv.dtype)
    _unpack_factor_forward(F, off, CP, CL, bv, yv, dinv)
    _backward_subst(F, CL, yv, dinv, x_ref)


def _fused_impl(geoT, nugT, validT, par, F, d, use_pd):
    P = F * (F + 1) // 2
    off = _slab_offsets(F)
    TN = _tile_n(F, P + (P if use_pd else d * F) + 2 * F, 4)
    (geoT, nugT, validT), n, nt = _pad_lanes([geoT, nugT, validT], TN)
    G = geoT.shape[0]
    x = pl.pallas_call(
        functools.partial(_fused_kernel, F, d, off, use_pd),
        out_shape=jax.ShapeDtypeStruct((F, nt * TN), nugT.dtype),
        grid=(nt,),
        in_specs=[pl.BlockSpec((G, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((F, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, TN), nugT.dtype),
                        pltpu.VMEM((F, F, TN), nugT.dtype)]
        + [pltpu.VMEM((F, TN), nugT.dtype)] * 3,
        interpret=INTERPRET,
    )(geoT, nugT, validT, par)
    return x[:, :n]


# lanes per backward rebuild chunk (see _make_fused_solver.bwd): bounds the
# (chunk, P) XLA rebuild chains to ~220 MB each at m=40 (the general-nu
# Bessel branch of the rebuild holds ~a dozen such temps at once, and the
# whole grad program must fit beside ~2 GB of arguments in 16 GB HBM)
_BWD_CHUNK = 65536


@functools.lru_cache(maxsize=None)
def _make_fused_solver(F, d, use_pd):
    @jax.custom_vjp
    def solve(covparms, nugT, geoT, validT, aux_geo):
        par = jnp.stack([covparms[0], covparms[1],
                         _nu_idx(covparms[2]).astype(covparms.dtype)]
                        )[None, :]
        return _fused_impl(geoT, nugT, validT, par, F, d, use_pd)

    def fwd(covparms, nugT, geoT, validT, aux_geo):
        x = solve(covparms, nugT, geoT, validT, aux_geo)
        return x, (covparms, nugT, x, validT, aux_geo)

    def bwd(res, xbar):
        covparms, nugT, x, validT, aux_geo = res
        n = x.shape[-1]

        def one_chunk(args):
            nugT_c, x_c, xbar_c, validT_c, aux_c = args

            def rebuild(cp, ng):
                return _rebuild_cp(cp, ng, validT_c, aux_c, F, d, use_pd)

            Cp_c, vjp_fn = jax.vjp(rebuild, covparms, nugT_c)
            dCp = _solve_e0_bwd_impl(Cp_c, x_c, xbar_c, F)
            return vjp_fn(dCp)

        if n <= _BWD_CHUNK:
            dcov, dnug = one_chunk((nugT, x, xbar, validT, aux_geo))
            return dcov, dnug, None, None, None

        # chunk the covariance rebuild + packed backward over lanes: the
        # unchunked rebuild materializes (n, P[, d]) chains — ~25 GB of
        # coordinate-pair diffs at n=1e6/m=40 — which is what OOM'd
        # jax.grad of the north-star likelihood.  Padded lanes carry
        # valid=0 / xbar=0, so their cotangents vanish exactly.
        nc = -(-n // _BWD_CHUNK)
        npad = nc * _BWD_CHUNK

        def padl(a):      # (F/P, n) lane-last
            return jnp.pad(a, ((0, 0), (0, npad - n))) \
                .reshape(a.shape[0], nc, _BWD_CHUNK).swapaxes(0, 1)

        def padr(a):      # (n, ...) row-major
            return jnp.pad(a, ((0, npad - n),) + ((0, 0),) * (a.ndim - 1)) \
                .reshape((nc, _BWD_CHUNK) + a.shape[1:])

        dcovs, dnugs = jax.lax.map(
            one_chunk, (padl(nugT), padl(x), padl(xbar), padl(validT),
                        padr(aux_geo)))
        dnug = dnugs.swapaxes(0, 1).reshape(nugT.shape[0], npad)[:, :n]
        return jnp.sum(dcovs, axis=0), dnug, None, None, None

    solve.defvjp(fwd, bwd)
    return solve


def _rebuild_cp(covparms, nugT, validT, aux_geo, F, d, use_pd):
    """XLA re-derivation of the packed covariance (P, n) for the fused
    kernel's backward pass (identical math to the in-VMEM build)."""
    from .covariance import _safe_dist, matern
    from .u_entries import _packed_index
    iu, ju, _ = _packed_index(F)
    if use_pd:
        dist = aux_geo                      # (n, P) packed distances
    else:
        # (n, F*d) FLAT coordinates, coordinate-major per point: a
        # (n, F, d) residual would be tiled T(8,128) on its trailing
        # (F, d≈2) dims — a 64x pad that alone exceeded HBM at n=1e6 —
        # so the residual stays 2-D and the pair diffs are taken with
        # static lane gathers per coordinate
        pts = aux_geo
        d2 = jnp.zeros(pts.shape[:1] + iu.shape, pts.dtype)
        for c in range(d):
            dc = pts[:, iu * d + c] - pts[:, ju * d + c]
            d2 = d2 + dc * dc
        dist = _safe_dist(d2)
    Cp = matern(dist, covparms)             # (n, P)
    dmask = jnp.asarray(iu == ju)
    Cp = Cp + jnp.where(dmask[None, :], nugT.T[:, iu], 0.0)
    validN = validT.T > 0
    vv = validN[:, iu] & validN[:, ju]
    Cp = jnp.where(vv, Cp, dmask[None, :].astype(Cp.dtype))
    return Cp.T                             # (P, n)


def fused_matern_solve(covparms, nugT, geoT, validT, aux_geo, F, d, use_pd):
    """x = C(theta)^{-1} e0 with the conditioning covariance built in VMEM.

    geoT: (d*F, n) transposed neighbor coordinates (use_pd=False) or (P, n)
    transposed packed distances (use_pd=True) — parameter-free, cached.
    aux_geo: the same geometry in row-major orientation for the backward
    rebuild ((n, F, d) points or (n, P) distances).  nugT: (F, n) masked
    response-conditioned neighbor nuggets.  validT: (F, n) 0/1 mask.
    covparms: (>=3,) [sig2, rho, nu] with nu a closed form (the caller
    dispatches general nu to the XLA path).  Differentiable in covparms and
    nugT; the VJP rebuilds the packed covariance in XLA and reuses the
    packed backward kernel.
    """
    return _make_fused_solver(F, d, use_pd)(covparms, nugT, geoT, validT,
                                            aux_geo)


def _nu_idx(nu):
    return jnp.where(nu == 0.5, 0, jnp.where(nu == 1.5, 1,
                     jnp.where(nu == 2.5, 2, 3)))
