"""Pallas TPU kernel: batched frontal Cholesky factorization.

Factors a level's fronts  front = [[A_pp, *], [A_bp, A_bb]]  into
L_pp = chol(A_pp) and L_bp = A_bp L_pp^{-T}, one front per grid step, fully
VMEM-resident.  XLA's batched `cholesky`/`triangular_solve` lower these
shapes (batch 256-2048, P 100-450) to While loops over narrow panels at
~0.1 TF/s — the leaf level of the n=1e6/m=40 multifrontal factor alone cost
420 ms.  This kernel runs the classic left-looking panel algorithm per
node:

  for each TB-wide column panel [kb, ke):
    apan  = front[:, kb:ke]                                  (F, TB)
    apan -= L[:, :kb] @ L_pp[kb:ke, :kb]^T                   (MXU GEMM)
    unrolled rank-1 sweep over the panel's columns: at step j the pivot row
    r = kb + j supplies the scaled row factor (a LANE-major (1, W-j) read —
    symmetry of the tile block keeps row r equal to the mirrored column, so
    no per-step transposes), and the outer-product update touches only the
    remaining panel columns (triangular: half the flops);
    write the finished L columns back in one masked block store.

L_bp rows ride the same panel sweep (rows P..F of apan), so the separate
batched TRSM disappears.  The Schur update  upd = A_bb - L_bp L_bp^T  stays
in XLA (a single well-shaped MXU einsum).

The custom VJP is closed-form XLA math on the saved outputs (no Pallas in
the backward):  with G = dL_bp cotangent,
  dA_bp = G L_pp^{-1}
  dL_pp += -L_pp^{-T} G^T L_bp          (from L_bp = A_bp L_pp^{-T})
  dA_pp  = chol_vjp(L_pp, dL_pp)        (standard Phi-formula)

Replaces the role of LAPACK dpotrf/dtrsm inside the reference's sparse
factorization (/root/reference/R/vecchia_prediction.R:74-84 delegating to
Matrix::chol) with MXU-shaped batched compute.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["factor_fronts", "fits_vmem"]

INTERPRET = False

_TB = 128
_PREC = jax.lax.Precision.HIGHEST
_VMEM_BUDGET = 14 * 2 ** 20


def fits_vmem(F, P, itemsize=4):
    """Whether one front + factor outputs + the scratches fit the budget."""
    B = F - P
    need = (F * F + P * P + B * P + (P + 16) * F + 2 * _TB * F) * itemsize
    return need <= _VMEM_BUDGET


def _mm(a, b, ta=False, tb=False):
    la = ((0,) if ta else (1,))
    lb = ((1,) if tb else (0,))
    return jax.lax.dot_general(a, b, ((la, lb), ((), ())),
                               preferred_element_type=jnp.float32)


_MW = 32      # micro-panel width (columns factored per sequential group)


def _dot(a, b, da, db):
    # batched over leading dims; HIGHEST precision (bf16x3) — default MXU
    # precision rounds f32 operands to bf16 (~1e-3 error in the factor)
    nb = a.ndim - 2
    bd = tuple(range(nb))
    return jax.lax.dot_general(
        a, b, (((da + nb,), (db + nb,)), (bd, bd)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _sweep(slab, C, T, LT, r0, lanes):
    """Factor _MW columns r0.. of the front from their symmetric row-slabs
    (GB, _MW, F), writing finished scaled L columns as rows of LT.

    T is the (GB, _MW, _MW) tile of the slab at the micro's own lanes and C
    the remaining panel rows' values there (GB, TB, _MW); the rank-1
    recurrence runs on both in parallel with the slab, so every per-step
    quantity (pivot, pivot column, tile row) is a STATIC slice of T — no
    per-step dots or one-hot reductions.  All ops carry the GB node-batch
    dim, so the sequential chain's latency amortizes across nodes.
    Returns (Lm rows, solved coupling CL)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, _MW, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _MW), 2)
    out = []
    cl = []
    for j in range(_MW):
        r = r0 + j
        di = jax.lax.rsqrt(T[:, j:j + 1, j:j + 1])                # (GB,1,1)
        row = jnp.where(lanes >= r, slab[:, j:j + 1, :] * di, 0.0)
        LT[:, pl.ds(r, 1), :] = row                               # (GB,1,F)
        out.append(row)
        rtile = T[:, j:j + 1, :] * di                             # (GB,1,_MW)
        pmask = jnp.where(rows > j, T[:, :, j:j + 1] * di, 0.0)   # (GB,_MW,1)
        slab = slab - pmask * row
        T = T - pmask * rtile
        cj = C[:, :, j:j + 1] * di                                # (GB,TB,1)
        cl.append(cj)
        C = C - jnp.where(cols > j, cj * rtile, 0.0)
    return (jnp.concatenate(out, axis=1),                         # (GB,_MW,F)
            jnp.concatenate(cl, axis=2))                          # (GB,TB,_MW)


def _factor_kernel(F, P, GB, front_ref, lpp_ref, lbp_ref, LT, PS):
    """Two-level blocked Cholesky on GB fronts per grid step.

    LT: (GB, P + _MW, F) transposed factor scratch (row k = column k of L
    over all F rows; the _MW pad rows absorb partial-micro junk).  PS:
    (GB, 2 * _TB, F) panel slab scratch (the second _TB rows absorb
    overflow writes from the dynamic-start rank-_MW updates).

    Outer loop: static _TB-wide panels; the correction against previous
    panels is one MXU GEMM with static slices.  Inner loop: fori over
    _MW-wide micros; each factors its rows (the sequential rank-1 sweep is
    the only inherently serial part) and applies a rank-_MW MXU update to
    the remaining panel rows.
    """
    B = F - P
    LT[...] = jnp.zeros_like(LT)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, F), 2)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (F, _MW), 0)
    off = jax.lax.broadcasted_iota(jnp.int32, (F, _MW), 1)

    for kb in range(0, P, _TB):
        ke = min(kb + _TB, P)
        W = ke - kb
        pan = front_ref[:, kb:ke, :]                              # (GB,W,F)
        if kb > 0:
            pan = pan - _dot(LT[:, 0:kb, kb:ke], LT[:, 0:kb, :], 0, 0)
        PS[:, 0:W, :] = pan

        def micro(m, _, kb=kb):
            l0 = m * _MW
            sl = PS[:, pl.ds(l0, _MW), :]                         # (GB,_MW,F)
            oh = (lane_f == kb + l0 + off).astype(sl.dtype)       # (F,_MW)
            ohb = jnp.broadcast_to(oh[None], (GB, F, _MW))
            rem = PS[:, pl.ds(l0 + _MW, _TB), :]                  # (GB,_TB,F)
            C = _dot(rem, ohb, 1, 0)                              # (GB,_TB,_MW)
            T = _dot(sl, ohb, 1, 0)                               # (GB,_MW,_MW)
            Lm, CL = _sweep(sl, C, T, LT, kb + l0, lanes)
            # rank-_MW update of the remaining panel rows (overflow rows
            # land in the PS pad region and are never read)
            PS[:, pl.ds(l0 + _MW, _TB), :] = rem - _dot(CL, Lm, 1, 0)
            return 0

        jax.lax.fori_loop(0, -(-W // _MW), micro, 0)

    lpp_ref[...] = jnp.swapaxes(LT[:, 0:P, 0:P], 1, 2)
    if B > 0:
        lbp_ref[...] = jnp.swapaxes(LT[:, 0:P, P:F], 1, 2)


def _node_batch(F, P, N, itemsize=4):
    """Nodes per grid step: amortize the sequential sweep's op-issue latency
    across independent fronts, as many as fit VMEM.  The model counts the
    double-buffered in/out blocks plus scratches and live panel values, with
    headroom under the 40 MB scoped limit (exceeding it is a compile error,
    not a slowdown)."""
    B = F - P
    per = (2 * F * F + 2 * (P * P + B * P) + (P + _MW) * F
           + 4 * _TB * F) * itemsize
    gb = max(1, (23 * 2 ** 20) // per)
    while N % gb:
        gb -= 1
    return gb


def _factor_impl(front, P):
    N, F, _ = front.shape
    B = F - P
    dt = front.dtype
    GB = _node_batch(F, P, N)
    outs = [jax.ShapeDtypeStruct((N, P, P), dt)]
    out_specs = [pl.BlockSpec((GB, P, P), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if B > 0:
        outs.append(jax.ShapeDtypeStruct((N, B, P), dt))
        out_specs.append(pl.BlockSpec((GB, B, P), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    def kern(front_ref, lpp_ref, *rest):
        if B > 0:
            lbp_ref, LT, PS = rest
        else:
            (LT, PS) = rest
            lbp_ref = None
        _factor_kernel(F, P, GB, front_ref, lpp_ref, lbp_ref, LT, PS)

    res = pl.pallas_call(
        kern,
        out_shape=tuple(outs),
        grid=(N // GB,),
        in_specs=[pl.BlockSpec((GB, F, F), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((GB, P + _MW, F), dt),
                        pltpu.VMEM((GB, 2 * _TB, F), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 2 ** 20),
        interpret=INTERPRET,
    )(front)
    if B > 0:
        return res[0], res[1]
    return res[0], jnp.zeros((N, 0, P), dt)


def _tril_half(M):
    """Phi(M): lower triangle with the diagonal halved."""
    t = jnp.tril(M)
    d = jnp.diagonal(M, axis1=-2, axis2=-1)
    return t - 0.5 * d[..., None] * jnp.eye(M.shape[-1], dtype=M.dtype)


def _chol_vjp(L, Lbar):
    """dA for L = chol(A) given dL, using only the saved factor."""
    M = jnp.einsum("nij,nik->njk", L, Lbar, precision=_PREC)   # L^T Lbar
    Phi = _tril_half(M)
    S = Phi + jnp.swapaxes(Phi, -1, -2)
    # dA = 0.5 L^{-T} S L^{-1}  (S = Phi + Phi^T already symmetric)
    X = jax.lax.linalg.triangular_solve(L, S, left_side=True, lower=True,
                                        transpose_a=True)
    dA = jax.lax.linalg.triangular_solve(L, X, left_side=False, lower=True,
                                         transpose_a=False)
    return 0.25 * (dA + jnp.swapaxes(dA, -1, -2))


@functools.lru_cache(maxsize=None)
def _make_factor(P):
    @jax.custom_vjp
    def factor(front):
        return _factor_impl(front, P)

    def fwd(front):
        L_pp, L_bp = _factor_impl(front, P)
        return (L_pp, L_bp), (L_pp, L_bp, front.shape)

    def bwd(res, cts):
        L_pp, L_bp, shape = res
        dL_pp, dL_bp = cts
        N, F, _ = shape
        B = F - P
        dt = L_pp.dtype
        dfront = jnp.zeros((N, F, F), dt)
        G = dL_bp
        if B > 0:
            # dA_bp = G L_pp^{-1}; dL_pp += -L_pp^{-T} G^T L_bp
            dA_bp = jax.lax.linalg.triangular_solve(
                L_pp, G, left_side=False, lower=True, transpose_a=False)
            GtLbp = jnp.einsum("nbp,nbq->npq", G, L_bp, precision=_PREC)
            corr = jax.lax.linalg.triangular_solve(
                L_pp, GtLbp, left_side=True, lower=True, transpose_a=True)
            dL_pp = dL_pp - corr
            dfront = dfront.at[:, P:, :P].set(dA_bp)
        dA_pp = _chol_vjp(L_pp, jnp.tril(dL_pp))
        dfront = dfront.at[:, :P, :P].set(dA_pp)
        return (dfront,)

    factor.defvjp(fwd, bwd)
    return factor


def factor_fronts(front, P):
    """(L_pp, L_bp) = (chol(front[:, :P, :P]), front[:, P:, :P] L_pp^{-T}).

    front: (N, F, F) symmetric-in-the-read-parts batch.  Differentiable via
    a closed-form XLA VJP on the saved factors.  The caller computes the
    Schur complement  upd = front[:, P:, P:] - L_bp L_bp^T  (XLA einsum).
    """
    return _make_factor(P)(front)
