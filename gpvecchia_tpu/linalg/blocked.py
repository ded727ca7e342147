"""Batched blocked dense Cholesky / triangular solves (TPU-first).

XLA:TPU lowers ``jax.lax.linalg.cholesky``/``triangular_solve`` on batches of
small matrices poorly (the (n, F, F) layout pads minor dims to hardware tiles
and serializes); these routines instead express everything above a tiny
unrolled base case as batched GEMMs (MXU work) via 2x2 block recursion:

    chol:  L11 = chol(A11); L21 = A21 L11^{-T}; L22 = chol(A22 - L21 L21^T)
    trsm:  forward / backward block substitution with GEMM updates

The base case unrolls Cholesky-Banachiewicz over scalar positions of the
small matrix; every op there is a full (batch,)-vector op.  All routines are
pure jnp (differentiable, identical on CPU/TPU).

Replaces the role of LAPACK chol/solve inside the reference's hot loops
(/root/reference/src/U_NZentries.cpp:60-63 and the Matrix-package sparse
cholesky at /root/reference/R/vecchia_prediction.R:74-84) with MXU-shaped
dense block compute.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["chol", "trsm_right", "trsm_rightT", "lower_solve_vec",
           "upper_solve_vec", "tri_inv_lower"]

_BASE = 16
# Measured on TPU (axon, f32): XLA's native cholesky/triangular_solve match
# the blocked GEMM recursion below at EVERY (batch, size) combination the
# multifrontal tree produces (0.02-0.04 ms from (2048,32) to (2,383+)), and
# compile 5-25x faster (While loops vs unrolled HLO).  So the native path is
# the default; the recursion is kept for experimentation (set _NATIVE_MIN
# high to re-enable it).
_NATIVE_MIN = 0
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b, ta=False, tb=False):
    """Batched matmul on the last two dims with explicit precision."""
    l0 = "pm" if ta else "mp"
    l1 = "qp" if tb else "pq"
    return jnp.einsum(f"...{l0},...{l1}->...mq", a, b, precision=_PREC)


def _split(P):
    """Split size for the 2x2 recursion, aligned to the base size."""
    h = (P + 1) // 2
    r = -(-h // _BASE) * _BASE
    return r if r < P else h


def _chol_unrolled(A):
    """Cholesky-Banachiewicz over scalar positions; A (..., P, P) SPD."""
    P = A.shape[-1]
    cols = []
    for j in range(P):
        s = A[..., :, j]
        for k in range(j):
            s = s - cols[k] * cols[k][..., j:j + 1]
        d = jax.lax.rsqrt(s[..., j:j + 1])
        mask = (np.arange(P) >= j)
        cols.append(jnp.where(mask, s * d, 0.0))
    return jnp.stack(cols, axis=-1)


def chol(A):
    """Lower Cholesky factor of batched SPD A (..., P, P).

    Non-SPD inputs yield NaNs in the affected columns (no clamping) so
    failures surface rather than silently corrupting results.
    """
    P = A.shape[-1]
    if P == 0:
        return A
    if _NATIVE_MIN > 0 and P <= _BASE:
        return _chol_unrolled(A)
    if P > _NATIVE_MIN:
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.cholesky(A)
    h = _split(P)
    A11 = A[..., :h, :h]
    A21 = A[..., h:, :h]
    A22 = A[..., h:, h:]
    L11 = chol(A11)
    L21 = trsm_right(A21, L11)
    L22 = chol(A22 - _mm(L21, L21, tb=True))
    top = jnp.concatenate(
        [L11, jnp.zeros(A.shape[:-2] + (h, P - h), A.dtype)], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _trsm_right_unrolled(B, L):
    """X L^T = B by forward substitution over columns; B (..., M, P)."""
    P = L.shape[-1]
    xs = []
    for j in range(P):
        s = B[..., :, j]
        for k in range(j):
            s = s - xs[k] * L[..., j, k][..., None]
        xs.append(s / L[..., j, j][..., None])
    return jnp.stack(xs, axis=-1)


def trsm_right(B, L):
    """Solve X L^T = B for X, i.e. X = B L^{-T}; L lower (..., P, P)."""
    P = L.shape[-1]
    if P == 0 or B.shape[-2] == 0:
        return B
    if _NATIVE_MIN > 0 and P <= _BASE:
        return _trsm_right_unrolled(B, L)
    if P > _NATIVE_MIN:
        with jax.default_matmul_precision("highest"):
            return jax.lax.linalg.triangular_solve(
                L, B, left_side=False, lower=True, transpose_a=True)
    h = _split(P)
    L11 = L[..., :h, :h]
    L21 = L[..., h:, :h]
    L22 = L[..., h:, h:]
    X1 = trsm_right(B[..., :, :h], L11)
    X2 = trsm_right(B[..., :, h:] - _mm(X1, L21, tb=True), L22)
    return jnp.concatenate([X1, X2], axis=-1)


def _trsm_rightT_unrolled(B, L):
    """X L = B by backward substitution over columns; L lower."""
    P = L.shape[-1]
    xs = [None] * P
    for j in range(P - 1, -1, -1):
        s = B[..., :, j]
        for k in range(j + 1, P):
            s = s - xs[k] * L[..., k, j][..., None]
        xs[j] = s / L[..., j, j][..., None]
    return jnp.stack(xs, axis=-1)


def trsm_rightT(B, L):
    """Solve X L = B for X, i.e. X = B L^{-1}; L lower (..., P, P)."""
    P = L.shape[-1]
    if P == 0 or B.shape[-2] == 0:
        return B
    if _NATIVE_MIN > 0 and P <= _BASE:
        return _trsm_rightT_unrolled(B, L)
    if P > _NATIVE_MIN:
        with jax.default_matmul_precision("highest"):
            return jax.lax.linalg.triangular_solve(
                L, B, left_side=False, lower=True, transpose_a=False)
    h = _split(P)
    L11 = L[..., :h, :h]
    L21 = L[..., h:, :h]
    L22 = L[..., h:, h:]
    X2 = trsm_rightT(B[..., :, h:], L22)
    X1 = trsm_rightT(B[..., :, :h] - _mm(X2, L21), L11)
    return jnp.concatenate([X1, X2], axis=-1)


def lower_solve_vec(L, b):
    """Solve L y = b; b (..., P)."""
    return trsm_right(b[..., None, :], L)[..., 0, :]


def upper_solve_vec(L, b):
    """Solve L^T x = b; b (..., P)."""
    return trsm_rightT(b[..., None, :], L)[..., 0, :]


def tri_inv_lower(L):
    """L^{-1} for batched lower-triangular L (..., P, P)."""
    P = L.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(P, dtype=L.dtype), L.shape)
    # Z L = I  =>  Z = L^{-1}
    return trsm_rightT(eye, L)
