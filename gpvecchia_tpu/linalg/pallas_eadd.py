"""Pallas TPU kernel: fused multifrontal extend-add.

Gathers the two children's Schur updates into parent fronts:

    front[n] = sum_s G_{n,s} upd[n,s] G_{n,s}^T

where G_{n,s} (F, Bc) is the 0/1 selection matrix encoded by the planner's
ext map (parent-front position -> child border position, -1 = absent).  The
XLA formulation (row gather, transpose, row gather again with masks) ran at
~13% of HBM bandwidth (~65-128 ms per level at n=1e6/m=40); here the
selection matrix is built on the fly in VMEM from the ext map and the
gather becomes two MXU matmuls per child, at full HIGHEST precision (the
values are f32; Mosaic rejects per-operand dot precision, so the one-hot
operand — which would be exact even in bf16 — pays the x3 split too.  If
per-operand precision lands, splitting only the value side would cut the
matmul cost ~3x and move eadd_fits_vmem's crossover upward).

The custom VJP is the same sandwich transposed,
    dupd[n,s] = G_{n,s}^T dfront[n] G_{n,s},
expressed with swapped contraction dims (no explicit transposes).

Replaces the assembly half of the reference's sequential sparse Cholesky
(/root/reference/src/ic0.cpp:43-64 dot products walking CSR rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["eadd_fronts", "eadd_fits_vmem"]

INTERPRET = False

_VMEM_BUDGET = 14 * 2 ** 20
# Mosaic rejects per-operand dot precision; HIGHEST keeps the gathered f32
# values exact (the one-hot side would be exact even in bf16)
_APREC = jax.lax.Precision.HIGHEST
_APREC_R = jax.lax.Precision.HIGHEST


def eadd_fits_vmem(F, Bc, itemsize=4):
    """Use the Pallas kernel where it measured faster than the XLA
    gather-transpose-gather: per-node buffers must fit VMEM comfortably
    (measured crossover ~Bc 520/F 900 on v5e; above that the one-hot
    sandwich's x3-precision matmuls lose to the gathers)."""
    need = (Bc * Bc + F * F + 2 * F * Bc) * itemsize
    return need <= 8 * 2 ** 20 and Bc <= 520


def _onehot(ext_row, F, Bc, dt):
    """(F, Bc) selection matrix from one ext row (F,), -1 entries -> 0."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (F, Bc), 1)
    return (ext_row[:, None] == cols).astype(dt)


def _sel_ext(ext_ref, s):
    """Select child s's ext row from the (1, 2, F) block (block shapes with
    a singleton sublane dim are not lowerable, so both rows ride along)."""
    rows = ext_ref[0]                                            # (2, F)
    return jnp.where(s == 0, rows[0:1, :], rows[1:2, :])[0]


def _fwd_kernel(F, Bc, ext_ref, upd_ref, out_ref):
    s = pl.program_id(1)
    oh = _onehot(_sel_ext(ext_ref, s), F, Bc, out_ref.dtype)
    t = jax.lax.dot_general(oh, upd_ref[0, 0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_APREC)                    # (F, Bc)
    contrib = jax.lax.dot_general(t, oh, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=_APREC_R)            # (F, F)

    @pl.when(s == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(s != 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


def _bwd_kernel(F, Bc, ext_ref, dfront_ref, dupd_ref):
    s = pl.program_id(1)
    oh = _onehot(_sel_ext(ext_ref, s), F, Bc, dfront_ref.dtype)
    t = jax.lax.dot_general(oh, dfront_ref[0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_APREC)                    # (Bc, F)
    dupd_ref[0, 0] = jax.lax.dot_general(
        t, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_APREC_R)  # (Bc, Bc)


def _eadd_fwd_impl(upd2, ext, F):
    N, _, Bc, _ = upd2.shape
    dt = upd2.dtype
    return pl.pallas_call(
        functools.partial(_fwd_kernel, F, Bc),
        out_shape=jax.ShapeDtypeStruct((N, F, F), dt),
        grid=(N, 2),
        in_specs=[pl.BlockSpec((1, 2, F), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, Bc, Bc), lambda i, s: (i, s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, F, F), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET * 4),
        interpret=INTERPRET,
    )(ext, upd2)


def _eadd_bwd_impl(dfront, ext, Bc):
    N, F, _ = dfront.shape
    dt = dfront.dtype
    return pl.pallas_call(
        functools.partial(_bwd_kernel, F, Bc),
        out_shape=jax.ShapeDtypeStruct((N, 2, Bc, Bc), dt),
        grid=(N, 2),
        in_specs=[pl.BlockSpec((1, 2, F), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, F, F), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, Bc, Bc), lambda i, s: (i, s, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET * 4),
        interpret=INTERPRET,
    )(ext, dfront)


@functools.lru_cache(maxsize=None)
def _make_eadd(F):
    @jax.custom_vjp
    def eadd(upd2, ext):
        return _eadd_fwd_impl(upd2, ext, F)

    def fwd(upd2, ext):
        return _eadd_fwd_impl(upd2, ext, F), (ext, upd2.shape[2])

    def bwd(res, dfront):
        ext, Bc = res
        return _eadd_bwd_impl(dfront, ext, Bc), None

    eadd.defvjp(fwd, bwd)
    return eadd


def eadd_fronts(upd2, ext, F):
    """Extend-add children's Schur updates into parent fronts.

    upd2: (N, 2, Bc, Bc); ext: (N, 2, F) int32 parent-pos -> child-border
    position maps (-1 = absent).  Returns (N, F, F).  Differentiable in
    upd2 (ext is an index plan).
    """
    return _make_eadd(F)(upd2, ext)
