"""Micro-bench: extend-add and big-front factor variants at mid-tree shapes.

The n=1e6/m=40 tree's internal levels (d<=8) fall back to XLA for both the
extend-add (two row gathers + transpose, measured ~13% of HBM BW) and the
factor (native cholesky/triangular_solve While loops).  This compares
reformulations head-to-head on representative shapes so the winner can be
wired into linalg/multifrontal.py.

Run on TPU.  Env: REPS (5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPS = int(os.environ.get("REPS", 5))
_PREC = jax.lax.Precision.HIGHEST


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
    print(f"  {name:28s} compile {t1-t0:6.1f}s  per-run {ms:8.2f} ms",
          flush=True)
    return ms


# ---------------------------------------------------------------- eadd ----
def eadd_current(upd, ext, F):
    """Round-4 XLA path: masked row gather, transpose, masked row gather."""
    N = ext.shape[0]
    Bc = upd.shape[-1]
    updr = upd.reshape(N, 2, Bc, Bc)
    front = jnp.zeros((N, F, F), upd.dtype)
    ar = jnp.arange(N)[:, None]
    for s in (0, 1):
        g = ext[:, s, :]
        ok = g >= 0
        gc = jnp.clip(g, 0)
        rows = updr[:, s][ar, gc]
        rows = jnp.where(ok[:, :, None], rows, 0.0)
        rows_t = jnp.swapaxes(rows, 1, 2)
        sub = rows_t[ar, gc]
        front = front + jnp.where(ok[:, :, None], sub, 0.0)
    return front


def eadd_zeropad(upd_pad, ext2, F):
    """Zero-row padded child updates: no masks anywhere.

    upd_pad: (N, 2, Bc+8, Bc) with rows Bc.. zero; ext2 has -1 -> Bc."""
    N = ext2.shape[0]
    Bcp = upd_pad.shape[-2]
    Bc = upd_pad.shape[-1]
    ar = jnp.arange(N)[:, None]
    front = None
    for s in (0, 1):
        g = ext2[:, s, :]
        rows = upd_pad[:, s][ar, g]                 # (N, F, Bc)
        rows_t = jnp.swapaxes(rows, 1, 2)           # (N, Bc, F)
        rows_t = jnp.concatenate(
            [rows_t, jnp.zeros((N, Bcp - Bc, F), rows_t.dtype)], axis=1)
        sub = rows_t[ar, g]                         # (N, F, F)
        front = sub if front is None else front + sub
    return front


def eadd_flat(upd_pad, flat_idx, F):
    """Single flat axis-0 row gather for both children, then transpose+gather.

    upd_pad: (N*2*(Bc+8), Bc) flat rows; flat_idx: (N, 2, F) into that."""
    Bc = upd_pad.shape[-1]
    N = flat_idx.shape[0]
    rows = upd_pad[flat_idx.reshape(-1)].reshape(N, 2, F, Bc)
    rows_sum_t = jnp.swapaxes(rows, 2, 3)           # (N, 2, Bc, F)
    # second gather must stay per-child: pad lane dim then flat gather again
    rt = jnp.concatenate(
        [rows_sum_t, jnp.zeros((N, 2, 8, F), rows.dtype)], axis=2)
    rt_flat = rt.reshape(N * 2 * (Bc + 8), F)
    sub = rt_flat[flat_idx.reshape(-1)].reshape(N, 2, F, F)
    return sub[:, 0] + sub[:, 1]


def run_eadd(N, Bc, F, seed=0):
    print(f"eadd shape N={N} Bc={Bc} F={F}")
    rng = np.random.default_rng(seed)
    upd = rng.normal(size=(2 * N, Bc, Bc)).astype(np.float32)
    upd = upd + np.swapaxes(upd, 1, 2)
    # synthetic ext: random increasing subsets (realistic density ~ Bc/F)
    ext = np.full((N, 2, F), -1, np.int32)
    for i in range(N):
        for s in (0, 1):
            pos = np.sort(rng.choice(F, size=Bc, replace=False))
            ext[i, s, pos] = np.arange(Bc)
    if N * Bc * Bc * 8 < 200_000_000:
        # small shapes: correctness check vs the current path
        updj = jnp.asarray(upd)
        extj = jnp.asarray(ext)
        _, tiled_out = run_eadd_tiled(N, Bc, F, ext, upd, time_it=False)
        diff = jax.jit(lambda u, e, t: jnp.max(jnp.abs(
            eadd_current(u, e, F) - t)))(updj, extj, tiled_out)
        print(f"  max|tiled-cur|={float(diff):.2e}")
        del updj, extj, tiled_out
        return
    run_eadd_tiled(N, Bc, F, ext, upd)
    bw = N * (2 * 2 * Bc * Bc + 3 * F * F) * 4 / 819e9 * 1e3
    print(f"  (BW-bound est ~{bw:.1f} ms)")


_TE = 256     # eadd tile


_PAD = 8      # sublane pad of the gathered-from arrays


def _tiled_plan(ext, Bc):
    """Host precompute: (row_start (N,2,T), rel (N,2,T,TE)) panel maps.

    Exploits monotone bijectivity of ext (child borders land in the parent
    front in sorted elimination order): the valid entries of a TE-row panel
    map to a CONTIGUOUS child row range of size <= TE.  Starts are clamped
    to Bc+_PAD-TE so a fixed _PAD-row zero pad suffices (rel stays in
    [0, TE) because child indices never reach Bc+_PAD).
    """
    N, _, F = ext.shape
    T = -(-F // _TE)
    Fp = T * _TE
    extp = np.full((N, 2, Fp), -1, ext.dtype)
    extp[:, :, :F] = ext
    e = extp.reshape(N, 2, T, _TE)
    valid = e >= 0
    big = np.where(valid, e, np.iinfo(np.int32).max)
    row_start = np.where(valid.any(-1), big.min(-1), 0)
    row_start = np.minimum(row_start,
                           max(Bc + _PAD - _TE, 0)).astype(np.int32)
    rel = np.where(valid, e - row_start[..., None], -1).astype(np.int32)
    assert rel.max() < _TE, "panel child range exceeded TE (non-monotone ext?)"
    return row_start, rel, T, Fp


def run_eadd_tiled(N, Bc, F, ext, upd, time_it=True):
    row_start, rel, T, Fp = _tiled_plan(ext, Bc)
    dt = np.float32
    # pass-1 indices: (N*2*T, 2) = (flat child id, row start)
    ns = np.repeat(np.arange(N * 2), T)
    idx1 = np.stack([ns, row_start.reshape(-1)], axis=1).astype(np.int32)
    # pass-2 indices: for (n, t, s): (n, s*(Bc+_PAD)+start)
    nn = np.repeat(np.arange(N), T * 2)
    ss = np.tile(np.arange(2), N * T)
    st2 = np.transpose(row_start, (0, 2, 1)).reshape(-1)     # (N*T*2,)
    idx2 = np.stack([nn, ss * (Bc + _PAD) + st2], axis=1).astype(np.int32)
    rel_t = np.transpose(rel, (0, 2, 1, 3))                  # (N, T, 2, TE)

    updp = np.zeros((N * 2, Bc + _PAD, Bc), dt)
    updp[:, :Bc] = upd.reshape(N * 2, Bc, Bc)

    updj = jnp.asarray(updp)
    idx1j = jnp.asarray(idx1)
    idx2j = jnp.asarray(idx2)
    rel1j = jnp.asarray(rel.reshape(-1, _TE))
    rel2j = jnp.asarray(rel_t)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1))

    def run(updp, idx1, rel1, idx2, rel2):
        blocks = jax.lax.gather(updp, idx1, dnums, (1, _TE, Bc),
                                mode="clip")
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _TE), 2)
        oh1 = (rel1[:, :, None] == iota).astype(dt)
        rexp = jax.lax.dot_general(oh1, blocks, (((2,), (1,)), ((0,), (0,))),
                                   precision=_PREC)
        rexp = rexp.reshape(N, 2, Fp, Bc)
        rexpT = jnp.swapaxes(rexp, -1, -2)
        rexpT = jnp.pad(rexpT, ((0, 0), (0, 0), (0, _PAD), (0, 0)))
        rexpT = rexpT.reshape(N, 2 * (Bc + _PAD), Fp)
        blocks2 = jax.lax.gather(rexpT, idx2, dnums, (1, _TE, Fp),
                                 mode="clip")
        blocks2 = blocks2.reshape(-1, 2 * _TE, Fp)           # (NT, 2TE, Fp)
        r2 = rel2.reshape(-1, 2, _TE)                        # (NT, 2, TE)
        iv = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _TE), 2)
        oh2a = (r2[:, 0][:, :, None] == iv).astype(dt)       # (NT, TE, TE)
        oh2b = (r2[:, 1][:, :, None] == iv).astype(dt)
        oh2 = jnp.concatenate([oh2a, oh2b], axis=-1)         # (NT, TE, 2TE)
        out = jax.lax.dot_general(oh2, blocks2,
                                  (((2,), (1,)), ((0,), (0,))),
                                  precision=_PREC)           # (NT, TE, Fp)
        return out.reshape(N, Fp, Fp)[:, :F, :F]

    if time_it:
        timed("tiled-monotone", jax.jit(run), updj, idx1j, rel1j, idx2j,
              rel2j)
    out = jax.jit(run)(updj, idx1j, rel1j, idx2j, rel2j)
    return None, out


# -------------------------------------------------------------- factor ----
def fac_current(fr, P):
    from gpvecchia_tpu.linalg.blocked import chol, trsm_right
    L_pp = chol(fr[:, :P, :P])
    L_bp = trsm_right(fr[:, P:, :P], L_pp)
    upd = fr[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", L_bp, L_bp,
                                     precision=_PREC)
    return L_pp, L_bp, upd


def _chol_panels(A, TB):
    """Blocked left-looking Cholesky + explicit inverse: returns (L, Linv).

    Only the TB-sized diagonal blocks use XLA's native cholesky; panel
    corrections and the triangular inverse are GEMMs (MXU), so nothing
    serial scales with P.
    """
    N, P, _ = A.shape
    dt = A.dtype
    L = jnp.zeros((N, P, P), dt)
    Li = jnp.zeros((N, P, P), dt)   # L^{-1}
    for k0 in range(0, P, TB):
        W = min(TB, P - k0)
        pan = A[:, k0:, k0:k0 + W]
        if k0 > 0:
            pan = pan - jnp.einsum(
                "nik,njk->nij", L[:, k0:, :k0], L[:, k0:k0 + W, :k0],
                precision=_PREC)
        from gpvecchia_tpu.linalg.blocked import chol, trsm_right
        Ld = chol(pan[:, :W])
        Ldi = jax.lax.linalg.triangular_solve(
            Ld, jnp.broadcast_to(jnp.eye(W, dtype=dt), (N, W, W)),
            left_side=True, lower=True)
        sub = jnp.einsum("nik,njk->nij", pan[:, W:], Ldi,
                         precision=_PREC)            # (N, P-k0-W, W)
        col = jnp.concatenate([Ld, sub], axis=1)
        L = jax.lax.dynamic_update_slice(L, col, (0, k0, k0))
        # L^{-1} block column: -Ldi_acc = Ldi @ ... build incrementally:
        # Li[k0:k0+W, :k0+W] = [-Ldi @ sub_prev..., Ldi]
        if k0 > 0:
            corr = -jnp.einsum("nik,nkj->nij", Ldi, jnp.einsum(
                "nik,nkj->nij", L[:, k0:k0 + W, :k0], Li[:, :k0, :k0],
                precision=_PREC), precision=_PREC)
            Li = jax.lax.dynamic_update_slice(Li, corr, (0, k0, 0))
        Li = jax.lax.dynamic_update_slice(Li, Ldi, (0, k0, k0))
    return L, Li


def fac_gemm(fr, P, TB=256):
    """Panelized factor: GEMM everywhere, tiny XLA chol on diagonal blocks;
    L_bp via one GEMM with the explicit L_pp^{-1}."""
    L_pp, Li = _chol_panels(fr[:, :P, :P], TB)
    L_bp = jnp.einsum("nbp,nqp->nbq", fr[:, P:, :P], Li, precision=_PREC)
    upd = fr[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", L_bp, L_bp,
                                     precision=_PREC)
    return L_pp, L_bp, upd


def fac_panels(fr, P, B, TB=256, pallas_diag=True):
    """Panel blocked factor: per-panel GEMM correction, diagonal block via
    Pallas factor_fronts (or XLA chol), explicit diag-block inverse so the
    column solve is a GEMM; L_bp rides the same panels."""
    from gpvecchia_tpu.linalg.blocked import chol
    from gpvecchia_tpu.linalg.pallas_frontal import factor_fronts
    N = fr.shape[0]
    dt = fr.dtype
    L = jnp.zeros((N, P, P), dt)
    X = jnp.zeros((N, B, P), dt)
    Abp = fr[:, P:, :P]
    for k0 in range(0, P, TB):
        W = min(TB, P - k0)
        pan = fr[:, k0:P, k0:k0 + W]
        if k0 > 0:
            pan = pan - jnp.einsum("nik,njk->nij", L[:, k0:, :k0],
                                   L[:, k0:k0 + W, :k0], precision=_PREC)
        if pallas_diag and jax.default_backend() == "tpu":
            Ld, _ = factor_fronts(pan[:, :W], W)
        else:
            Ld = chol(pan[:, :W])
        Ldi = jax.lax.linalg.triangular_solve(
            Ld, jnp.broadcast_to(jnp.eye(W, dtype=dt), (N, W, W)),
            left_side=True, lower=True)
        col = jnp.concatenate(
            [Ld, jnp.einsum("nik,njk->nij", pan[:, W:], Ldi,
                            precision=_PREC)], axis=1)
        L = jax.lax.dynamic_update_slice(L, col, (0, k0, k0))
        if B > 0:
            xb = Abp[:, :, k0:k0 + W]
            if k0 > 0:
                xb = xb - jnp.einsum("nbk,njk->nbj", X[:, :, :k0],
                                     L[:, k0:k0 + W, :k0], precision=_PREC)
            xb = jnp.einsum("nbk,njk->nbj", xb, Ldi, precision=_PREC)
            X = jax.lax.dynamic_update_slice(X, xb, (0, 0, k0))
    upd = fr[:, P:, P:] - jnp.einsum("nbp,ncp->nbc", X, X, precision=_PREC)
    return L, X, upd


def run_factor(N, P, B, seed=0):
    F = P + B
    print(f"factor shape N={N} P={P} B={B} F={F}")
    rng = np.random.default_rng(seed)
    fr = rng.normal(size=(N, F, F)).astype(np.float32)
    fr = fr + np.swapaxes(fr, 1, 2) + 4.0 * F * np.eye(F, dtype=np.float32)
    frj = jnp.asarray(fr)
    r0 = timed("current(xla)", jax.jit(lambda a: fac_current(a, P)), frj)
    r1 = timed("gemm-inv", jax.jit(lambda a: fac_gemm(a, P)), frj)
    r2 = timed("panels-pallas",
               jax.jit(lambda a: fac_panels(a, P, B)), frj)
    r3 = timed("panels-xla-diag",
               jax.jit(lambda a: fac_panels(a, P, B, pallas_diag=False)),
               frj)
    a = fac_current(frj, P)
    for nm, alt in [("gemm", fac_gemm(frj, P)),
                    ("panels", fac_panels(frj, P, B))]:
        ref = a[1] if B > 0 else a[0]
        got = alt[1] if B > 0 else alt[0]
        rel = float(jnp.max(jnp.abs(ref - got))
                    / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
        print(f"  rel|{nm}-cur|={rel:.2e}")
    gf = N * (P**3 / 3 + P * P * B + P * B * B) * 1e-9
    print(f"  ({gf:.1f} GFLOP -> cur {gf/r0:.2f} gemm {gf/r1:.2f} "
          f"panels {gf/r2:.2f} panels-xla {gf/r3:.2f} TF/s)")
    return r0, r1, r2, r3


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    which = os.environ.get("WHICH", "both")
    if which in ("eadd", "both"):
        run_eadd(64, 395, 613)       # correctness (small)
        run_eadd(1024, 395, 613)     # d=10 (current pallas regime)
        run_eadd(256, 716, 1184)     # d=8 builds from d=9 borders
        run_eadd(16, 2691, 4387)     # d=4
        run_eadd(8, 3518, 5246)      # d=3
    if which in ("factor", "both"):
        run_factor(128, 234, 1393)   # d=7
        run_factor(16, 869, 3518)    # d=4
        run_factor(2, 1738, 3494)    # d=1
        run_factor(1, 3494, 0)       # d=0 (root)
