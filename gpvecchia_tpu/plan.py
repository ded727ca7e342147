"""Device-plan construction: spec -> static index structures for TPU compute.

Everything here is parameter-free and cached on the spec (the analogue of the
reference's reusable `vecchia.approx` object, /root/reference/R/vecchia_specify.R:3-5).
The numeric path then consists purely of gathers, segment-sums and batched
dense solves with static shapes.

V (the reverse-ordered Cholesky factor of W = U_y U_y^T + D, reference U2V at
/root/reference/R/vecchia_prediction.R:62-111) is represented column-wise:
  * 'direct' columns are reversed U columns copied verbatim (the zy shortcut
    and the obspred prediction block, which need no factorization),
  * 'chol' columns are computed exactly by the column-wise KL identity on the
    symbolically-filled pattern: V[s_j, j] = A[s_j,s_j]^{-1} e_1 normalized,
    an embarrassingly parallel batched dense solve.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .symbolic import (LowerCSR, col_levels_backward, csr_from_coo_lower,
                       symbolic_cholesky)

__all__ = ["LikelihoodPlan", "build_likelihood_plan", "get_plan"]


@dataclasses.dataclass
class CholLevel:
    """A BUCKET of consecutive dependency levels of the right-looking sparse
    Cholesky, padded to a common (L, F) shape with a leading n_levels axis.

    Columns within a level are independent: read their (already fully
    updated) values from w_flat, normalize, write to v_flat, and scatter the
    Schur-complement rank-1 updates back into w_flat.  On the symbolically
    filled pattern this is the exact factorization; on the unfilled pattern
    (updates outside the pattern dropped) it is exactly IC0
    (/root/reference/src/ic0.cpp:43-64).

    Levels are bucketed (consecutive levels of similar width padded together)
    so the device executes one lax.scan per bucket instead of one unrolled
    step per level — compile time scales with #buckets (~log n), not #levels.
    """
    F: int
    col_slots: np.ndarray   # (nlev, L, F) slots of A[s_j, j] in w_flat, -1 pad
    out_slots: np.ndarray   # (nlev, L, F) target slots in v_flat, -1 pad
    pair_slots: np.ndarray  # (nlev, L, P) slots of (a,b) pairs (a,b in s_j \ {j})
    pair_a: np.ndarray      # (P,) first slot index (1..F-1) of each pair
    pair_b: np.ndarray      # (P,) second slot index


@dataclasses.dataclass
class SolveBlock:
    """A bucket of consecutive dependency levels of the triangular solve."""
    cols: np.ndarray        # (nlev, L) column ids, -1 pad
    slots: np.ndarray       # (nlev, L, F) v_flat slots per column (diag first), -1 pad
    rows: np.ndarray        # (nlev, L, F) rev-row indices (diag first), -1 pad


def _bucket_bounds(sizes):
    """Partition a sequence of level sizes into consecutive buckets.

    A new bucket starts when the ceil-pow2 of the level size changes; the
    padding waste within a bucket is therefore < 2x, and #buckets is
    O(log(max L)) for the typical monotone level-size profile.
    """
    bounds = [0]
    key = None
    for i, s in enumerate(sizes):
        k = 1 << int(np.ceil(np.log2(max(int(s), 1))))
        if key is not None and k != key:
            bounds.append(i)
        key = k
    bounds.append(len(sizes))
    return bounds


@dataclasses.dataclass
class LikelihoodPlan:
    mode: str               # 'chol' | 'obspred' | 'direct'
    n_all: int
    n_lat: int
    n_obs: int
    n_pred_lat: int         # latent vars handled as direct pred columns (obspred)
    dtype: object

    # core index arrays (numpy; converted to device constants at trace time)
    locs: np.ndarray
    NN: np.ndarray          # (n_all, m+1) int32, clamped to >= 0
    valid: np.ndarray
    cond: np.ndarray
    has_latent_pts: np.ndarray   # (n_all,) bool
    latent_rank: np.ndarray      # (n_all,) int32 (-1 if none)
    obs_pos: np.ndarray          # (n_all,) int32 (-1 if unobserved)
    obs_points: np.ndarray       # (n_obs,) point index of each obs position
    ord_z: np.ndarray            # (n_obs,) user-z gather
    nb_obs_pos: np.ndarray       # (n_all, m+1) obs position of neighbors (clamped)
    nb_resp: np.ndarray          # (n_all, m+1) bool: valid response-conditioned nb

    # W build (only for chol/obspred modes)
    w_nnz: int = 0
    w_pair_slots: np.ndarray | None = None   # (n_all, P2) int32, -1 drop
    pair_a: np.ndarray | None = None         # (P2,)
    pair_b: np.ndarray | None = None
    w_diag_slots: np.ndarray | None = None   # (n_dlat,) slots for D additions
    w_diag_obs_pos: np.ndarray | None = None # (n_dlat,) obs position providing 1/nugget

    # V storage
    v_nnz: int = 0
    v_colptr: np.ndarray | None = None
    v_rows: np.ndarray | None = None         # (v_nnz,) int32
    v_diag_slots: np.ndarray | None = None   # (n_lat,)
    dir_slots: np.ndarray | None = None      # (K,) targets in v_flat
    dir_pt: np.ndarray | None = None         # (K,) point ids
    dir_nn: np.ndarray | None = None         # (K,) NNarray slot ids
    chol_levels: list = dataclasses.field(default_factory=list)

    # triangular solve schedules
    fwd_blocks: list = dataclasses.field(default_factory=list)
    bwd_blocks: list = dataclasses.field(default_factory=list)

    # compiled function cache
    compiled: dict = dataclasses.field(default_factory=dict)


def _build_chol_levels(chol_cols, col_patterns, colptr, W: LowerCSR,
                       rev_offset: int):
    """Group chol columns by elimination level; build all slot maps.

    chol_cols: global rev column ids; col_patterns[j]: global rev rows
    (ascending, diag first).  A-space index = global rev index - rev_offset
    (the W value array lives on the A-space pattern).
    """
    chol_cols = np.asarray(chol_cols, dtype=np.int64)
    n_A_cols = chol_cols.size
    if n_A_cols == 0:
        return []
    # dependency level within the chol set: col j depends on every col k with
    # j in s_k (k < j); level = 1 + max level of dependencies.  Vectorized
    # wave iteration (converges after #levels sweeps).
    first = int(chol_cols.min())
    nc = int(chol_cols.max()) + 1 - first
    level = np.ones(nc, dtype=np.int64)
    src_l, dst_l = [], []
    for j in chol_cols:
        s = col_patterns[j][1:]
        if s.size:
            src_l.append(np.full(s.size, j - first))
            dst_l.append(s - first)
    if src_l:
        src = np.concatenate(src_l)
        dst = np.concatenate(dst_l)
        while True:
            new = level.copy()
            np.maximum.at(new, dst, level[src] + 1)
            if np.array_equal(new, level):
                break
            level = new
    levels = level[chol_cols - first]

    # per-level column groups (in level order)
    order = np.argsort(levels, kind="stable")
    lv_sorted = levels[order]
    bounds = np.flatnonzero(np.diff(lv_sorted)) + 1
    groups = [chol_cols[g] for g in np.split(order, bounds)]

    out = []
    bb = _bucket_bounds([g.size for g in groups])
    for s, e in zip(bb[:-1], bb[1:]):
        bucket = groups[s:e]
        nlev = len(bucket)
        L = max(g.size for g in bucket)
        F = max(int(col_patterns[j].size) for g in bucket for j in g)
        rows_pad = np.full((nlev, L, F), -1, dtype=np.int64)     # A-space
        out_slots = np.full((nlev, L, F), -1, dtype=np.int64)
        jj = np.full((nlev, L), -1, dtype=np.int64)              # A-space col
        for li, ids in enumerate(bucket):
            jj[li, :ids.size] = ids - rev_offset
            for bi, j in enumerate(ids):
                pat = col_patterns[j]
                rows_pad[li, bi, :pat.size] = pat - rev_offset
                out_slots[li, bi, :pat.size] = colptr[j] + np.arange(pat.size)
        wmask = rows_pad >= 0
        col_slots = W.lookup(np.where(wmask, rows_pad, 0).ravel(),
                             np.broadcast_to(np.where(jj < 0, 0, jj)[:, :, None],
                                             rows_pad.shape).ravel()
                             ).reshape(nlev, L, F)
        col_slots = np.where(wmask, col_slots, -1)
        assert np.all(col_slots[wmask] >= 0), \
            "A[s_j, j] must lie in the factorization pattern"
        if F > 1:
            ia, ib = np.tril_indices(F - 1)   # a >= b over slots 1..F-1
            pa = (ia + 1).astype(np.int64)
            pb = (ib + 1).astype(np.int64)
            va = rows_pad[:, :, pa]
            vb = rows_pad[:, :, pb]
            ok = (va >= 0) & (vb >= 0)
            pair_slots = W.lookup(np.where(ok, va, 0).ravel(),
                                  np.where(ok, vb, 0).ravel()
                                  ).reshape(nlev, L, pa.size)
            pair_slots = np.where(ok, pair_slots, -1)
        else:
            pa = pb = np.empty(0, dtype=np.int64)
            pair_slots = np.empty((nlev, L, 0), dtype=np.int64)
        out.append(CholLevel(F=F,
                             col_slots=col_slots.astype(np.int32),
                             out_slots=out_slots.astype(np.int32),
                             pair_slots=pair_slots.astype(np.int32),
                             pair_a=pa.astype(np.int32),
                             pair_b=pb.astype(np.int32)))
    return out


def _padded_col_slots(colptr, grp, widths, F):
    """Vectorized (L, F) slot matrix: row i = colptr[grp[i]] + arange, -1 pad."""
    L = grp.size
    ar = np.arange(F)[None, :]
    slots = colptr[grp][:, None] + ar
    return np.where(ar < widths[:, None], slots, -1)


def _build_solve_blocks(colptr, rows, levels, n_lat):
    """Group V columns by dependency level into bucketed SolveBlocks."""
    order = np.argsort(levels, kind="stable")
    lv_sorted = levels[order]
    bounds = np.flatnonzero(np.diff(lv_sorted)) + 1
    groups = np.split(order, bounds)
    rows_pad = np.concatenate([rows, [-1]])

    blocks = []
    bb = _bucket_bounds([g.size for g in groups])
    for s, e in zip(bb[:-1], bb[1:]):
        bucket = groups[s:e]
        nlev = len(bucket)
        L = max(g.size for g in bucket)
        F = int(max((colptr[g + 1] - colptr[g]).max() for g in bucket))
        cols = np.full((nlev, L), -1, dtype=np.int64)
        slots = np.full((nlev, L, F), -1, dtype=np.int64)
        for li, grp in enumerate(bucket):
            widths = colptr[grp + 1] - colptr[grp]
            cols[li, :grp.size] = grp
            slots[li, :grp.size] = _padded_col_slots(colptr, grp, widths, F)
        rws = np.where(slots >= 0, rows_pad[np.clip(slots, 0, rows.size)], -1)
        blocks.append(SolveBlock(cols=cols.astype(np.int32),
                                 slots=slots.astype(np.int32),
                                 rows=rws.astype(np.int32)))
    return blocks


def _forward_levels(colptr, rows, n_lat):
    """Forward-solve level of each column (1 + longest incoming chain).

    Vectorized wave iteration: each sweep pushes level[j]+1 onto all rows of
    column j; converges after #levels sweeps.
    """
    level = np.ones(n_lat, dtype=np.int64)
    col_of = np.repeat(np.arange(n_lat), np.diff(colptr))
    offdiag = rows != col_of
    src = col_of[offdiag]
    dst = rows[offdiag]
    while True:
        new = level.copy()
        np.maximum.at(new, dst, level[src] + 1)
        if np.array_equal(new, level):
            return level
        level = new


def build_likelihood_plan(spec, dtype=np.float32) -> LikelihoodPlan:
    """Build the full static plan for likelihood/prediction on device."""
    NN = spec.NNarray.astype(np.int64)
    valid = NN >= 0
    cond = spec.cond_latent & valid
    n_all, mp1 = NN.shape
    n_lat = spec.n_latent
    latent_rank = spec.latent_rank
    obs_pos = spec.obs_pos
    has_lat = spec.has_latent
    has_obs = spec.has_obs
    n_obs = int(has_obs.sum())

    NN_c = np.where(valid, NN, 0)
    nb_obs_pos = np.where(valid, obs_pos[NN_c], -1)
    nb_resp = valid & ~cond
    # response-conditioned neighbors must be observed
    assert np.all(nb_obs_pos[nb_resp] >= 0), "response conditioning on unobserved point"

    # ---- mode ----
    # 'direct' (V = reversed U columns, no factorization) is valid only when
    # no latent point carries an observation (D = 0), i.e. the zy family
    if spec.cond_yz == "zy":
        mode = "direct"
    elif spec.ordering_pred == "obspred" and spec.n_pred > 0:
        mode = "obspred"
    else:
        mode = "chol"

    revlat = np.where(has_lat, n_lat - 1 - latent_rank, -1)

    # U-tilde column row-sets in rev-lat space (latent rows of latent cols)
    # row slots: self + latent-conditioned neighbors
    u_rows_rev = np.where(cond, revlat[NN_c], -1)          # (n_all, m+1)
    u_rows_rev = np.where(has_lat[:, None], u_rows_rev, -1)

    plan = LikelihoodPlan(
        mode=mode, n_all=n_all, n_lat=n_lat, n_obs=n_obs, n_pred_lat=0,
        dtype=dtype,
        locs=spec.locsord, NN=NN_c.astype(np.int32), valid=valid, cond=cond,
        has_latent_pts=has_lat, latent_rank=latent_rank.astype(np.int32),
        obs_pos=obs_pos.astype(np.int32),
        obs_points=np.flatnonzero(has_obs).astype(np.int32),
        ord_z=spec.ord_z.astype(np.int32),
        nb_obs_pos=np.where(nb_obs_pos >= 0, nb_obs_pos, 0).astype(np.int32),
        nb_resp=nb_resp)

    # ---- decide which latent columns are 'direct' vs 'chol' ----
    # (columns indexed by global rev id j; original latent rank c = n_lat-1-j)
    if mode == "direct":
        chol_rev_cols = np.empty(0, dtype=np.int64)
        rev_offset = 0
    elif mode == "obspred":
        # obs-era latent vars: points before the first prediction point
        n_obs_lat = int(has_lat[:spec.n_obs].sum())
        n_pred_lat = n_lat - n_obs_lat
        plan.n_pred_lat = n_pred_lat
        chol_rev_cols = np.arange(n_pred_lat, n_lat)
        rev_offset = n_pred_lat
    else:
        chol_rev_cols = np.arange(n_lat)
        rev_offset = 0

    # ---- W pattern and slot maps (A-space = rev index - rev_offset) ----
    col_patterns: dict[int, np.ndarray] = {}
    if chol_rev_cols.size:
        n_A = n_lat - rev_offset
        # contributing U columns: latent cols with original rank c such that
        # rev id >= rev_offset  <=>  c < n_A
        contrib = has_lat & (latent_rank < n_A) & (latent_rank >= 0)
        rr = u_rows_rev[contrib] - rev_offset      # (nc, m+1), -1 invalid
        iu, ju = np.triu_indices(mp1)
        pa = iu.astype(np.int64)
        pb = ju.astype(np.int64)
        A_r = rr[:, pa]
        B_r = rr[:, pb]
        ok = (A_r >= 0) & (B_r >= 0)
        hi = np.maximum(A_r, B_r)[ok]
        lo = np.minimum(A_r, B_r)[ok]
        W0 = csr_from_coo_lower(n_A, hi, lo)    # unfilled W pattern

        # ---- symbolic factorization of the A block ----
        if spec.ic0:
            # incomplete factorization: keep the unfilled pattern; column
            # patterns are the transpose of the lower-CSR rows
            rows_rep = np.repeat(np.arange(n_A), np.diff(W0.indptr))
            order = np.argsort(W0.indices, kind="stable")
            colsA: list[np.ndarray] = [None] * n_A
            sorted_cols = W0.indices[order]
            sorted_rows = rows_rep[order]
            bounds = np.flatnonzero(np.diff(sorted_cols)) + 1
            starts = np.concatenate([[0], bounds, [sorted_cols.size]])
            by_col = {int(sorted_cols[starts[i]]):
                      np.sort(sorted_rows[starts[i]:starts[i + 1]])
                      for i in range(len(starts) - 1) if starts[i] < sorted_cols.size}
            for jA in range(n_A):
                colsA[jA] = by_col.get(jA, np.asarray([jA], dtype=np.int64))
            W = W0
        else:
            colsA, parent, row_level = symbolic_cholesky(W0)
            # the numeric factorization scatters Schur updates in place, so
            # the W value array lives on the *filled* pattern
            from .symbolic import cols_to_lower_csr
            W = cols_to_lower_csr(colsA, n_A)
        plan.w_nnz = W.nnz
        for jA, s in enumerate(colsA):
            col_patterns[jA + rev_offset] = np.sort(s) + rev_offset

        # pair -> slot map for all points; only *contributing* U columns may
        # scatter (pred columns' obs-row pairs are carried by the direct
        # V.pr block instead, cf. U2V obspred at R/vecchia_prediction.R:86-107)
        rr_all = np.where(contrib[:, None], u_rows_rev - rev_offset, -1)
        A_all = rr_all[:, pa]
        B_all = rr_all[:, pb]
        ok_all = (A_all >= 0) & (B_all >= 0)
        hi_a = np.where(ok_all, np.maximum(A_all, B_all), 0)
        lo_a = np.where(ok_all, np.minimum(A_all, B_all), 0)
        slots = W.lookup(hi_a.ravel(), lo_a.ravel()).reshape(n_all, pa.size)
        plan.w_pair_slots = np.where(ok_all, slots, -1).astype(np.int32)
        plan.pair_a = pa.astype(np.int32)
        plan.pair_b = pb.astype(np.int32)

        # D diagonal: latent points with observations contribute 1/nugget
        dpts = np.flatnonzero(has_lat & has_obs & (latent_rank < n_A))
        drev = (n_lat - 1 - latent_rank[dpts]) - rev_offset
        plan.w_diag_slots = W.lookup(drev, drev).astype(np.int32)
        plan.w_diag_obs_pos = obs_pos[dpts].astype(np.int32)

    # direct columns: reversed U columns
    direct_rev_cols = np.setdiff1d(np.arange(n_lat), chol_rev_cols)
    # for each direct col (rev j, latent rank c = n_lat-1-j, point p):
    # rows = revlat of its latent-conditioned neighbors (incl self)
    lat_points = spec.latent_point
    dir_records = []  # (rev_col, rows_sorted, pt, nnslot_sorted)
    for j in direct_rev_cols:
        c = n_lat - 1 - j
        p = lat_points[c]
        slots_nn = np.flatnonzero(cond[p])
        rows = revlat[NN_c[p, slots_nn]]
        order = np.argsort(rows, kind="stable")
        dir_records.append((j, rows[order], p, slots_nn[order]))
        col_patterns[j] = rows[order]

    # ---- assemble V column storage ----
    widths = np.array([col_patterns[j].size for j in range(n_lat)], dtype=np.int64)
    colptr = np.zeros(n_lat + 1, dtype=np.int64)
    np.cumsum(widths, out=colptr[1:])
    v_rows = np.concatenate([col_patterns[j] for j in range(n_lat)]) \
        if n_lat else np.empty(0, np.int64)
    plan.v_nnz = int(v_rows.size)
    plan.v_colptr = colptr
    plan.v_rows = v_rows.astype(np.int32)
    plan.v_diag_slots = colptr[:-1].astype(np.int32)
    for j in range(n_lat):
        assert col_patterns[j][0] == j, "diag must lead each V column"

    if dir_records:
        plan.dir_slots = np.concatenate(
            [colptr[j] + np.arange(rw.size) for j, rw, _, _ in dir_records]
        ).astype(np.int32)
        plan.dir_pt = np.concatenate(
            [np.full(rw.size, p) for _, rw, p, _ in dir_records]).astype(np.int32)
        plan.dir_nn = np.concatenate(
            [sl for _, _, _, sl in dir_records]).astype(np.int32)
    else:
        plan.dir_slots = np.empty(0, np.int32)
        plan.dir_pt = np.empty(0, np.int32)
        plan.dir_nn = np.empty(0, np.int32)

    if chol_rev_cols.size:
        plan.chol_levels = _build_chol_levels(
            chol_rev_cols, col_patterns, colptr, W, rev_offset)

    # ---- solve schedules ----
    fwd_levels = _forward_levels(colptr, v_rows, n_lat)
    plan.fwd_blocks = _build_solve_blocks(colptr, v_rows, fwd_levels, n_lat)
    col_arrays = [col_patterns[j] for j in range(n_lat)]
    bwd_levels = col_levels_backward(col_arrays)
    plan.bwd_blocks = _build_solve_blocks(colptr, v_rows, bwd_levels, n_lat)

    return plan


def get_plan(spec, dtype=np.float32) -> LikelihoodPlan:
    key = ("likelihood_plan", np.dtype(dtype).name)
    return spec.cached(key, lambda: build_likelihood_plan(spec, dtype))


def get_sel_pair_slots(spec) -> np.ndarray:
    """(n_all, m+1, m+1) indices into a flattened (n_all, m+1) selected
    covariance matrix: entry (i, a, b) locates Sigma[NN[i,a], NN[i,b]] inside
    the selected matrix, exploiting hierarchical closure (the deeper of the
    two points lists the other in its own conditioning set).  -1 where the
    pair is invalid or not present (non-hierarchical patterns).
    """

    def build():
        NN = spec.NNarray.astype(np.int64)
        n, mp1 = NN.shape
        valid = NN >= 0
        # lookup (row r, point q) -> flat slot r*mp1 + j
        rows = np.repeat(np.arange(n), mp1)[valid.ravel()]
        pts = NN[valid]
        keys = rows * n + pts
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        svals = (rows * mp1 + (np.tile(np.arange(mp1), n)[valid.ravel()]))[order]

        NNc = np.where(valid, NN, 0)
        P = NNc[:, :, None]
        Q = NNc[:, None, :]
        ok = valid[:, :, None] & valid[:, None, :]
        r = np.maximum(P, Q)
        mn = np.minimum(P, Q)
        q = (r * n + mn).ravel()
        pos = np.searchsorted(skeys, q)
        pos_c = np.clip(pos, 0, skeys.size - 1)
        hit = skeys[pos_c] == q
        slots = np.where(hit, svals[pos_c], -1).reshape(n, mp1, mp1)
        slots = np.where(ok, slots, -1)
        missing = ok & (slots < 0)
        if missing.any():
            import warnings
            warnings.warn(
                "selected-covariance matrix cannot represent all conditioning "
                "pairs (pattern is not hierarchically closed); missing pairs "
                "treated as zero covariance")
        return slots.astype(np.int32)

    return spec.cached("sel_pair_slots", build)
