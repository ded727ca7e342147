"""Ordered nearest-neighbor conditioning sets (host-side, NumPy/cKDTree).

For ordered locations, row i of the returned NNarray is
[i, j_1, ..., j_m] where j_k < i are the m nearest previously-ordered
neighbors of point i (fewer for the first rows; padded with -1).

Reference parity targets (behavior, not code):
  - GpGp::find_ordered_nn used at /root/reference/R/vecchia_specify.R:159
  - findOrderedNN_kdtree2 at /root/reference/R/NN_kdtree.R:36-68 (1-D case)

TPU design note: this runs once per geometry on the host.  The chunked
algorithm is exact: for a chunk [a, b), neighbors among [0, a) come from a
cKDTree query (k = m), and neighbors inside the chunk [a, i) come from a
brute-force pass; the two candidate sets are merged by distance.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["find_ordered_nn", "knn_indices"]


def knn_indices(locs: np.ndarray, k: int, query: np.ndarray | None = None) -> np.ndarray:
    """Plain k-nearest-neighbor indices (excluding self when query is locs)."""
    locs = np.asarray(locs, dtype=np.float64)
    tree = cKDTree(locs)
    if query is None:
        _, nn = tree.query(locs, k=min(k + 1, locs.shape[0]))
        nn = np.atleast_2d(nn)
        out = np.empty((locs.shape[0], min(k, locs.shape[0] - 1)), dtype=np.int64)
        for i in range(locs.shape[0]):
            row = nn[i][nn[i] != i]
            out[i] = row[: out.shape[1]]
        return out
    query = np.asarray(query, dtype=np.float64)
    _, nn = tree.query(query, k=min(k, locs.shape[0]))
    return np.atleast_2d(nn)


def find_ordered_nn(locsord: np.ndarray, m: int, chunk: int = 4096) -> np.ndarray:
    """Exact m nearest previously-ordered neighbors for each ordered point.

    Returns an (n, m+1) int64 array; row i = [i, nearest previous, ...],
    ordered by increasing distance, padded with -1 where i < m.
    """
    locsord = np.ascontiguousarray(np.asarray(locsord, dtype=np.float64))
    n, _ = locsord.shape
    m = int(min(m, n - 1))
    NN = np.full((n, m + 1), -1, dtype=np.int64)
    NN[:, 0] = np.arange(n)
    if m == 0 or n <= 1:
        return NN

    # head: brute force over the first block
    head = min(n, max(chunk, m + 1))
    d_head = _pairwise_sq(locsord[:head], locsord[:head])
    iu = np.triu_indices(head, 0)
    d_head[iu] = np.inf  # only previous points allowed
    for i in range(1, head):
        prev = min(i, m)
        idx = np.argpartition(d_head[i, :i], prev - 1)[:prev] if i > prev else np.arange(i)
        idx = idx[np.argsort(d_head[i, idx], kind="stable")]
        NN[i, 1:1 + prev] = idx

    # tail: chunked tree queries against [0, a) + brute force inside the chunk
    a = head
    while a < n:
        b = min(n, a + chunk)
        tree = cKDTree(locsord[:a])
        q = locsord[a:b]
        dt, it = tree.query(q, k=min(m, a))
        dt = np.atleast_2d(dt.reshape(b - a, -1))
        it = np.atleast_2d(it.reshape(b - a, -1))
        # brute force within the chunk (previous points only)
        d_in = _pairwise_sq(q, q)
        for r in range(b - a):
            i = a + r
            cand_idx = np.concatenate([it[r], np.arange(a, i)])
            cand_d = np.concatenate([dt[r] ** 2, d_in[r, :r]])
            sel = np.argsort(cand_d, kind="stable")[:m]
            NN[i, 1:1 + sel.size] = cand_idx[sel]
        a = b

    return NN


def _pairwise_sq(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x[:, None, :] - y[None, :, :]
    return np.einsum("ijk,ijk->ij", d, d)
