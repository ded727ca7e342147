"""Geometry layer: orderings, ordered NN, SGV selection, MRA tree."""

import numpy as np

from gpvecchia_tpu.geometry.ordering import (order_coordinate,
                                             order_maxmin_exact,
                                             order_maxmin_exact_obs_pred,
                                             order_middleout, order_outsidein)
from gpvecchia_tpu.geometry.neighbors import find_ordered_nn
from gpvecchia_tpu.geometry.sgv import which_cond_on_latent
from gpvecchia_tpu.geometry.mra import (build_mra_nnarray, choose_M,
                                        get_mra_params)


def _brute_maxmin(locs, first):
    n = len(locs)
    D = np.linalg.norm(locs[:, None] - locs[None, :], axis=2)
    order = [first]
    rest = set(range(n)) - {first}
    while rest:
        cand = max(rest, key=lambda i: (min(D[i, j] for j in order), -i))
        order.append(cand)
        rest.discard(cand)
    return np.array(order)


def test_maxmin_exact_matches_bruteforce():
    rng = np.random.default_rng(0)
    locs = rng.uniform(size=(80, 2))
    got = order_maxmin_exact(locs)
    want = _brute_maxmin(locs, got[0])
    # maxmin distances must agree (ties may order differently)
    D = np.linalg.norm(locs[:, None] - locs[None, :], axis=2)

    def mindists(order):
        return np.array([min(D[order[i], order[j]] for j in range(i))
                         for i in range(1, len(order))])

    np.testing.assert_allclose(mindists(got), mindists(want), atol=1e-12)


def test_maxmin_first_point_near_centroid():
    rng = np.random.default_rng(1)
    locs = rng.uniform(size=(200, 2))
    ordv = order_maxmin_exact(locs)
    centroid = locs.mean(axis=0)
    d = np.linalg.norm(locs - centroid, axis=1)
    assert ordv[0] == np.argmin(d)


def test_orderings_are_permutations():
    rng = np.random.default_rng(2)
    locs = rng.uniform(size=(100, 3))
    for f in [order_coordinate, order_middleout, order_outsidein,
              order_maxmin_exact]:
        o = f(locs)
        assert sorted(o) == list(range(100))


def test_obs_pred_ordering():
    rng = np.random.default_rng(3)
    locs = rng.uniform(size=(100, 2))
    locs_pred = rng.uniform(size=(50, 2))
    ord_obs, ord_pred = order_maxmin_exact_obs_pred(locs, locs_pred)
    assert sorted(ord_obs) == list(range(100))
    assert sorted(ord_pred) == list(range(50))


def test_find_ordered_nn_exact():
    rng = np.random.default_rng(4)
    locs = rng.uniform(size=(300, 2))
    m = 8
    NN = find_ordered_nn(locs, m, chunk=64)  # force the chunked path
    D = np.linalg.norm(locs[:, None] - locs[None, :], axis=2)
    for i in range(300):
        prev = min(i, m)
        want = np.argsort(D[i, :i], kind="stable")[:prev]
        got = NN[i, 1:1 + prev]
        np.testing.assert_allclose(np.sort(D[i, got]), np.sort(D[i, want]),
                                   atol=1e-12)
    assert np.all(NN[:, 0] == np.arange(300))
    assert np.all(NN[0, 1:] == -1)


def test_sgv_selection_properties():
    rng = np.random.default_rng(5)
    locs = rng.uniform(size=(100, 2))
    NN = find_ordered_nn(locs, 10)
    cond = which_cond_on_latent(NN)
    valid = NN >= 0
    assert cond[0, 0] and not cond[0, 1:].any()
    assert np.all(cond[:, 0])          # self always latent
    assert not cond[~valid].any()      # padding never latent


def test_mra_nnarray_hierarchy():
    rng = np.random.default_rng(6)
    locs = rng.uniform(size=(64, 2))
    NN, eff = build_mra_nnarray(locs, J=[2, 2], M=2, r=[2, 2, 4])
    n = 64
    assert NN.shape[0] == n
    assert np.all(NN[:, 0] == np.arange(n))
    valid = NN >= 0
    # conditioning sets only contain earlier-ordered points
    for i in range(n):
        nb = NN[i, 1:][valid[i, 1:]]
        assert np.all(nb < i)
        # nested: the conditioning set is a chain (each successive neighbor's
        # set is a suffix)
    # every point appears
    assert valid[:, 0].all()


def test_choose_M_valid():
    for n, m in [(100, 10), (1000, 20), (5000, 40), (50, 3)]:
        p = choose_M(n, m)
        r, J, M = p["r"], p["J"], p["M"]
        cum = np.cumprod([1] + list(np.broadcast_to(J, (M,))))
        assert sum(np.broadcast_to(r, (M + 1,))) <= m
        assert np.sum(np.broadcast_to(r, (M + 1,)) * cum) >= n


def test_mra_special_params():
    # independent blocks r=(0,m); low rank r=(m,1)
    p = get_mra_params(100, {"r": [0, 10]}, 10)
    assert p["r"][0] == 0
    p2 = get_mra_params(100, {"r": [10, 1]}, 10)
    assert p2["M"] == 1
