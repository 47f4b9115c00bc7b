"""Smoothed-aggregation AMG baseline tests."""

import numpy as np
import scipy.sparse as sp

from tpu_spai.solver.amg import (
    SmoothedAggregationAMG,
    get_amg_iter_time,
    get_amgcg_iter_time,
)
from tpu_spai.solver.host_baselines import get_cg_iter_time


def _poisson2d(n):
    a1 = sp.diags([-1, 2, -1], [-1, 0, 1], shape=(n, n))
    a = sp.kron(sp.eye(n), a1) + sp.kron(a1, sp.eye(n))
    a = sp.csr_matrix(a)
    a.sort_indices()
    return a


def test_amg_hierarchy_coarsens():
    a = _poisson2d(24)  # 576 dofs
    amg = SmoothedAggregationAMG(a, max_coarse=50)
    assert len(amg.levels) >= 1
    sizes = [lvl[0].shape[0] for lvl in amg.levels] + [amg.coarse_a.shape[0]]
    assert all(sizes[i] > sizes[i + 1] for i in range(len(sizes) - 1))
    assert sizes[-1] <= 50


def test_amg_cg_beats_plain_cg():
    a = _poisson2d(32)  # 1024 dofs, kappa ~ O(n^2)
    gt = np.ones(a.shape[0])
    it_plain, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="none")
    it_amg, _, _ = get_amgcg_iter_time(a, gt, rtol=1e-8)
    assert it_amg < it_plain / 3  # AMG should be dramatically better here


def test_amg_standalone_converges():
    a = _poisson2d(20)
    gt = np.random.default_rng(0).standard_normal(a.shape[0])
    b = a @ gt
    amg = SmoothedAggregationAMG(a)
    x, it = amg.solve(b, rtol=1e-8, max_iter=200)
    assert it < 200
    np.testing.assert_allclose(x, gt, rtol=1e-5, atol=1e-6)
