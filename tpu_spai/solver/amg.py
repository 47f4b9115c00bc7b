"""Smoothed-aggregation AMG (host) — pyamg/AMGX baseline replacement.

The reference benchmarks AMG both as a CG preconditioner and standalone
(validate.py:435-538 pyamg smoothed_aggregation_solver, :540-734 AMGX
PCG+V-cycle). Neither wheel exists in this environment, so this module
implements classical smoothed aggregation:

  * symmetric strength of connection  |a_ij| >= theta sqrt(a_ii a_jj),
  * greedy root-node aggregation,
  * tentative piecewise-constant prolongator smoothed by one weighted
    Jacobi step  P = (I - omega D^{-1} A) P0,
  * Galerkin coarse operators  A_c = P^T A P,
  * V-cycle with weighted-Jacobi pre/post smoothing and a dense coarse
    solve,

exposed as a scipy LinearOperator for CG preconditioning and as a
standalone iterative solver. Host-side analysis/baseline only — the
device production path is the SPAI CG.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _rho_dinv_a(a: sp.csr_matrix, d: np.ndarray, iters: int = 12) -> float:
    """Power-iteration estimate of rho(D^{-1} A) (SA weighting)."""
    dinv = 1.0 / np.where(d != 0, d, 1.0)
    x = np.random.default_rng(0).standard_normal(a.shape[0])
    x /= np.linalg.norm(x)
    rho = 1.0
    for _ in range(iters):
        x = dinv * (a @ x)
        nrm = np.linalg.norm(x)
        if nrm == 0:
            break
        rho = nrm
        x /= nrm
    return max(rho, 1e-8)


def _strength_graph(a: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    d = np.sqrt(np.abs(a.diagonal()))
    coo = a.tocoo()
    keep = np.abs(coo.data) >= theta * d[coo.row] * d[coo.col]
    keep &= coo.row != coo.col
    return sp.csr_matrix(
        (np.ones(np.sum(keep)), (coo.row[keep], coo.col[keep])), shape=a.shape
    )


def _aggregate(strength: sp.csr_matrix) -> np.ndarray:
    """Greedy aggregation; returns aggregate id per node (-1 none)."""
    n = strength.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = strength.indptr, strength.indices
    next_agg = 0
    # pass 1: roots with all-unaggregated neighborhoods
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = next_agg
        agg[nbrs] = next_agg
        next_agg += 1
    # pass 2: attach stragglers to a neighboring aggregate
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        hit = nbrs[agg[nbrs] >= 0]
        if len(hit):
            agg[i] = agg[hit[0]]
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg


class SmoothedAggregationAMG:
    def __init__(
        self,
        a: sp.csr_matrix,
        theta: float = 0.08,
        omega: float = 4.0 / 3.0,
        max_levels: int = 10,
        max_coarse: int = 100,
        presmooth: int = 1,
        postsmooth: int = 1,
    ):
        self.omega = omega
        self.presmooth = presmooth
        self.postsmooth = postsmooth
        self.levels: List[Tuple[sp.csr_matrix, np.ndarray, Optional[sp.csr_matrix], float]] = []
        a = sp.csr_matrix(a, dtype=np.float64)
        for _ in range(max_levels):
            d = a.diagonal().copy()
            if a.shape[0] <= max_coarse:
                break
            rho = _rho_dinv_a(a, d)
            strength = _strength_graph(a, theta)
            agg = _aggregate(strength)
            n_agg = int(agg.max()) + 1
            if n_agg >= a.shape[0]:  # no coarsening progress
                break
            p0 = sp.csr_matrix(
                (np.ones(a.shape[0]), (np.arange(a.shape[0]), agg)),
                shape=(a.shape[0], n_agg),
            )
            dinv = 1.0 / np.where(d != 0, d, 1.0)
            # prolongation smoother and Jacobi relaxation both scaled by
            # rho(D^{-1} A) — the classical SA weighting
            p = p0 - (self.omega / rho) * (sp.diags(dinv) @ (a @ p0))
            self.levels.append((a, d, sp.csr_matrix(p), rho))
            a = sp.csr_matrix(p.T @ a @ p)
        self.coarse_a = a.toarray()
        self.coarse_solve = np.linalg.pinv(self.coarse_a)

    def _smooth(self, a, d, rho, x, b, sweeps):
        dinv = (2.0 / 3.0) / rho / np.where(d != 0, d, 1.0)
        for _ in range(sweeps):
            x = x + dinv * (b - a @ x)
        return x

    def vcycle(self, b: np.ndarray, level: int = 0) -> np.ndarray:
        if level == len(self.levels):
            return self.coarse_solve @ b
        a, d, p, rho = self.levels[level]
        x = self._smooth(a, d, rho, np.zeros_like(b), b, self.presmooth)
        r = b - a @ x
        xc = self.vcycle(p.T @ r, level + 1)
        x = x + p @ xc
        return self._smooth(a, d, rho, x, b, self.postsmooth)

    def as_linear_operator(self) -> spla.LinearOperator:
        n = self.levels[0][0].shape[0] if self.levels else self.coarse_a.shape[0]
        return spla.LinearOperator((n, n), matvec=self.vcycle, dtype=np.float64)

    def solve(
        self, b: np.ndarray, rtol: float = 1e-6, max_iter: int = 200
    ) -> Tuple[np.ndarray, int]:
        """Standalone AMG iteration (V-cycle as the iterate update)."""
        a = self.levels[0][0] if self.levels else sp.csr_matrix(self.coarse_a)
        x = np.zeros_like(b)
        bnorm = np.linalg.norm(b)
        for it in range(max_iter):
            r = b - a @ x
            if np.linalg.norm(r) <= rtol * bnorm:
                return x, it
            x = x + self.vcycle(r)
        return x, max_iter


def get_amgcg_iter_time(
    a: sp.csr_matrix,
    gt: np.ndarray,
    rtol: float = 1e-6,
    max_iter: int = 0,
    repeat: int = 1,
) -> Tuple[float, float, float]:
    """AMG-preconditioned CG timing (~ validate.py:435-505)."""
    from .host_baselines import _run_cg

    n = a.shape[0]
    max_iter = max_iter if max_iter > 0 else n
    a = sp.csr_matrix(a, dtype=np.float64)
    b = (a @ gt).astype(np.float64)
    iters = prec_t = solve_t = 0.0
    for _ in range(repeat):
        t0 = time.perf_counter()
        amg = SmoothedAggregationAMG(a)
        tp = time.perf_counter() - t0
        _, it, ts = _run_cg(a, b, amg.as_linear_operator(), rtol, max_iter)
        iters += it
        prec_t += tp
        solve_t += ts
    return iters / repeat, prec_t / repeat, solve_t / repeat


def get_amg_iter_time(
    a: sp.csr_matrix,
    gt: np.ndarray,
    rtol: float = 1e-6,
    max_iter: int = 200,
    repeat: int = 1,
) -> Tuple[float, float, float]:
    """Standalone AMG timing (~ validate.py:507-538)."""
    a = sp.csr_matrix(a, dtype=np.float64)
    b = (a @ gt).astype(np.float64)
    iters = prec_t = solve_t = 0.0
    for _ in range(repeat):
        t0 = time.perf_counter()
        amg = SmoothedAggregationAMG(a)
        tp = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, it = amg.solve(b, rtol=rtol, max_iter=max_iter)
        ts = time.perf_counter() - t0
        iters += it
        prec_t += tp
        solve_t += ts
    return iters / repeat, prec_t / repeat, solve_t / repeat
