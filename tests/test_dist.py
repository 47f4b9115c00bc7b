"""Distributed (8 virtual CPU devices): partitioned SpMV + CG parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import Mesh

from tpu_spai.dist import (
    PartitionedSystem,
    dist_pcg,
    dist_spmv_reference,
    partition_system,
)
from tpu_spai.dist.partition import gather_vector, scatter_vector


def _mesh(n=8):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), ("shards",))


def _fem_like(rng, n=400, extra_band=6):
    """Banded-ish SPD matrix (FEM-like locality)."""
    diags = [np.full(n, 4.0)]
    offs = [0]
    for k in range(1, extra_band):
        v = -0.5 * rng.random(n - k)
        diags += [v, v]
        offs += [k, -k]
    a = sp.diags(diags, offs, format="csr")
    a = sp.csr_matrix(a + 0.1 * sp.eye(n))
    # randomize ordering so RCM has work to do
    perm = rng.permutation(n)
    a = a[perm][:, perm].tocsr()
    a.sort_indices()
    return a


def test_partitioned_spmv_matches_scipy(rng):
    a = _fem_like(rng, n=320)
    mesh = _mesh(8)
    system, perm = partition_system(a, n_shards=8)
    x = rng.standard_normal(320)
    xs = scatter_vector(x, perm, system)
    ys = dist_spmv_reference(system, xs, mesh)
    y = gather_vector(ys, perm, system)
    np.testing.assert_allclose(y, a @ x, rtol=1e-12)


def test_partitioned_spmv_block(rng):
    b = 2
    a = _fem_like(rng, n=320)
    # make block pattern (group dofs by 2)
    a = sp.csr_matrix(sp.kron(_fem_like(rng, n=160, extra_band=4), np.ones((2, 2))) + 8 * sp.eye(320))
    a.sort_indices()
    mesh = _mesh(4)
    system, perm = partition_system(a, n_shards=4, block_size=b)
    x = rng.standard_normal(320)
    xs = scatter_vector(x, perm, system)
    ys = dist_spmv_reference(system, xs, mesh)
    y = gather_vector(ys, perm, system)
    np.testing.assert_allclose(y, a @ x, rtol=1e-11)


def test_dist_pcg_matches_single_chip(rng):
    a = _fem_like(rng, n=400)
    mesh = _mesh(8)
    system, perm = partition_system(a, n_shards=8)
    xstar = rng.standard_normal(400)
    b = a @ xstar
    bs = scatter_vector(b, perm, system)
    res = dist_pcg(system, bs, mesh, rtol=1e-10, max_iter=2000)
    assert bool(res.converged)
    x = gather_vector(res.x, perm, system)
    np.testing.assert_allclose(x, xstar, rtol=1e-6, atol=1e-8)

    # iteration parity vs the single-chip solver (same fp64 recurrence)
    from tpu_spai.solver import pcg
    from tpu_spai.sparse import csr_to_graph

    res1 = pcg(csr_to_graph(a), jnp.asarray(b), rtol=1e-10, max_iter=2000)
    assert abs(int(res.iters) - int(res1.iters)) <= 3


def test_dist_pcg_jacobi(rng):
    n = 400
    d = np.logspace(0, 3, n)
    a = _fem_like(rng, n=n)
    a = sp.csr_matrix(a + sp.diags(d))
    a.sort_indices()
    mesh = _mesh(8)
    system, perm = partition_system(a, n_shards=8)
    b = a @ rng.standard_normal(n)
    bs = scatter_vector(b, perm, system)
    inv_diag = 1.0 / np.asarray(system.diag)
    r0 = dist_pcg(system, bs, mesh, rtol=1e-8, max_iter=5000)
    r1 = dist_pcg(
        system, bs, mesh, inv_diag=jnp.asarray(inv_diag), rtol=1e-8, max_iter=5000
    )
    assert bool(r1.converged)
    assert int(r1.iters) < int(r0.iters)


def test_dist_pcg_spai(rng):
    """SPAI factor distributed with the same partition: parity with host."""
    a = _fem_like(rng, n=240)
    mesh = _mesh(4)
    system, perm = partition_system(a, n_shards=4)
    # factor = scaled identity-ish sparse approx (jacobi-sqrt as L)
    dof_perm = perm  # block_size=1
    ap = a[dof_perm][:, dof_perm].tocsr()
    lmat = sp.diags(1.0 / np.sqrt(ap.diagonal())).tocsr()
    lsys, _ = partition_system(lmat, n_shards=4, reorder=False)
    ltsys, _ = partition_system(sp.csr_matrix(lmat.T), n_shards=4, reorder=False)
    b = a @ rng.standard_normal(240)
    bs = scatter_vector(b, perm, system)
    res = dist_pcg(
        system, bs, mesh, prec_system=lsys, prec_system_t=ltsys,
        epsilon=1e-3, rtol=1e-8, max_iter=2000,
    )
    assert bool(res.converged)
    # compare against host scipy with the same preconditioner
    from tpu_spai.solver.host_baselines import get_pcg_iter_time

    lmat_orig = sp.diags(1.0 / np.sqrt(a.diagonal())).tocsr()
    it, _, _ = get_pcg_iter_time(a, np.linalg.solve(a.toarray(), b), lmat_orig,
                                 epsilon=1e-3, rtol=1e-8)
    assert abs(int(res.iters) - it) <= 3
