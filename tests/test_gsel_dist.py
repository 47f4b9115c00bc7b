"""Distributed gsel PCG: 8-virtual-device mesh vs scipy / single-device."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpu_spai.dist.gsel_dist import dist_pcg_gsel, partition_gsel
from tpu_spai.solver.gsel_solver import build_gsel_csr, pcg_gsel


def _fem():
    # elongated box: small cross-section bandwidth, natural 1-D row
    # partition over 8 shards
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(6, 6, 40)
    return sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )


def _scatter(v, perm, chunk, p):
    out = np.zeros(p * chunk, v.dtype)
    out[: len(v)] = v[perm]
    return jnp.asarray(out.reshape(p, chunk), jnp.float32)


def test_dist_pcg_gsel_matches():
    a = _fem()
    n = a.shape[0]
    p = 8
    pg, perm = partition_gsel(a, p)
    xstar = np.random.default_rng(0).standard_normal(n)
    b = a @ xstar
    b_part = _scatter(b, perm, pg.chunk, p)
    res = dist_pcg_gsel(pg, b_part, rtol=1e-6, max_iter=5000, impl="xla")
    assert bool(res.converged)
    x = np.asarray(res.x).reshape(-1)[: n][np.argsort(perm)][np.argsort(np.argsort(perm))]
    # undo partition ordering: x_orig[perm] = x_part
    x_orig = np.empty(n)
    x_orig[perm] = np.asarray(res.x).reshape(-1)[:n]
    rel = np.linalg.norm(a @ x_orig - b) / np.linalg.norm(b)
    assert rel < 5e-5, rel

    # iteration parity with the single-device gsel solve (same reduction
    # semantics modulo psum order)
    ap = a[perm][:, perm].tocsr()
    g1 = build_gsel_csr(ap)
    r1 = pcg_gsel(g1, jnp.asarray(b[perm], jnp.float32), rtol=1e-6,
                  max_iter=5000, impl="xla", dot_dtype=jnp.float64)
    assert abs(int(res.iters) - int(r1.iters)) <= 2, (int(res.iters), int(r1.iters))


def test_dist_pcg_gsel_spai():
    from tpu_spai.native import fsai

    a = _fem()
    n = a.shape[0]
    p = 8
    pg, perm = partition_gsel(a, p)
    ap = a[perm][:, perm].tocsr()
    lhat = sp.csr_matrix(fsai(ap).T)
    # factor partitions reuse A's ordering (reorder=False keeps rows as-is)
    pl, _ = partition_gsel(lhat, p, reorder=False, halo=pg.halo)
    plt, _ = partition_gsel(sp.csr_matrix(lhat.T), p, reorder=False,
                            halo=pg.halo)
    b = a @ np.ones(n)
    b_part = _scatter(b, perm, pg.chunk, p)
    r0 = dist_pcg_gsel(pg, b_part, rtol=1e-6, max_iter=5000, impl="xla")
    r1 = dist_pcg_gsel(pg, b_part, pl=pl, plt=plt, epsilon=3e-3,
                       rtol=1e-6, max_iter=5000, impl="xla")
    assert bool(r1.converged)
    assert int(r1.iters) < int(r0.iters)
    x_orig = np.empty(n)
    x_orig[perm] = np.asarray(r1.x).reshape(-1)[:n]
    rel = np.linalg.norm(a @ x_orig - b) / np.linalg.norm(b)
    # f32 attainable-accuracy plateau ~ eps_f32 * kappa (kappa ~ 9e3 here);
    # the single-device f32 solve lands at the same level (verified) — the
    # distributed apply itself is exact to 1e-7 vs the host oracle
    assert rel < 3e-3, rel
