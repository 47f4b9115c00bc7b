"""Windowed (gather-free) SpMV: numerics vs the gather path and scipy."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from tpu_spai.kernels.window import build_windowed, windowed_spmv_xla
from tpu_spai.sparse import csr_to_graph
from tpu_spai.dist.partition import rcm_permutation


def _banded_spd(rng, n=600, b=1):
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.datagen.meshes import unit_box_tet

    res = round(n ** (1 / 3)) + 1
    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    if b > 1:
        a = sp.csr_matrix(sp.kron(a, np.eye(b) + 0.1 * rng.random((b, b))))
        a = sp.csr_matrix(a + a.T)
    a.sort_indices()
    return a


def _windowed_from(a, b=1, tile=32):
    perm = rcm_permutation(a if b == 1 else sp.csr_matrix(a[:: b, :: b]))
    if b == 1:
        ap = a[perm][:, perm].tocsr()
    else:
        dof = (perm[:, None] * b + np.arange(b)).reshape(-1)
        ap = a[dof][:, dof].tocsr()
    ap.sort_indices()
    g = csr_to_graph(ap, block_size=b, dtype=np.float64)
    vals = np.asarray(g.ell_vals)
    w = build_windowed(
        np.asarray(g.ell.ell_col), np.asarray(g.ell.ell_mask), vals, tile=tile
    )
    return ap, g, w


def test_windowed_matches_scipy_scalar(rng):
    a, g, w = _windowed_from(_banded_spd(rng))
    assert w is not None, "bandwidth too large — RCM failed?"
    x = rng.standard_normal(a.shape[0])
    y = windowed_spmv_xla(w, jnp.asarray(x.reshape(-1, 1)))
    np.testing.assert_allclose(np.asarray(y).ravel(), a @ x, rtol=1e-12)


def test_windowed_matches_scipy_block(rng):
    b = 3
    a, g, w = _windowed_from(_banded_spd(rng, b=b), b=b)
    assert w is not None
    x = rng.standard_normal(a.shape[0])
    y = windowed_spmv_xla(w, jnp.asarray(x.reshape(-1, b)))
    np.testing.assert_allclose(np.asarray(y).ravel(), a @ x, rtol=1e-11)


def test_windowed_rejects_unbanded(rng):
    # random sparse matrix: RCM can't band it; build_windowed must bail
    m = sp.random(400, 400, density=0.05, random_state=rng, format="csr")
    a = sp.csr_matrix(m + m.T + sp.eye(400))
    a.sort_indices()
    g = csr_to_graph(a, dtype=np.float64)
    w = build_windowed(
        np.asarray(g.ell.ell_col), np.asarray(g.ell.ell_mask),
        np.asarray(g.ell_vals), tile=32, max_q=3,
    )
    assert w is None
