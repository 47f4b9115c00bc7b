"""Pallas windowed kernel in interpreter mode (CPU CI coverage; compiled
variants are exercised on the real chip by bench.py)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.kernels.window import build_windowed
from tpu_spai.kernels.spmv_pallas import windowed_spmv_pallas
from tpu_spai.sparse import csr_to_graph


def _banded(rng, b=1):
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.datagen.meshes import unit_box_tet

    nodes, elems = unit_box_tet(6, 6, 6)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    if b > 1:
        a = sp.csr_matrix(sp.kron(a, np.eye(b) + 0.05 * rng.random((b, b))))
        a = sp.csr_matrix(a + a.T)
    a.sort_indices()
    perm = rcm_permutation(a if b == 1 else sp.csr_matrix(a[::b, ::b]))
    if b == 1:
        ap = a[perm][:, perm].tocsr()
    else:
        dof = (perm[:, None] * b + np.arange(b)).reshape(-1)
        ap = a[dof][:, dof].tocsr()
    ap.sort_indices()
    return ap


def test_pallas_kernel_interpret_scalar(rng):
    ap = _banded(rng)
    g = csr_to_graph(ap, dtype=np.float32)
    w = build_windowed(
        np.asarray(g.ell.ell_col), np.asarray(g.ell.ell_mask),
        np.asarray(g.ell_vals), tile=64,
    )
    x = rng.standard_normal(ap.shape[0]).astype(np.float32)
    y = windowed_spmv_pallas(w, jnp.asarray(x.reshape(-1, 1)), interpret=True)
    ref = ap @ x
    assert np.abs(np.asarray(y).ravel() - ref).max() < 1e-4 * np.abs(ref).max()


def test_pallas_kernel_interpret_block(rng):
    b = 3
    ap = _banded(rng, b=b)
    g = csr_to_graph(ap, block_size=b, dtype=np.float32)
    w = build_windowed(
        np.asarray(g.ell.ell_col), np.asarray(g.ell.ell_mask),
        np.asarray(g.ell_vals), tile=64,
    )
    x = rng.standard_normal(ap.shape[0]).astype(np.float32)
    y = windowed_spmv_pallas(w, jnp.asarray(x.reshape(-1, b)), interpret=True)
    ref = ap @ x
    assert np.abs(np.asarray(y).ravel() - ref).max() < 1e-3 * np.abs(ref).max()
