"""gsel SpMV scheme: host builder + XLA reference + Pallas (interpret).

Oracle: scipy CSR matvec in f64, compared at f32 tolerance (the scheme is
f32-exact up to the usual sum-order rounding).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from tpu_spai.kernels.gsel import build_gsel, gsel_spmv_xla
from tpu_spai.kernels.gsel_pallas import gsel_spmv_pallas


def _fem_matrix(res=8):
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.dist.partition import rcm_permutation

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    return a[perm][:, perm].tocsr()


def _random_matrix(n=700, density=5e-3, seed=0):
    rng = np.random.default_rng(seed)
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    return (m + m.T + sp.eye(n) * 3.0).tocsr()


def _check(a, rtol=2e-5):
    a = sp.csr_matrix(a)
    g = build_gsel(a)
    assert g is not None
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    want = a.astype(np.float64) @ x.astype(np.float64)
    got_xla = np.asarray(gsel_spmv_xla(g, jnp.asarray(x)))
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got_xla / scale, want / scale, atol=rtol)
    got_pl = np.asarray(gsel_spmv_pallas(g, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got_pl / scale, want / scale, atol=rtol)
    return g


def test_fem_banded():
    _check(_fem_matrix(8))


def test_random_unbanded():
    # whole-x window: the synthetic-family case (no RCM, no fallback)
    _check(_random_matrix())


def test_rectangular_transpose():
    # transpose operator (L^T in the SPAI apply) — rectangular-safe path
    a = _random_matrix(500)
    at = sp.csr_matrix(a.T)
    g = build_gsel(at)
    x = np.random.default_rng(2).standard_normal(500).astype(np.float32)
    want = at.astype(np.float64) @ x
    got = np.asarray(gsel_spmv_xla(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_bsr_scalar_expansion():
    # block matrices run at DOF level: expand BSR->CSR, one scalar pass
    rng = np.random.default_rng(3)
    nb, b = 60, 3
    m = sp.random(nb, nb, density=0.05, random_state=rng, format="csr")
    a = sp.kron(m, np.ones((b, b))).tocsr()
    a.data = rng.standard_normal(a.nnz)
    a = (a + a.T + sp.eye(nb * b) * 5).tocsr()
    _check(a)


def test_small_and_empty_rows():
    a = sp.csr_matrix(np.diag([1.0, 2.0, 3.0, 0.0, 5.0]))
    g = _check(a)
    assert g.n_rows == 5


def test_padding_tiles():
    # n not a multiple of 128*group: exercises tile padding in pallas impl
    a = _random_matrix(n=131)
    _check(a)


def test_too_wide_returns_none():
    n = 40000
    rng = np.random.default_rng(4)
    rows = np.arange(n)
    cols = rng.integers(0, n, n)
    a = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, n))
    assert build_gsel(a, max_q=64) is None


def test_lane_groups_match():
    # two-level chunk maps (one chunk per 16-lane group): same semantics,
    # much tighter K' padding
    a = _fem_matrix(8)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    want = a.astype(np.float64) @ x
    scale = np.abs(want).max()
    g1 = build_gsel(a, lane_groups=1)
    g8 = build_gsel(a, lane_groups=8)
    assert g8.k_width < g1.k_width  # padding actually shrinks
    for g in (g1, g8):
        got = np.asarray(gsel_spmv_xla(g, jnp.asarray(x)))
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)
        got_pl = np.asarray(gsel_spmv_pallas(g, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(got_pl / scale, want / scale, atol=2e-5)


def test_lane_groups_random_pattern():
    a = _random_matrix(900, density=8e-3, seed=9)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    want = a.astype(np.float64) @ x
    g4 = build_gsel(a, lane_groups=4)
    got = np.asarray(gsel_spmv_xla(g4, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * np.abs(want).max())


def test_window2_fem():
    # 2-chunk slot windows: K' reaches ~max row degree on RCM FEM
    # patterns (docs/PERF.md round-1n); sub bit packs into lidx bit 7
    a = _fem_matrix(8)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    want = a.astype(np.float64) @ x
    scale = np.abs(want).max()
    g1 = build_gsel(a, window=1)
    g2 = build_gsel(a, window=2)
    assert g2.window == 2
    assert g2.k_width < g1.k_width
    maxdeg = int(np.diff(a.indptr).max())
    assert g2.k_width <= maxdeg + 2
    got = np.asarray(gsel_spmv_xla(g2, jnp.asarray(x)))
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)
    got_pl = np.asarray(gsel_spmv_pallas(g2, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got_pl / scale, want / scale, atol=2e-5)


def test_window2_random_and_ds():
    a = _random_matrix(900, density=8e-3, seed=11)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(a.shape[1]).astype(np.float32)
    want = a.astype(np.float64) @ x
    scale = np.abs(want).max()
    g2 = build_gsel(a, window=2)
    got = np.asarray(gsel_spmv_xla(g2, jnp.asarray(x)))
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)
    # double-single planes with window: fp64-grade accuracy preserved
    from tpu_spai.kernels.gsel import gsel_spmv_ds_xla
    from tpu_spai.kernels.gsel_pallas import gsel_spmv_ds_pallas

    gd = build_gsel(a, window=2, double_single=True)
    zeros = jnp.zeros(a.shape[1], jnp.float32)
    for fn in (gsel_spmv_ds_xla, lambda g, h, l: gsel_spmv_ds_pallas(
            g, h, l, interpret=True)):
        yh, yl = fn(gd, jnp.asarray(x), zeros)
        y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        np.testing.assert_allclose(y / scale, want / scale, atol=1e-12)
