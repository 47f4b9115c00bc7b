"""Multi-RHS gsel SpMV kernel + batched PCG.

The multi-RHS path amortizes the grouped-ELL plane stream (the HBM bound)
over k rhs columns; the reference solves multi-RHS samples one column at
a time (neural_cg/data.py:392-397). Column semantics must match the
single-RHS path exactly: same values, same per-column CG iteration counts.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpu_spai.kernels.gsel import gsel_spmv_multi_xla, gsel_spmv_xla
from tpu_spai.kernels.gsel_pallas import gsel_spmv_multi_pallas
from tpu_spai.solver.gsel_solver import (
    GselSpaiPrec,
    build_gsel_csr,
    pcg_gsel,
    pcg_gsel_multi,
)


def _fem_like(n_side=18, seed=0):
    """2-D 5-point laplacian + jitter: banded like RCM-ordered FEM."""
    n = n_side * n_side
    a = sp.diags(
        [4.0, -1.0, -1.0, -1.0, -1.0],
        [0, -1, 1, -n_side, n_side],
        shape=(n, n),
        format="csr",
    )
    rng = np.random.default_rng(seed)
    d = sp.diags(rng.uniform(0.5, 1.5, n))
    return sp.csr_matrix(d @ a @ d)


def test_multi_spmv_matches_scipy_and_single():
    a = _fem_like()
    g = build_gsel_csr(a)
    rng = np.random.default_rng(1)
    k = 5
    xs = rng.standard_normal((k, a.shape[1])).astype(np.float32)
    got = np.asarray(gsel_spmv_multi_xla(g, jnp.asarray(xs)))
    for j in range(k):
        want = a @ xs[j]
        np.testing.assert_allclose(got[j], want, rtol=2e-5, atol=1e-5)
        # bit-for-bit vs the single-RHS XLA path
        one = np.asarray(gsel_spmv_xla(g, jnp.asarray(xs[j])))
        np.testing.assert_array_equal(got[j], one)


def test_multi_spmv_pallas_interpret():
    a = _fem_like(12)
    g = build_gsel_csr(a)
    rng = np.random.default_rng(2)
    xs = rng.standard_normal((3, a.shape[1])).astype(np.float32)
    got = np.asarray(gsel_spmv_multi_pallas(g, jnp.asarray(xs), interpret=True))
    want = np.asarray(gsel_spmv_multi_xla(g, jnp.asarray(xs)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_multi_spmv_window2():
    a = _fem_like(14, seed=3)
    g = build_gsel_csr(a, window=2)
    assert g.window == 2
    rng = np.random.default_rng(3)
    xs = rng.standard_normal((4, a.shape[1])).astype(np.float32)
    got = np.asarray(gsel_spmv_multi_pallas(g, jnp.asarray(xs), interpret=True))
    for j in range(4):
        np.testing.assert_allclose(got[j], a @ xs[j], rtol=2e-5, atol=1e-5)


def test_pcg_multi_matches_single_columns():
    """Per-column iteration counts and solutions equal k single solves."""
    a = _fem_like(16, seed=4)
    n = a.shape[0]
    g = build_gsel_csr(a)
    rng = np.random.default_rng(4)
    k = 4
    b = rng.standard_normal((n, k)).astype(np.float32)
    # scale columns so they converge at different iterations
    b[:, 1] *= 100.0
    b[:, 2] = a @ np.ones(n)  # easy column
    res = pcg_gsel_multi(g, jnp.asarray(b), rtol=1e-6, max_iter=500,
                         impl="xla")
    assert res.x.shape == (n, k)
    iters = np.asarray(res.iters)
    assert np.all(np.asarray(res.converged))
    for j in range(k):
        one = pcg_gsel(g, jnp.asarray(b[:, j]), rtol=1e-6, max_iter=500,
                       dot_dtype="chunk64", impl="xla")
        assert int(one.iters) == int(iters[j]), (j, int(one.iters), iters[j])
        np.testing.assert_allclose(
            np.asarray(res.x[:, j]).ravel(),
            np.asarray(one.x).ravel(),
            rtol=2e-4, atol=2e-4,
        )
        # true residual check vs scipy
        rr = np.linalg.norm(b[:, j] - a @ np.asarray(res.x[:, j]).ravel())
        assert rr / np.linalg.norm(b[:, j]) < 5e-6
    # column 2 (well-scaled rhs in range(A)) converges earliest: masking
    # must have frozen it while others ran on
    assert iters[2] < iters.max()


def test_pcg_multi_spai_preconditioned():
    a = _fem_like(14, seed=5)
    n = a.shape[0]
    g = build_gsel_csr(a)
    # identity-ish factor: L = diag(1/sqrt(diag(A))) as a crude SPAI
    l = sp.diags(1.0 / np.sqrt(a.diagonal())).tocsr()
    gl = build_gsel_csr(l)
    glt = build_gsel_csr(sp.csr_matrix(l.T))
    prec = GselSpaiPrec(l_fwd=gl, l_t=glt, epsilon=jnp.float32(3e-3),
                        impl="xla")
    rng = np.random.default_rng(5)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    res = pcg_gsel_multi(g, jnp.asarray(b), prec=prec, rtol=1e-6,
                         max_iter=500, impl="xla")
    assert np.all(np.asarray(res.converged))
    plain = pcg_gsel_multi(g, jnp.asarray(b), rtol=1e-6, max_iter=500,
                           impl="xla")
    # Jacobi-like SPAI must beat unpreconditioned on this row-scaled A
    assert np.asarray(res.iters).max() < np.asarray(plain.iters).max()
    for j in range(3):
        one = pcg_gsel(g, jnp.asarray(b[:, j]), prec=prec, rtol=1e-6,
                       max_iter=500, dot_dtype="chunk64", impl="xla")
        assert int(one.iters) == int(np.asarray(res.iters)[j])
