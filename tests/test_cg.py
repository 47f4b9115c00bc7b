"""PCG solver tests: correctness vs scipy, iterate parity, preconditioners."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpu_spai.sparse import csr_to_graph
from tpu_spai.solver import (
    identity_prec,
    jacobi_prec,
    pcg,
    pcg_trace,
    spai_prec,
    extract_diagonal,
)


def _spd(rng, n=120, density=0.05, shift=1.0, b=1):
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = sp.csr_matrix(m @ m.T + shift * sp.eye(n))
    a.sort_indices()
    return csr_to_graph(a, block_size=b), a


def test_cg_solves(rng):
    g, a = _spd(rng)
    xstar = rng.standard_normal(a.shape[0])
    b = a @ xstar
    res = pcg(g, jnp.asarray(b), rtol=1e-10, max_iter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), xstar, rtol=1e-6, atol=1e-7)


def test_cg_block_solves(rng):
    g, a = _spd(rng, n=120, b=3)
    xstar = rng.standard_normal(120)
    b = a @ xstar
    res = pcg(g, jnp.asarray(b.reshape(-1, 3)), rtol=1e-10, max_iter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x).ravel(), xstar, rtol=1e-6, atol=1e-7)


def test_cg_iterate_parity_with_scipy(rng):
    """fp64 iterate-for-iterate residual parity with scipy's CG."""
    g, a = _spd(rng, n=80, density=0.08)
    b = rng.standard_normal(80)
    n_iter = 25
    _, hist = pcg_trace(g, jnp.asarray(b), n_iter=n_iter)

    # scipy residual history (scipy cg with explicit callback on xk)
    res_hist = []
    xk_hist = []

    def cb(xk):
        xk_hist.append(xk.copy())
        res_hist.append(np.linalg.norm(b - a @ xk))

    spla.cg(a, b, rtol=0.0, atol=1e-300, maxiter=n_iter, callback=cb)
    ours = np.asarray(hist)[: len(res_hist)]
    # identical recurrence => tight parity early; tail differs only by
    # roundoff relative to the *initial* residual scale
    # recurrence residual (ours) vs true residual (scipy callback) drift
    # apart by accumulated roundoff ~ kappa*eps relative to the initial
    # scale once the residual is tiny; assert parity above that floor.
    np.testing.assert_allclose(ours, res_hist, rtol=1e-4, atol=1e-7 * res_hist[0])


def test_jacobi_reduces_iters(rng):
    # badly scaled SPD
    n = 150
    d = np.logspace(0, 4, n)
    m = sp.random(n, n, density=0.03, random_state=rng)
    a = sp.csr_matrix(m @ m.T + sp.diags(d))
    a.sort_indices()
    g = csr_to_graph(a)
    b = a @ rng.standard_normal(n)
    r0 = pcg(g, jnp.asarray(b), rtol=1e-8, max_iter=5000)
    r1 = pcg(g, jnp.asarray(b), prec=jacobi_prec(g), rtol=1e-8, max_iter=5000)
    assert bool(r1.converged)
    assert int(r1.iters) < int(r0.iters)


def test_extract_diagonal(rng):
    g, a = _spd(rng, n=60, b=3)
    d = extract_diagonal(g)
    np.testing.assert_allclose(np.asarray(d).ravel(), a.diagonal(), rtol=1e-14)


def test_spai_preconditioner_with_true_inverse_factor(rng):
    """With L = chol(A^{-1}) (dense), SPAI-CG should converge very fast."""
    n = 60
    m = sp.random(n, n, density=0.08, random_state=rng)
    a = sp.csr_matrix(m @ m.T + 2.0 * sp.eye(n))
    a.sort_indices()
    g = csr_to_graph(a)
    ainv = np.linalg.inv(a.toarray())
    lfac = np.linalg.cholesky(ainv)
    gl = csr_to_graph(sp.csr_matrix(lfac))
    b = a @ rng.standard_normal(n)
    prec = spai_prec(gl, epsilon=1e-8)
    res = pcg(g, jnp.asarray(b), prec=prec, rtol=1e-8, max_iter=100)
    assert bool(res.converged)
    assert int(res.iters) <= 5  # near-exact inverse => a few iterations
    res0 = pcg(g, jnp.asarray(b), rtol=1e-8, max_iter=1000)
    assert int(res.iters) < int(res0.iters)


def test_cg_fp32_and_mixed(rng):
    g, a = _spd(rng, n=100)
    b = a @ rng.standard_normal(100)
    g32 = g.astype(jnp.float32)
    b32 = jnp.asarray(b, dtype=jnp.float32)
    r32 = pcg(g32, b32, rtol=1e-5, max_iter=3000)
    assert bool(r32.converged)
    rmix = pcg(g32, b32, rtol=1e-5, max_iter=3000, dot_dtype=jnp.float64)
    assert bool(rmix.converged)
    assert int(rmix.iters) <= int(r32.iters) + 5


def test_cg_zero_rhs(rng):
    g, _ = _spd(rng, n=40)
    res = pcg(g, jnp.zeros(40), rtol=1e-6, max_iter=100)
    assert bool(res.converged)
    assert int(res.iters) == 0
    np.testing.assert_array_equal(np.asarray(res.x), 0)
