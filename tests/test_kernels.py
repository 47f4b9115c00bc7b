"""SpMV / SPAI kernel tests vs scipy dense oracles, incl. gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpu_spai.kernels import spai_apply, llt_apply, spmv, spmv_coo, spmv_t
from tpu_spai.sparse import csr_to_graph, random_spd_graph


def _spd(rng, n=36, b=1, density=0.15):
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = sp.csr_matrix(m @ m.T + 2.0 * sp.eye(n))
    a.sort_indices()
    return csr_to_graph(a, block_size=b), a


def test_spmv_scalar_matches_scipy(rng):
    g, a = _spd(rng)
    x = rng.standard_normal(a.shape[0])
    y = spmv(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y).ravel(), a @ x, rtol=1e-12)


def test_spmv_block_matches_scipy(rng):
    g, a = _spd(rng, n=36, b=3)
    x = rng.standard_normal(36)
    y = spmv(g, jnp.asarray(x.reshape(-1, 3)))
    np.testing.assert_allclose(np.asarray(y).ravel(), a @ x, rtol=1e-12)


def test_spmv_coo_equals_ell(rng):
    g, a = _spd(rng, n=30, b=3)
    x = jnp.asarray(rng.standard_normal((10, 3)))
    np.testing.assert_allclose(
        np.asarray(spmv_coo(g, x)), np.asarray(spmv(g, x)), rtol=1e-12
    )


def test_spmv_transpose(rng):
    g, a = _spd(rng, n=24, b=2)
    # non-symmetric values on symmetric pattern: use random blocks
    blocks = jnp.asarray(rng.standard_normal(g.blocks.shape))
    g = g.with_blocks(blocks)
    from tpu_spai.sparse import graph_to_csr

    amat = graph_to_csr(
        np.stack([np.asarray(g.edge_row), np.asarray(g.edge_col)]), blocks, 24
    )
    x = rng.standard_normal(24)
    yt = spmv_t(g, jnp.asarray(x.reshape(-1, 2)))
    np.testing.assert_allclose(np.asarray(yt).ravel(), amat.T @ x, rtol=1e-11)
    # COO path too
    yt2 = spmv_coo(g, jnp.asarray(x.reshape(-1, 2)), transpose=True)
    np.testing.assert_allclose(np.asarray(yt2).ravel(), amat.T @ x, rtol=1e-11)


def test_spai_apply_dense_oracle(rng):
    g, a = _spd(rng, n=30, b=3)
    blocks = jnp.asarray(rng.standard_normal(g.blocks.shape))
    gl = g.with_blocks(blocks)
    from tpu_spai.sparse import graph_to_csr

    lmat = graph_to_csr(
        np.stack([np.asarray(gl.edge_row), np.asarray(gl.edge_col)]), blocks, 30
    ).toarray()
    x = rng.standard_normal(30)
    eps = 3e-3
    want = eps * x + lmat @ (lmat.T @ x)
    got = spai_apply(gl, jnp.asarray(x.reshape(-1, 3)), epsilon=eps)
    np.testing.assert_allclose(np.asarray(got).ravel(), want, rtol=1e-11)
    # scaled variant
    diag = np.abs(rng.standard_normal(30)) + 0.5
    want_s = eps * diag * x + lmat @ (diag * (lmat.T @ x))
    got_s = spai_apply(
        gl,
        jnp.asarray(x.reshape(-1, 3)),
        epsilon=eps,
        diag=jnp.asarray(diag.reshape(-1, 3)),
    )
    np.testing.assert_allclose(np.asarray(got_s).ravel(), want_s, rtol=1e-11)
    # LLT
    want_l = lmat @ (lmat.T @ x)
    got_l = llt_apply(gl, jnp.asarray(x.reshape(-1, 3)))
    np.testing.assert_allclose(np.asarray(got_l).ravel(), want_l, rtol=1e-11)


def test_spai_mask(rng):
    g, a = _spd(rng, n=20)
    x = jnp.asarray(rng.standard_normal((20, 1)))
    mask = np.ones((20, 1))
    mask[[2, 5]] = 0
    got = spai_apply(g, x, epsilon=1e-2, mask=jnp.asarray(mask))
    # masked spmv zeroes rows of each product; eps*x is NOT masked
    # (matches reference AATPE: mask applies inside GraphSpmv only)
    lm = a.toarray() * mask.ravel()[:, None] * 1  # row-masked after each spmv
    inner = (a.T.toarray() @ np.asarray(x).ravel()) * mask.ravel()
    want = 1e-2 * np.asarray(x).ravel() + (a.toarray() @ inner) * mask.ravel()
    np.testing.assert_allclose(np.asarray(got).ravel(), want, rtol=1e-11)


def test_spai_grad_flows(rng):
    """The training loss backprops through both SpMVs (AATPE)."""
    g, a = _spd(rng, n=18, b=1)
    x = jnp.asarray(rng.standard_normal((18, 1)))

    def loss(blocks):
        y = spai_apply(g.with_blocks(blocks), x, epsilon=3e-3)
        return jnp.sum(y**2)

    grads = jax.grad(loss)(g.blocks)
    assert np.isfinite(np.asarray(grads)).all()
    # finite-difference check on one coordinate
    e0 = np.zeros(g.blocks.shape)
    e0[0, 0, 0] = 1.0
    h = 1e-6
    fd = (loss(g.blocks + h * e0) - loss(g.blocks - h * e0)) / (2 * h)
    np.testing.assert_allclose(np.asarray(grads)[0, 0, 0], fd, rtol=1e-5)
