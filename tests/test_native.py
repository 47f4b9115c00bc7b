"""Native host kernels: IC0/FSAI/AINV factorizations + FEM assembly."""

import numpy as np
import scipy.sparse as sp

from tpu_spai import native
from tpu_spai.solver.host_baselines import get_cg_iter_time, get_pcg_iter_time


def _spd(rng, n=120, density=0.05, shift=2.0):
    m = sp.random(n, n, density=density, random_state=rng)
    a = sp.csr_matrix(m @ m.T + shift * sp.eye(n))
    a.sort_indices()
    return a


def test_ic0_dense_parity(rng):
    """On a dense SPD matrix IC0 == exact Cholesky."""
    n = 30
    m = rng.standard_normal((n, n))
    a = sp.csr_matrix(m @ m.T + n * np.eye(n))
    lfac = native.ic0(a)
    np.testing.assert_allclose(
        lfac.toarray(), np.linalg.cholesky(a.toarray()), rtol=1e-9, atol=1e-9
    )


def test_ic0_reduces_cg_iters(rng):
    a = _spd(rng, n=300, density=0.02, shift=0.5)
    gt = np.ones(300)
    it_none, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="none")
    it_ic, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="ic")
    assert it_ic < it_none


def test_fsai_reduces_cg_iters(rng):
    a = _spd(rng, n=300, density=0.02, shift=0.5)
    gt = np.ones(300)
    it_none, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="none")
    it_fsai, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="fsai")
    assert it_fsai < it_none


def test_fsai_dense_is_inverse_chol(rng):
    """With a dense pattern, FSAI G == inv(chol(A)) so G A G^T == I."""
    n = 20
    m = rng.standard_normal((n, n))
    a = sp.csr_matrix(m @ m.T + n * np.eye(n))
    g = native.fsai(a).toarray()
    np.testing.assert_allclose(g @ a.toarray() @ g.T, np.eye(n), atol=1e-8)


def test_ainv_factors_inverse(rng):
    """Zero drop tolerance => Z diag(1/p) Z^T == A^{-1} exactly."""
    n = 40
    m = rng.standard_normal((n, n))
    a = sp.csr_matrix(m @ m.T + n * np.eye(n))
    z, p = native.ainv(a, droptol=0.0)
    approx = z @ sp.diags(1.0 / p) @ z.T
    np.testing.assert_allclose(approx.toarray(), np.linalg.inv(a.toarray()), atol=1e-8)


def test_ainv_reduces_cg_iters(rng):
    a = _spd(rng, n=300, density=0.02, shift=0.5)
    gt = np.ones(300)
    it_none, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="none")
    it_ainv, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="ainv")
    assert it_ainv < it_none


def test_spai_harness(rng):
    a = _spd(rng, n=200, density=0.03, shift=1.0)
    gt = np.ones(200)
    # identity factor + eps=1 is plain CG scaled: same iteration count class
    eye = sp.csr_matrix(sp.eye(200))
    it, tp, ts = get_pcg_iter_time(a, gt, eye, epsilon=0.0, rtol=1e-8)
    it_none, _, _ = get_cg_iter_time(a, gt, rtol=1e-8, method="none")
    assert abs(it - it_none) <= 2


def test_fem_tet_laplacian_unit_cube():
    """Single reference tet: stiffness rows sum to zero, mass = vol/4."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64
    )
    elems = np.array([[0, 1, 2, 3]], dtype=np.int32)
    lap, mass = native.assemble_p1(verts, elems)
    ld = lap.toarray()
    np.testing.assert_allclose(ld.sum(axis=1), 0, atol=1e-14)
    np.testing.assert_allclose(ld, ld.T, atol=1e-14)
    vol = 1.0 / 6.0
    np.testing.assert_allclose(mass, vol / 4.0)
    # eigenvalues nonnegative (PSD)
    w = np.linalg.eigvalsh(ld)
    assert w.min() > -1e-12


def test_fem_tri_cotan(rng):
    """Triangle Laplacian matches the cotan formula."""
    verts = np.array([[0, 0, 0], [2, 0, 0], [0.3, 1.7, 0]], dtype=np.float64)
    elems = np.array([[0, 1, 2]], dtype=np.int32)
    lap, mass = native.assemble_p1(verts, elems)
    # cotan weights: L[i,j] = -cot(angle opposite edge ij)/2
    p = verts

    def cot(a, b, c):  # angle at a
        u, v = p[b] - p[a], p[c] - p[a]
        cosang = u @ v
        sinang = np.linalg.norm(np.cross(u, v))
        return cosang / sinang

    want01 = -cot(2, 0, 1) / 2
    np.testing.assert_allclose(lap.toarray()[0, 1], want01, rtol=1e-12)
    np.testing.assert_allclose(lap.toarray().sum(axis=1), 0, atol=1e-13)


def test_fem_field_scaling():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float64
    )
    elems = np.array([[0, 1, 2, 3]], dtype=np.int32)
    l1, _ = native.assemble_p1(verts, elems, field=np.array([3.0]))
    l0, _ = native.assemble_p1(verts, elems)
    np.testing.assert_allclose(l1.toarray(), 3 * l0.toarray(), rtol=1e-14)


def test_ainv_bounded_fill():
    """Round-4: lfil bounds per-column fill and keeps the factorization
    usable; small-system behavior (lfil=0) is unchanged."""
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import ainv, laplacian, lumped_mass

    nodes, elems = unit_box_tet(7, 7, 7)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    a.sort_indices()
    z0, p0 = ainv(a, droptol=0.05, lfil=0)
    z1, p1 = ainv(a, droptol=0.05, lfil=8)
    n = a.shape[0]
    # the bound holds per column (csr-of-transpose: per row)
    assert np.diff(sp.csc_matrix(z1).indptr).max() <= 8
    assert z1.nnz <= z0.nnz
    # both factors still precondition (bounded is weaker but works)
    b = a @ np.ones(n)
    for z, p in ((z0, p0), (z1, p1)):
        zt = sp.csr_matrix(z.T)
        pinv = 1.0 / p
        it = 0

        def cb(_):
            nonlocal it
            it += 1

        op = spla.LinearOperator(
            a.shape, matvec=lambda x: z @ (pinv * (zt @ x)),
            dtype=np.float64,
        )
        x, info = spla.cg(a, b, M=op, rtol=1e-6, atol=0.0,
                          maxiter=5000, callback=cb)
        assert info == 0 and it < 400, (info, it)
