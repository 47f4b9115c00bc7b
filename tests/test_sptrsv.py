"""Level-scheduled device SpTRSV (kernels/sptrsv.py) vs scipy oracles."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from tpu_spai.bench.roofline import build_heat
from tpu_spai.kernels.sptrsv import (
    IcPrec,
    build_ic_planes,
    level_schedule,
    sptrsv_solve,
    sptrsv_solve_xla,
)
from tpu_spai.native import ic0


def _factor(res=10):
    a = build_heat(res)
    lf = sp.csr_matrix(ic0(a))
    lf.sort_indices()
    return a, lf


def test_level_schedule_topological():
    _, lf = _factor(8)
    lev = level_schedule(lf.indptr, lf.indices, lf.shape[0])
    coo = sp.tril(lf, k=-1).tocoo()
    assert (lev[coo.row] > lev[coo.col]).all()


def test_forward_backward_solve_match_scipy():
    a, lf = _factor(10)
    n = a.shape[0]
    fwd, bwd, ppos = build_ic_planes(lf)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    bp = np.zeros(fwd.n_pad, np.float32)
    bp[ppos] = b
    y = np.asarray(sptrsv_solve_xla(fwd, jnp.asarray(bp)))
    y_ref = spla.spsolve_triangular(lf, b, lower=True)
    err = np.linalg.norm(y[ppos] - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-5, err

    z = np.asarray(sptrsv_solve_xla(bwd, jnp.asarray(y)))
    z_ref = spla.spsolve_triangular(
        sp.csr_matrix(lf.T), y_ref, lower=False
    )
    err2 = np.linalg.norm(z[ppos] - z_ref) / np.linalg.norm(z_ref)
    assert err2 < 1e-4, err2


def test_pallas_interpret_matches_xla():
    _, lf = _factor(8)
    fwd, bwd, ppos = build_ic_planes(lf)
    rng = np.random.default_rng(1)
    bp = jnp.asarray(
        rng.standard_normal(fwd.n_pad).astype(np.float32)
    )
    for p in (fwd, bwd):
        xi = np.asarray(sptrsv_solve(p, bp, interpret=True))
        xx = np.asarray(sptrsv_solve_xla(p, bp))
        np.testing.assert_allclose(xi, xx, rtol=2e-5, atol=2e-6)


def test_ic_pcg_device_iterations():
    """Full IC0-preconditioned device CG in the shared padded layout:
    iteration count must match the host scipy IC0-PCG (fp64) within a
    small band."""
    from tpu_spai.solver import build_gsel_csr, pcg_gsel
    from tpu_spai.solver.host_baselines import get_cg_iter_time

    a, lf = _factor(10)
    n = a.shape[0]
    fwd, bwd, ppos = build_ic_planes(lf)
    n_pad = fwd.n_pad
    # A in the padded level-major layout (zero rows at padding)
    coo = a.tocoo()
    a_pad = sp.csr_matrix(
        (coo.data, (ppos[coo.row], ppos[coo.col])), shape=(n_pad, n_pad)
    )
    ga = build_gsel_csr(a_pad)
    assert ga is not None
    xstar = np.random.default_rng(2).standard_normal(n)
    b = a @ xstar
    bp = np.zeros(n_pad)
    bp[ppos] = b
    prec = IcPrec(fwd, bwd, impl="xla")
    res = pcg_gsel(
        ga, jnp.asarray(bp, jnp.float32), prec=prec, rtol=1e-6,
        max_iter=2000, impl="xla", dot_dtype=jnp.float64,
    )
    assert bool(res.converged)
    x = np.asarray(res.x).reshape(-1)[ppos]
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 5e-3, rel  # f32 attainable-accuracy plateau

    it_host, _, _ = get_cg_iter_time(a, xstar, rtol=1e-6, method="ic")
    assert abs(int(res.iters) - it_host) <= max(3, 0.15 * it_host), (
        int(res.iters), it_host,
    )


def test_ic_layout_cache_matches_direct():
    # VERDICT r3 item 8: the cached-layout fill must reproduce the
    # direct build bit-for-bit (pattern-only schedule + O(nnz) gather)
    import numpy as np
    import scipy.sparse as sp

    from tpu_spai.kernels.sptrsv import build_ic_layout, build_ic_planes
    from tpu_spai.native import ic0
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(6, 6, 6)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    a.sort_indices()
    l1 = sp.csr_matrix(ic0(a))
    l1.sort_indices()
    f_d, b_d, pp_d = build_ic_planes(l1)
    lay = build_ic_layout(l1)
    f_c, b_c, pp_c = build_ic_planes(l1, layout=lay)
    np.testing.assert_array_equal(pp_d, pp_c)
    for d, c in ((f_d, f_c), (b_d, b_c)):
        np.testing.assert_array_equal(np.asarray(d.vals), np.asarray(c.vals))
        np.testing.assert_array_equal(
            np.asarray(d.inv_diag), np.asarray(c.inv_diag))
        np.testing.assert_array_equal(
            np.asarray(d.onehot), np.asarray(c.onehot))
        assert (d.q_chunks, d.k_width, d.n_levels) == (
            c.q_chunks, c.k_width, c.n_levels)
    # a second factor with DIFFERENT values on the same pattern
    a2 = (a * 1.7 + sp.diags(0.3 * np.ones(a.shape[0]))).tocsr()
    a2.sort_indices()
    l2 = sp.csr_matrix(ic0(a2))
    l2.sort_indices()
    f2_d, _, _ = build_ic_planes(l2)
    f2_c, _, _ = build_ic_planes(l2, layout=lay)
    np.testing.assert_array_equal(
        np.asarray(f2_d.vals), np.asarray(f2_c.vals))
