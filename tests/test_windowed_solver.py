"""Windowed solver integration on CPU (xla impl): SPAI prec + mixed mode."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.native import fsai, laplacian, lumped_mass
from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.solver import pcg
from tpu_spai.solver.windowed import (
    WindowedSpaiPrec,
    build_windowed_graph,
    pcg_windowed,
)
from tpu_spai.sparse import csr_to_graph


def _system(rng):
    nodes, elems = unit_box_tet(6, 6, 6)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    return ap


def test_windowed_pcg_matches_gather_f64(rng):
    ap = _system(rng)
    g = csr_to_graph(ap, dtype=np.float64)
    wa, _ = build_windowed_graph(g, tile=64)
    xstar = rng.standard_normal(ap.shape[0])
    b = jnp.asarray(ap @ xstar)
    rw = pcg_windowed(wa, b, rtol=1e-10, max_iter=5000, impl="xla")
    rg = pcg(g, b, rtol=1e-10, max_iter=5000)
    assert int(rw.iters) == int(rg.iters)
    np.testing.assert_allclose(
        np.asarray(rw.x).ravel(), xstar, rtol=1e-6, atol=1e-8
    )


def test_windowed_spai_prec_reduces_iters(rng):
    ap = _system(rng)
    g = csr_to_graph(ap, dtype=np.float64)
    wa, _ = build_windowed_graph(g, tile=64)
    lfac = sp.csr_matrix(fsai(ap).T)
    wl = build_windowed_graph(
        csr_to_graph(lfac, dtype=np.float64), tile=64, transpose_too=True
    )
    b = jnp.asarray(ap @ rng.standard_normal(ap.shape[0]))
    prec = WindowedSpaiPrec(wl[0], wl[1], jnp.asarray(1e-8), impl="xla")
    r0 = pcg_windowed(wa, b, rtol=1e-8, max_iter=5000, impl="xla")
    r1 = pcg_windowed(wa, b, prec=prec, rtol=1e-8, max_iter=5000, impl="xla")
    assert bool(r1.converged)
    assert int(r1.iters) < int(r0.iters)


def test_windowed_mixed_mode(rng):
    ap = _system(rng)
    g32 = csr_to_graph(ap, dtype=np.float32)
    wa, _ = build_windowed_graph(g32, tile=64)
    xstar = rng.standard_normal(ap.shape[0])
    b = jnp.asarray(ap @ xstar, dtype=jnp.float64)
    r = pcg_windowed(wa, b, rtol=1e-6, max_iter=5000, impl="xla", mixed=True)
    assert bool(r.converged)
    err = np.linalg.norm(np.asarray(r.x).ravel() - xstar) / np.linalg.norm(xstar)
    assert err < 1e-4
