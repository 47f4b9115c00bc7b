"""Single-dispatch fused construction (+solve) — gnn/construct.py.

Parity: SlotConstructor.construct() must equal the eager
slotted_gnn_forward -> expand_block_planes -> scale/add chain; the fused
construct_and_solve program must solve the system to the requested true
rtol (round-3 relay-overhead fix, output/r3_relay_cost.json)."""

import dataclasses

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpu_spai.gnn.construct import SlotConstructor
from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import slot_scatter, slotted_gnn_forward
from tpu_spai.gnn.slotted_block import (
    build_block_slot_layout,
    expand_block_planes,
    scalar_scale_add,
)
from tpu_spai.solver.gsel_solver import build_gsel_csr
from tpu_spai.sparse.convert import graph_to_csr


def _heat(res=8):
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    return ap


def _setup(res=8, seed=0):
    ap = _heat(res)
    n = ap.shape[0]
    coo = ap.tocoo()
    rows, cols = coo.row, coo.col
    rng = np.random.default_rng(seed)
    nf = np.stack([ap.diagonal(), np.ones(n)], axis=1).astype(np.float32)
    ef = np.stack(
        [coo.data, (rows == cols).astype(np.float64)], axis=1
    ).astype(np.float32)
    mask = (rng.random(n) > 0.1).astype(np.float64)

    gnn = NodeEdgeProcessing(edge_out_features=1, num_mp_layers=2)
    ei = jnp.asarray(np.stack([rows, cols]).astype(np.int32))
    params = gnn.init(jax.random.key(1), jnp.asarray(nf), ei, jnp.asarray(ef))

    layout = build_block_slot_layout(rows, cols, n, 1)
    assert layout is not None
    e_fwd = slot_scatter(layout.sg, ef)
    e_rev = slot_scatter(layout.sg, ef, reverse=True)
    sf, af, sr, ar = scalar_scale_add(layout, mask)
    sc = SlotConstructor(
        layout, params, jnp.asarray(nf), e_fwd, e_rev, sf, af, sr, ar,
        gnn_impl="xla", bb=1,
    )
    return ap, n, rows, cols, ef, mask, params, layout, sc


def test_fused_construct_matches_eager():
    ap, n, rows, cols, ef, mask, params, layout, sc = _setup()
    vf_fused, vr_fused = sc.construct()

    e_fwd = slot_scatter(layout.sg, ef)
    e_rev = slot_scatter(layout.sg, ef, reverse=True)
    _, pf, pr = slotted_gnn_forward(
        params, layout.sg, sc.ops[0], e_fwd, e_rev, impl="xla",
        out_channels=1,
    )
    vf, vr = expand_block_planes(layout, pf[:, None], pr[:, None])
    sf, af, sr, ar = scalar_scale_add(layout, mask)
    np.testing.assert_allclose(
        np.asarray(vf_fused), np.asarray(vf * sf + af), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(vr_fused), np.asarray(vr * sr + ar), rtol=1e-6, atol=1e-7
    )


def test_fused_construct_and_solve():
    ap, n, rows, cols, ef, mask, params, layout, sc = _setup()
    # masked system (Dirichlet convention of graph_to_csr)
    coo = ap.tocoo()
    blocks = coo.data.reshape(-1, 1, 1)
    a_m = graph_to_csr(np.stack([rows, cols]), blocks, n, mask=mask)

    # system planes on the layout grid, double-single for the rr anchor
    blocks64 = coo.data.astype(np.float64).reshape(-1, 1)
    b_hi = blocks64.astype(np.float32)
    ap_sc = slot_scatter(layout.sg, b_hi)
    a_vf, _ = expand_block_planes(layout, ap_sc, ap_sc)
    lo = (blocks64 - b_hi.astype(np.float64)).astype(np.float32)
    lo_sc = slot_scatter(layout.sg, lo)
    a_lo, _ = expand_block_planes(layout, lo_sc, lo_sc)
    s_sys, a_sys, _, _ = scalar_scale_add(layout, mask)
    g_a = dataclasses.replace(
        layout.pattern, vals=a_vf * s_sys + a_sys, vals_lo=a_lo * s_sys
    )

    xstar = np.random.default_rng(3).standard_normal(n) * mask
    b = a_m @ xstar
    x64, iters, relres, conv, _reb = sc.construct_and_solve(
        g_a, jnp.asarray(b), epsilon=1.0, rtol=1e-6, max_iter=5 * n,
        impl="xla", spmv_precision="f32",
    )
    x = np.asarray(x64).reshape(-1)[:n]
    assert bool(conv), (int(iters), float(relres))
    true = np.linalg.norm(a_m @ x - b) / np.linalg.norm(b)
    assert true < 5e-6, true


def test_fused_construct_and_solve_ds_tier():
    """Round 5: the fused path's full-ds escalation tier
    (spmv_precision='ds' -> ds A-matvec AND ds factor applies over
    exact-zero lo planes) converges on the TRUE residual."""
    ap, n, rows, cols, ef, mask, params, layout, sc = _setup()
    coo = ap.tocoo()
    blocks = coo.data.reshape(-1, 1, 1)
    a_m = graph_to_csr(np.stack([rows, cols]), blocks, n, mask=mask)
    blocks64 = coo.data.astype(np.float64).reshape(-1, 1)
    b_hi = blocks64.astype(np.float32)
    ap_sc = slot_scatter(layout.sg, b_hi)
    a_vf, _ = expand_block_planes(layout, ap_sc, ap_sc)
    lo = (blocks64 - b_hi.astype(np.float64)).astype(np.float32)
    lo_sc = slot_scatter(layout.sg, lo)
    a_lo, _ = expand_block_planes(layout, lo_sc, lo_sc)
    s_sys, a_sys, _, _ = scalar_scale_add(layout, mask)
    g_a = dataclasses.replace(
        layout.pattern, vals=a_vf * s_sys + a_sys, vals_lo=a_lo * s_sys
    )
    xstar = np.random.default_rng(3).standard_normal(n) * mask
    b = a_m @ xstar
    x64, iters, relres, conv, _reb = sc.construct_and_solve(
        g_a, jnp.asarray(b), epsilon=1.0, rtol=1e-6, max_iter=5 * n,
        impl="xla", spmv_precision="ds",
    )
    x = np.asarray(x64).reshape(-1)[:n]
    assert bool(conv), (int(iters), float(relres))
    true = np.linalg.norm(a_m @ x - b) / np.linalg.norm(b)
    assert true < 5e-6, true
