"""Block-matrix (b=3) slot-layout inference: parity with the host
factor-assembly path (workspace factor_csr semantics) on shared params."""

import dataclasses

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import slot_scatter, slotted_gnn_forward
from tpu_spai.gnn.slotted_block import (
    build_block_slot_layout,
    expand_block_planes,
    scalar_scale_add,
)
from tpu_spai.kernels.gsel import gsel_spmv_xla
from tpu_spai.sparse.convert import graph_to_csr


B = 3


def _block_graph(res=4, seed=0):
    """Small tet-mesh pattern used as the BLOCK graph; random 3x3 blocks."""
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    a.sort_indices()
    coo = a.tocoo()
    rng = np.random.default_rng(seed)
    n_b, e = a.shape[0], a.nnz
    blocks = rng.standard_normal((e, B, B)).astype(np.float32)
    # symmetric blocks: block(c,r) = block(r,c)^T (SPD-matrix convention)
    order_f = np.lexsort((coo.col, coo.row))
    order_r = np.lexsort((coo.row, coo.col))
    rev_of = np.empty(e, dtype=np.int64)
    rev_of[order_f] = np.arange(e)[order_r]
    blocks = 0.5 * (blocks + blocks[rev_of].transpose(0, 2, 1))
    node_feats = rng.standard_normal((n_b, 2)).astype(np.float32)
    mask = (rng.random((n_b, B)) > 0.15).astype(np.float64)
    rsqrt = rng.uniform(0.5, 2.0, (n_b, B))
    return coo.row, coo.col, blocks, n_b, node_feats, mask, rsqrt


def _spmv_planes(pattern, vals, x):
    return np.asarray(
        gsel_spmv_xla(
            dataclasses.replace(pattern, vals=jnp.asarray(vals)),
            jnp.asarray(x, jnp.float32),
        )
    )


@pytest.mark.parametrize("window", [1, 2])
def test_system_expansion_matches_csr(window):
    rows, cols, blocks, n_b, _, mask, _ = _block_graph()
    layout = build_block_slot_layout(rows, cols, n_b, B, window=window)
    assert layout is not None
    n_s = n_b * B
    ei = np.stack([rows, cols])
    a_csr = graph_to_csr(ei, blocks.astype(np.float64), n_s, mask=mask)

    ap_sc = slot_scatter(layout.sg, blocks.reshape(-1, B * B))
    a_vals, _ = expand_block_planes(layout, ap_sc, ap_sc)
    s_sys, a_sys, _, _ = scalar_scale_add(layout, mask.reshape(-1))
    x = np.random.default_rng(1).standard_normal(n_s)
    got = _spmv_planes(layout.pattern, a_vals * s_sys + a_sys, x)
    np.testing.assert_allclose(got[:n_s], a_csr @ x, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("scaled", [False, True])
def test_block_slotted_factor_parity(scaled):
    rows, cols, blocks, n_b, nf, mask, rsqrt = _block_graph()
    n_s = n_b * B
    e = len(rows)
    ef = blocks.reshape(e, B * B)  # matrix-as-edge-feature, 9 channels

    gnn = NodeEdgeProcessing(edge_out_features=B * B, num_mp_layers=2)
    ei = jnp.asarray(np.stack([rows, cols]).astype(np.int32))
    params = gnn.init(jax.random.key(0), jnp.asarray(nf), ei, jnp.asarray(ef))
    _, edge_ref = gnn.apply(params, jnp.asarray(nf), ei, jnp.asarray(ef))

    # host-path oracle: predicted blocks -> (optional rsqrt fold) ->
    # masked fp64 CSR (workspace.factor_csr semantics)
    pred = np.asarray(edge_ref, np.float64).reshape(e, B, B)
    if scaled:
        pred = pred * rsqrt[cols][:, None, :]
    l_csr = graph_to_csr(np.stack([rows, cols]), pred, n_s, mask=mask)

    layout = build_block_slot_layout(rows, cols, n_b, B)
    assert layout is not None
    e_fwd = slot_scatter(layout.sg, ef)
    e_rev = slot_scatter(layout.sg, ef, reverse=True)
    _, pf, pr = slotted_gnn_forward(
        params, layout.sg, jnp.asarray(nf), e_fwd, e_rev,
        impl="xla", out_channels=B * B,
    )
    vf, vr = expand_block_planes(layout, pf, pr)
    sf, af, sr, ar = scalar_scale_add(
        layout, mask.reshape(-1), rsqrt.reshape(-1) if scaled else None
    )
    x = np.random.default_rng(2).standard_normal(n_s)
    got_f = _spmv_planes(layout.pattern, vf * sf + af, x)
    got_r = _spmv_planes(layout.pattern, vr * sr + ar, x)
    np.testing.assert_allclose(got_f[:n_s], l_csr @ x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        got_r[:n_s], l_csr.T @ x, rtol=2e-4, atol=2e-4
    )


def test_gsel_expansion_matches_take_lanes():
    """Round-4: the gsel-formulated permutation gather must reproduce
    the row-gather expansion bit-for-bit (same f32 values selected)."""
    import dataclasses

    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.gnn.slotted_block import (
        _take_lanes,
        build_block_slot_layout,
        expand_block_planes,
    )
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(7, 7, 7)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    coo = ap.tocoo()
    n = ap.shape[0]
    lay = build_block_slot_layout(coo.row, coo.col, n, 1)
    assert lay is not None and lay.gf_f is not None, "gsel expansion absent"
    rng = np.random.default_rng(0)
    s_, gk, t = np.asarray(lay.sg.mask).shape
    pf = jnp.asarray(
        rng.standard_normal((s_, 1, gk, t)).astype(np.float32))
    pr = jnp.asarray(
        rng.standard_normal((s_, 1, gk, t)).astype(np.float32))
    vf, vr = expand_block_planes(lay, pf, pr, impl="xla")
    lay0 = dataclasses.replace(lay, gf_f=None, gf_r=None)
    vf0, vr0 = expand_block_planes(lay0, pf, pr)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vf0))
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(vr0))
