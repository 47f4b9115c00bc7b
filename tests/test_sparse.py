"""Sparse container / converter tests against scipy oracles (SURVEY §4)."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpu_spai.sparse import (
    apply_dbc_masking,
    blocks_from_coo,
    csr_to_graph,
    graph_to_csr,
    random_spd_graph,
)
from tpu_spai.sparse.bcoo import build_ell, transpose_permutation


def _rand_csr(rng, n=40, density=0.1, sym=True):
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    if sym:
        m = sp.csr_matrix(m + m.T + sp.eye(n))
    m.sort_indices()
    return m


def test_blocks_from_coo_roundtrip(rng):
    b = 3
    nb = 8
    a = _rand_csr(rng, n=nb * b, density=0.2)
    vals, brow, bcol = blocks_from_coo(a.tocoo(), b)
    rebuilt = sp.bsr_matrix(
        (vals, np.stack([brow, bcol])[1], None), shape=a.shape
    ) if False else None
    # rebuild via dense accumulation
    dense = np.zeros(a.shape)
    for v, r, c in zip(vals, brow, bcol):
        dense[r * b : (r + 1) * b, c * b : (c + 1) * b] = v
    np.testing.assert_allclose(dense, a.toarray(), atol=1e-14)


def test_csr_graph_roundtrip_scalar(rng):
    a = _rand_csr(rng)
    g = csr_to_graph(a, block_size=1)
    back = graph_to_csr(
        np.stack([np.asarray(g.edge_row), np.asarray(g.edge_col)]),
        g.blocks,
        a.shape[0],
    )
    np.testing.assert_allclose(back.toarray(), a.toarray(), atol=1e-14)


def test_csr_graph_roundtrip_block(rng):
    b = 3
    a = _rand_csr(rng, n=30)
    g = csr_to_graph(a, block_size=b)
    back = graph_to_csr(
        np.stack([np.asarray(g.edge_row), np.asarray(g.edge_col)]),
        g.blocks,
        a.shape[0],
    )
    np.testing.assert_allclose(back.toarray(), a.toarray(), atol=1e-14)


def test_dbc_masking_spd_and_identity_rows(rng):
    a = _rand_csr(rng, n=20)
    a = sp.csr_matrix(a @ a.T + 20 * sp.eye(20))  # SPD
    mask = np.ones(20)
    mask[[3, 7, 15]] = 0
    m = apply_dbc_masking(a, mask)
    md = m.toarray()
    for i in [3, 7, 15]:
        row = np.zeros(20)
        row[i] = 1.0
        np.testing.assert_allclose(md[i], row, atol=1e-14)
        np.testing.assert_allclose(md[:, i], row, atol=1e-14)
    # still SPD
    w = np.linalg.eigvalsh(md)
    assert w.min() > 0
    # idempotent
    np.testing.assert_allclose(apply_dbc_masking(m, mask).toarray(), md, atol=1e-14)


def test_transpose_permutation(rng):
    a = _rand_csr(rng)
    coo = a.tocoo()
    order = np.lexsort((coo.col, coo.row))
    r, c = coo.row[order], coo.col[order]
    perm = transpose_permutation(r, c)
    np.testing.assert_array_equal(r[perm], c)
    np.testing.assert_array_equal(c[perm], r)


def test_build_ell_covers_all_edges(rng):
    a = _rand_csr(rng, n=25)
    coo = a.tocoo()
    ell = build_ell(coo.row, coo.col, 25)
    em = np.asarray(ell.ell_mask).astype(bool)  # [K, N]
    edges = np.asarray(ell.ell_edge)[em]
    assert sorted(edges.tolist()) == list(range(coo.nnz))
    # each edge sits in its own row (node axis is minor in the [K, N] planes)
    rows_of_slot = np.nonzero(em)[1]
    np.testing.assert_array_equal(coo.row[edges], rows_of_slot)
    np.testing.assert_array_equal(coo.col[edges], np.asarray(ell.ell_col)[em])


def test_edge_padding(rng):
    a = _rand_csr(rng, n=16)
    nnz = a.nnz
    g = csr_to_graph(a, pad_edges_to=nnz + 37)
    assert g.n_edges == nnz + 37
    back = graph_to_csr(
        np.stack([np.asarray(g.edge_row), np.asarray(g.edge_col)]),
        g.blocks,
        16,
        n_valid_edges=nnz,
    )
    np.testing.assert_allclose(back.toarray(), a.toarray(), atol=1e-14)


def test_collate_fast_ell_matches_attach_ell():
    """collate's cached per-sample ELL assembly must equal attach_ell on
    the concatenated batch graph exactly (indices, masks, perm, values)."""
    import scipy.sparse as sp

    from tpu_spai.data.batching import collate
    from tpu_spai.data.sample import GraphSample
    from tpu_spai.sparse.bcoo import attach_ell

    def mk(n, seed):
        r = np.random.default_rng(seed)
        a = sp.random(n, n, density=0.08, random_state=r, format="coo")
        a = sp.coo_matrix(a + a.T + sp.eye(n))
        e = a.nnz
        return GraphSample(
            x=r.standard_normal((n, 2)).astype(np.float32),
            edge_index=np.stack([a.row, a.col]).astype(np.int64),
            edge_attr=r.standard_normal((e, 3)).astype(np.float32),
            matrix_values=a.data.reshape(e, 1, 1).astype(np.float32),
            mask=np.ones((n, 1), np.float32),
            residual=r.standard_normal((n, 1)).astype(np.float32),
            num_nodes=n,
            block_size=1,
        )

    samples = [mk(37, 1), mk(55, 2), mk(23, 3)]
    batch = collate(samples, node_bucket=256, edge_bucket=1024)
    e_total = sum(s.edge_index.shape[1] for s in samples)
    ref = attach_ell(batch.graph, n_valid=e_total, freeze=True)
    for view in ("ell", "ell_t"):
        got, want = getattr(batch.graph, view), getattr(ref, view)
        for plane in ("ell_edge", "ell_col", "ell_mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, plane)), np.asarray(getattr(want, plane))
            )
    np.testing.assert_array_equal(
        np.asarray(batch.graph.transpose_perm), np.asarray(ref.transpose_perm)
    )
    np.testing.assert_array_equal(
        np.asarray(batch.graph.ell_vals), np.asarray(ref.ell_vals)
    )
    np.testing.assert_array_equal(
        np.asarray(batch.graph.ell_vals_t), np.asarray(ref.ell_vals_t)
    )
