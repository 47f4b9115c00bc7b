"""GNN layer and loss tests: shapes, permutation equivariance, and
segment-loss parity against a ptr-sliced numpy oracle (the reference's
batch.ptr formulation, loss.py:131-141)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpu_spai.data import GraphBatch, collate, GraphSample
from tpu_spai.gnn import NodeEdgeProcessing, lower_triangular_mask
from tpu_spai.gnn.losses import create_loss
from tpu_spai.sparse import csr_to_graph


def _sample(rng, n=20, b=1, density=0.2, with_gt=True):
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = sp.csr_matrix(m @ m.T + 2 * sp.eye(n))
    a.sort_indices()
    coo = a.tocoo()
    order = np.lexsort((coo.col, coo.row))
    ei = np.stack([coo.row[order], coo.col[order]])
    vals = coo.data[order].reshape(-1, 1, 1)
    nb = n // b
    if b > 1:
        from tpu_spai.sparse import blocks_from_coo

        vals, br, bc = blocks_from_coo(coo, b)
        ei = np.stack([br, bc])
    nn = nb if b > 1 else n
    return GraphSample(
        x=rng.standard_normal((nn, 3)).astype(np.float32),
        edge_attr=vals.reshape(vals.shape[0], -1).astype(np.float32),
        edge_index=ei,
        matrix_values=vals.astype(np.float32),
        mask=np.ones((nn, b), dtype=np.float32),
        residual=rng.standard_normal((nn, b)).astype(np.float32),
        num_nodes=nn,
        block_size=b,
        gt=rng.standard_normal((nn, b)).astype(np.float32) if with_gt else None,
    )


def _batch(rng, k=3, **kw):
    return collate([_sample(rng, n=20 + 4 * i, **kw) for i in range(k)])


def test_gnn_forward_shapes(rng):
    batch = _batch(rng)
    model = NodeEdgeProcessing(edge_out_features=1, node_features=8, edge_features=8)
    params = model.init(jax.random.key(0), batch.x, batch.edge_index, batch.edge_attr)
    node_out, edge_out = model.apply(
        params, batch.x, batch.edge_index, batch.edge_attr
    )
    assert node_out.shape == (batch.n_nodes, 8)
    assert edge_out.shape == (batch.graph.n_edges, 1)
    assert np.isfinite(np.asarray(edge_out)).all()


def test_gnn_permutation_equivariance(rng):
    """Relabeling nodes must permute outputs identically (message passing
    has no positional dependence)."""
    s = _sample(rng, n=16)
    batch = collate([s], node_bucket=16, edge_bucket=s.edge_index.shape[1])
    model = NodeEdgeProcessing(edge_out_features=1, node_features=8, edge_features=8)
    params = model.init(jax.random.key(0), batch.x, batch.edge_index, batch.edge_attr)
    _, e1 = model.apply(params, batch.x, batch.edge_index, batch.edge_attr)

    perm = rng.permutation(16)
    inv = np.argsort(perm)
    ei_p = jnp.asarray(inv)[batch.edge_index]  # relabel nodes
    x_p = batch.x[jnp.asarray(perm)]
    _, e2 = model.apply(params, x_p, ei_p, batch.edge_attr)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=2e-4, atol=1e-5)


def _ptr_losses_oracle(samples, ds, name):
    """Reference-style ptr-sliced computation in numpy (fp64)."""
    from tpu_spai.sparse import graph_to_csr

    total = 0.0
    for s, d in zip(samples, ds):
        a = graph_to_csr(s.edge_index, s.matrix_values, s.num_nodes * s.block_size,
                         mask=s.mask)
        r = s.residual.ravel().astype(np.float64)
        dd = d.ravel().astype(np.float64)
        ad = (a @ dd) * s.mask.ravel()
        if name == "relativel2loss_anorm":
            total += np.sum((ad - r) ** 2) / (np.sum(r**2) + 1e-6)
        elif name == "nifloss_norm":
            ar = a @ r  # no mask in reference NifLoss spmv
            total += np.sum((dd - ar) ** 2) / (np.sum(ar**2) + 1e-6)
        elif name == "cosinesimilarityloss_anorm":
            cs = np.dot(ad, r) / max(np.linalg.norm(ad) * np.linalg.norm(r), 1e-6)
            total += 1 - cs
        elif name == "conjgradloss_anorm":
            alpha = np.dot(r, dd) / (np.dot(dd, ad) + 1e-6)
            total += np.sum((alpha * ad - r) ** 2) / (np.sum(r**2) + 1e-6)
        else:
            raise ValueError(name)
    return total / len(samples)


def test_segment_losses_match_ptr_oracle(rng):
    samples = [_sample(rng, n=12 + 4 * i) for i in range(3)]
    batch = collate(samples, dtype=jnp.float64)
    d = [rng.standard_normal((s.num_nodes, 1)).astype(np.float64) for s in samples]
    d_cat = np.concatenate(d + [np.zeros((batch.n_nodes - sum(s.num_nodes for s in samples), 1))])
    d_dev = jnp.asarray(d_cat)
    lv = batch.graph.blocks
    for name in [
        "relativel2loss_anorm",
        "nifloss_norm",
        "cosinesimilarityloss_anorm",
        "conjgradloss_anorm",
    ]:
        loss = create_loss(name)(batch, d_dev, lv)
        want = _ptr_losses_oracle(samples, d, name)
        np.testing.assert_allclose(float(loss), want, rtol=1e-8, err_msg=name)


def test_batch_less_flag(rng):
    samples = [_sample(rng, n=12), _sample(rng, n=16)]
    batch = collate(samples, dtype=jnp.float64)
    d = jnp.asarray(rng.standard_normal((batch.n_nodes, 1)))
    lv = batch.graph.blocks
    per_sample = create_loss("relativel2loss_anorm", batch_less=False)(batch, d, lv)
    whole = create_loss("relativel2loss_anorm", batch_less=True)(batch, d, lv)
    assert float(per_sample) != float(whole)  # different normalizations
    assert np.isfinite(float(per_sample)) and np.isfinite(float(whole))


def test_all_losses_finite_and_differentiable(rng):
    samples = [_sample(rng, n=14) for _ in range(2)]
    batch = collate(samples, dtype=jnp.float64)
    names = [
        "relativel2loss_plainnorm",
        "relativel2loss_anorm",
        "l2loss_anorm",
        "proploss",
        "l1loss",
        "relproploss",
        "cosinesimilarityloss_plainnorm",
        "cosinesimilarityloss_anorm",
        "conjgradloss_plainnorm",
        "conjgradloss_anorm",
        "conjgradloss_anorm_norelative",
        "nifloss_norm",
    ]
    for name in names:
        fn = create_loss(name)

        def loss_of_d(dflat):
            return fn(batch, dflat.reshape(batch.n_nodes, 1), batch.graph.blocks)

        d = jnp.asarray(rng.standard_normal(batch.n_nodes))
        val, grad = jax.value_and_grad(loss_of_d)(d)
        assert np.isfinite(float(val)), name
        assert np.isfinite(np.asarray(grad)).all(), name


def test_lower_triangular_mask(rng):
    s = _sample(rng, n=10)
    ei = jnp.asarray(s.edge_index)
    m = lower_triangular_mask(ei)
    em = np.asarray(m).astype(bool)
    assert (s.edge_index[1][em] <= s.edge_index[0][em]).all()
    assert (s.edge_index[1][~em] > s.edge_index[0][~em]).all()


def test_padded_forward_matches_subgraph(rng):
    # bucket-padding edges are wired to node 0 for static shapes; the
    # edge_valid weighting must keep them out of message aggregation —
    # the padded forward must equal the unpadded-subgraph forward exactly
    from tpu_spai.config import load_config
    from tpu_spai.train import get_workspace

    sample = _sample(rng, n=24)
    batch = collate([sample], node_bucket=64, edge_bucket=512)
    assert batch.n_nodes > sample.num_nodes  # padding present
    cfg = load_config(
        "configs", "basic",
        ["exp_name=t", "data.prefix=unused", "gnn_features=8",
         "gnn.num_mp_layers=2"],
    )
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=1, epsilon=3e-3
    )
    params = ws.init_params(jax.random.key(0), batch)
    e_valid = sample.edge_index.shape[1]
    padded = np.asarray(ws.predict_blocks(params, batch))[:e_valid]
    _, sub = ws.model.apply(
        params,
        jnp.asarray(sample.x),
        jnp.asarray(sample.edge_index.astype(np.int32)),
        jnp.asarray(sample.edge_attr),
    )
    np.testing.assert_allclose(
        padded.reshape(-1), np.asarray(sub)[:, 0], rtol=1e-5, atol=1e-6
    )


def test_remat_grads_match():
    """nn.remat MP layers must give identical grads (pure recomputation)."""
    import jax.tree_util as jtu

    from tpu_spai.gnn.layers import NodeEdgeProcessing

    rng = np.random.default_rng(0)
    n, e_cnt, f = 40, 160, 8
    x = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    ei = jnp.asarray(rng.integers(0, n, (2, e_cnt)), jnp.int32)
    ea = jnp.asarray(rng.standard_normal((e_cnt, 2)), jnp.float32)
    kw = dict(node_features=f, edge_features=f, num_mp_layers=2, edge_out_features=1)
    m0 = NodeEdgeProcessing(**kw, remat=False)
    m1 = NodeEdgeProcessing(**kw, remat=True)
    p = m0.init(jax.random.key(0), x, ei, ea)

    def loss(m, p):
        _, eo = m.apply(p, x, ei, ea)
        return jnp.sum(eo * eo)

    g0 = jax.grad(lambda p: loss(m0, p))(p)
    g1 = jax.grad(lambda p: loss(m1, p))(p)
    assert jtu.tree_structure(g0) == jtu.tree_structure(g1)
    for a, b in zip(jtu.tree_leaves(g0), jtu.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
