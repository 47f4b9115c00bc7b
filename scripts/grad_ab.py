"""In-process A/B: value_and_grad through flax edge-array GNN vs slotted-XLA
plane GNN, heat res=24 (n=15,625, headline size). Chained scan, differenced."""
import sys, time
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import (
    build_slot_graph, slot_scatter, slotted_gnn_forward, gather_feats_xla,
)

res = int(sys.argv[1]) if len(sys.argv) > 1 else 24
nodes, elems = unit_box_tet(res, res, res)
a = sp.csr_matrix(laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems)))
perm = rcm_permutation(a)
ap = a[perm][:, perm].tocsr(); ap.sort_indices()
coo = ap.tocoo()
n, e = ap.shape[0], ap.nnz
rng = np.random.default_rng(0)
nf = rng.standard_normal((n, 2)).astype(np.float32)
ef = coo.data.reshape(-1, 1).astype(np.float32)
print(f"n={n} E={e}", file=sys.stderr)

gnn = NodeEdgeProcessing(edge_out_features=1, num_mp_layers=4)
ei = jnp.asarray(np.stack([coo.row, coo.col]).astype(np.int32))
x_j = jnp.asarray(nf); ef_j = jnp.asarray(ef)
params = gnn.init(jax.random.key(0), x_j, ei, ef_j)

sg = build_slot_graph(coo.row, coo.col, coo.data, n)
print(f"slot K'={sg.pattern.k_width} group={sg.pattern.group} ng={sg.pattern.lane_groups} steps={sg.pattern.n_steps}", file=sys.stderr)
e_fwd = slot_scatter(sg, ef)
e_rev = slot_scatter(sg, ef, reverse=True)
r = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))


def slotted_spmv(vals, x):
    g = sg.pattern
    xg = gather_feats_xla(g, x[:, None])[:, 0]  # [S, GK', T]
    kp, grp, t = g.k_width, g.group, g.tile
    y = jnp.sum((vals * xg).reshape(-1, kp, grp, t), axis=1)
    return y.reshape(-1)[:n]


def loss_slotted(p):
    _, vf, vr = slotted_gnn_forward(p, sg, x_j, e_fwd, e_rev, impl="xla")
    u = slotted_spmv(vr, r)
    d = 3e-3 * r + slotted_spmv(vf, u)
    ad = slotted_spmv(sg.pattern.vals, d)
    return jnp.sum((ad - r) ** 2) / (jnp.sum(r**2) + 1e-6)


from tpu_spai.data.batching import collate
from tpu_spai.data.sample import GraphSample
from tpu_spai.kernels.spmv_xla import spai_apply, spmv

sample = GraphSample(
    x=nf, edge_attr=ef, edge_index=np.stack([coo.row, coo.col]),
    matrix_values=coo.data.reshape(-1, 1, 1).astype(np.float32),
    mask=np.ones((n, 1), np.float32),
    residual=np.asarray(r).reshape(n, 1),
    num_nodes=n, block_size=1,
)
batch = collate([sample])


def loss_flax(p):
    _, eo = gnn.apply(p, batch.x, batch.edge_index, batch.edge_attr,
                      batch.edge_valid)
    blocks = eo.reshape(-1, 1, 1)
    lg = batch.graph.with_blocks(blocks)
    d = spai_apply(lg, batch.residual, 3e-3, mask=batch.mask)
    ad = spmv(batch.graph, d, mask=batch.mask)
    return jnp.sum((ad - batch.residual) ** 2) / (jnp.sum(batch.residual**2) + 1e-6)


def chain(loss_fn, k):
    @jax.jit
    def run(p):
        def body(pp, _):
            l, g = jax.value_and_grad(loss_fn)(pp)
            pp = jax.tree_util.tree_map(lambda a, b: a - 1e-20 * b, pp, g)
            return pp, l
        pp, ls = jax.lax.scan(body, p, None, length=k)
        return ls[-1]
    return run

# grad-parity check first (device, fp32)
l1, g1 = jax.value_and_grad(loss_flax)(params)
l2, g2 = jax.value_and_grad(loss_slotted)(params)
l1, l2 = float(l1), float(l2)
gn1 = float(jnp.sqrt(sum(jnp.sum(g*g) for g in jax.tree_util.tree_leaves(g1))))
gn2 = float(jnp.sqrt(sum(jnp.sum(g*g) for g in jax.tree_util.tree_leaves(g2))))
rel = abs(l1 - l2) / max(abs(l1), 1e-9)
print(f"loss flax={l1:.6e} slotted={l2:.6e} rel={rel:.2e}  gnorm {gn1:.4e} vs {gn2:.4e}", file=sys.stderr)

for name, fn in (("flax", loss_flax), ("slotted_xla", loss_slotted)):
    short, long_ = chain(fn, 2), chain(fn, 10)
    np.asarray(long_(params))  # compile + warm
    np.asarray(short(params))
    best = None
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(short(params)); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(long_(params)); t_l = time.perf_counter() - t0
        per = (t_l - t_s) / 8.0
        best = per if best is None or per < best else best
    print(f"{name}: {best*1e3:.2f} ms per fwd+bwd step")
