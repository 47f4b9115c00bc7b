"""In-process A/B at heat res=48 (n=117k), w2 fused GNN forward:
resident vs streamed x, and tile-group G sweep. One process, chained."""
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

import tpu_spai.gnn.slotted as slotted_mod
from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import build_slot_graph, slot_scatter, slotted_gnn_forward

res = int(sys.argv[1]) if len(sys.argv) > 1 else 48
nodes, elems = unit_box_tet(res, res, res)
a = sp.csr_matrix(laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems)))
perm = rcm_permutation(a)
ap = a[perm][:, perm].tocsr()
ap.sort_indices()
coo = ap.tocoo()
n = ap.shape[0]
rng = np.random.default_rng(0)
nf = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
ef = coo.data.reshape(-1, 1).astype(np.float32)
gnn = NodeEdgeProcessing(edge_out_features=1, num_mp_layers=4)
ei = jnp.asarray(np.stack([coo.row, coo.col]).astype(np.int32))
params = gnn.init(jax.random.key(0), nf, ei, jnp.asarray(ef))

short, long_ = 4, 24
variants = []
for g_pin, stream in ((6, False), (6, True), (8, True), (12, True)):
    slotted_mod.STREAM_X_BYTES = 0 if stream else 1 << 60
    jax.clear_caches()
    sg = build_slot_graph(coo.row, coo.col, coo.data, n, window=2, group=g_pin)
    e_f = slot_scatter(sg, ef)
    e_r = slot_scatter(sg, ef, reverse=True)

    def chain(sg, e_f, e_r, k):
        @jax.jit
        def run(x0):
            def body(x, _):
                _, vf, _ = slotted_gnn_forward(params, sg, x, e_f, e_r,
                                               impl="fused")
                return x0 + 1e-20 * vf[0, 0, 0], None
            x, _ = jax.lax.scan(body, x0, None, length=k)
            return x
        return run

    name = f"G={sg.pattern.group} {'stream' if stream else 'resident'}"
    try:
        s, l = chain(sg, e_f, e_r, short), chain(sg, e_f, e_r, long_)
        np.asarray(l(nf)); np.asarray(s(nf))
        variants.append((name, s, l))
        print(f"{name}: compiled", flush=True)
    except jax.errors.JaxRuntimeError as exc:
        ok = "Scoped allocation" in str(exc)
        print(f"{name}: OOM" if ok else f"{name}: ERR {exc}", flush=True)

best = {}
for _ in range(6):
    for name, s, l in variants:
        t0 = time.perf_counter(); np.asarray(s(nf)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(l(nf)); tl = time.perf_counter() - t0
        per = (tl - ts) / (long_ - short) * 1e3
        if name not in best or per < best[name]:
            best[name] = per
for name, v in best.items():
    print(f"{name}: {v:.2f} ms/fwd")
