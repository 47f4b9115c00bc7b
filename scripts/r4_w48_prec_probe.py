"""Round-4 probe: is the on-chip fused-vs-XLA w48 gap (1.25e-3 rel, gate
FAIL at tol 2e-4 — output/kernel_gate.json r4) precision drift or a
kernel bug?

Method: on the gate's graph, at widths 16 and 48, compare THREE forwards
against an fp64 oracle (the plain graph-form NodeEdgeProcessing apply
with f64 inputs — exact to ~1e-15 on TPU's emulated f64):
    xla    slotted XLA path (f32 HIGHEST)
    fused  fused Pallas MP kernel (f32 HIGHEST)
If err(fused, f64) ~ err(xla, f64), both drift equally and the gate
tolerance is simply width-dependent; if err(fused) >> err(xla), the
fused kernel loses real precision at width 48.

Production context: the w48 factor gives EXACT host/device iteration
parity (99.0 = 99.0, output/heat_r20_w48) — this probe quantifies the
raw-value story behind that application-level result.

Run ON the TPU, serialized: timeout 900 python scripts/r4_w48_prec_probe.py
Writes output/r4_w48_prec_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401
from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import (
    build_slot_graph,
    fused_safe_group,
    gnn_width_from_params,
    slot_gather_edges,
    slot_scatter,
    slotted_gnn_forward,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def relerr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def main():
    # the kernel gate's matrix (scripts/tpu_kernel_gate.py)
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(13, 13, 13)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    a = a[perm][:, perm].tocsr()
    a.sort_indices()
    n = a.shape[0]
    coo = a.tocoo()
    rng = np.random.default_rng(0)
    nf = rng.standard_normal((n, 2)).astype(np.float32)
    ef = coo.data.reshape(-1, 1).astype(np.float32)
    ei = jnp.asarray(np.stack([coo.row, coo.col]).astype(np.int32))

    out = {"n": n, "nnz": int(a.nnz)}
    for width in (16, 48):
        gnn = NodeEdgeProcessing(
            edge_out_features=1, num_mp_layers=2,
            node_features=width, edge_features=width,
            node_mlp={"pre_norm": "layer"}, edge_mlp={"pre_norm": "layer"},
            msg_mlp={"pre_norm": "layer"},
        )
        params = gnn.init(
            jax.random.key(1), jnp.asarray(nf), ei, jnp.asarray(ef))
        # fp64 oracle: graph-form apply with f64 inputs
        nf64 = jnp.asarray(nf, jnp.float64)
        ef64 = jnp.asarray(ef, jnp.float64)
        p64 = jax.tree_util.tree_map(
            lambda w: jnp.asarray(w, jnp.float64), params)
        x_o, e_o = gnn.apply(p64, nf64, ei, ef64)
        x_o, e_o = np.asarray(x_o), np.asarray(e_o)[:, 0]

        sg = build_slot_graph(coo.row, coo.col, coo.data, n)
        g48 = fused_safe_group(
            sg.pattern.k_width, sg.pattern.n_cols,
            nf=gnn_width_from_params(params),
            window=sg.pattern.window, q_chunks=sg.pattern.q_chunks)
        if sg.pattern.group > g48:
            sg = build_slot_graph(coo.row, coo.col, coo.data, n, group=g48)
        e_f = slot_scatter(sg, ef)
        e_r = slot_scatter(sg, ef, reverse=True)
        res = {"group": int(sg.pattern.group)}
        fused_impl = (
            "fused" if jax.default_backend() == "tpu" else "fused_interpret"
        )
        for impl in ("xla", fused_impl):
            x_i, vf_i, _ = slotted_gnn_forward(
                params, sg, jnp.asarray(nf), e_f, e_r, impl=impl)
            ed_i = np.asarray(slot_gather_edges(sg, vf_i[:, None]))[:, 0]
            key = "fused" if impl.startswith("fused") else impl
            res[f"{key}_nodes_vs_f64"] = relerr(np.asarray(x_i), x_o)
            res[f"{key}_edges_vs_f64"] = relerr(ed_i, e_o)
            res[f"{key}_edges"] = ed_i
        res["fused_vs_xla_edges"] = relerr(
            res.pop("fused_edges"), res.pop("xla_edges"))
        out[f"w{width}"] = {
            k: (round(v, 8) if isinstance(v, float) else v)
            for k, v in res.items()
        }
        log(width, json.dumps(out[f"w{width}"]))

    os.makedirs("output", exist_ok=True)
    with open("output/r4_w48_prec_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
