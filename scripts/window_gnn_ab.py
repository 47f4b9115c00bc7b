"""In-process A/B on the real TPU: fused slotted GNN forward on the
production grid (lane_groups=8, window=1) vs the w-window grid
(window=2, lane_groups=1). Heat tet boxes, production GNN shape
(16 features, 4 MP layers). Chained scan, differenced."""
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.gnn.layers import NodeEdgeProcessing
from tpu_spai.gnn.slotted import build_slot_graph, slot_scatter, slotted_gnn_forward


def main():
    for res in ([24, 48] if len(sys.argv) < 2 else [int(sys.argv[1])]):
        nodes, elems = unit_box_tet(res, res, res)
        a = sp.csr_matrix(
            laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
        )
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

        from tpu_spai.gnn.slotted import fused_safe_group

        grids = {}
        for name, kw in (("ng8w1", dict(lane_groups=8, window=1)),
                         ("ng1w2", dict(window=2))):
            sg = build_slot_graph(coo.row, coo.col, coo.data, n, **kw)
            gsafe = fused_safe_group(
                sg.pattern.k_width, sg.pattern.n_cols,
                window=sg.pattern.window, q_chunks=sg.pattern.q_chunks,
            )
            if sg.pattern.group > gsafe:
                sg = build_slot_graph(coo.row, coo.col, coo.data, n,
                                      group=gsafe, **kw)
            grids[name] = (sg, kw)

        # device parity first (retry with halved group on a VMEM OOM,
        # mirroring cli/infer.py)
        outs = {}
        for name in list(grids):
            sg, kw = grids[name]
            while True:
                try:
                    e_f = slot_scatter(sg, ef)
                    e_r = slot_scatter(sg, ef, reverse=True)
                    _, vf, _ = slotted_gnn_forward(params, sg, nf, e_f, e_r,
                                                   impl="fused")
                    np.asarray(vf)
                    break
                except jax.errors.JaxRuntimeError as exc:
                    gcur = sg.pattern.group
                    if "Scoped allocation" not in str(exc) or gcur <= 1:
                        raise
                    print(f"  {name}: G={gcur} OOM, retry G={gcur // 2}",
                          flush=True)
                    sg = build_slot_graph(coo.row, coo.col, coo.data, n,
                                          group=max(1, gcur // 2), **kw)
            grids[name] = (sg, e_f, e_r)
            print(f"res={res} {name}: K'={sg.pattern.k_width} "
                  f"G={sg.pattern.group} Qg={sg.pattern.q_chunks} "
                  f"steps={sg.pattern.n_steps} "
                  f"slots={sg.pattern.slots/1e6:.2f}M", flush=True)
            from tpu_spai.gnn.slotted import slot_gather_edges
            outs[name] = np.asarray(slot_gather_edges(sg, vf[:, None]))
        d = np.abs(outs["ng8w1"] - outs["ng1w2"]).max()
        den = np.abs(outs["ng8w1"]).max()
        print(f"  cross-grid fused-output relerr {d/den:.2e}", flush=True)

        def chain(sg, e_f, e_r, k):
            @jax.jit
            def run(x0):
                def body(x, _):
                    xo, vf, _ = slotted_gnn_forward(
                        params, sg, x, e_f, e_r, impl="fused"
                    )
                    return x0 + 1e-20 * vf[0, 0, 0], None

                x, _ = jax.lax.scan(body, x0, None, length=k)
                return x

            return run

        short, long_ = (4, 44) if res >= 40 else (10, 110)
        fns = {}
        for name, (sg, e_f, e_r) in grids.items():
            fns[name] = (chain(sg, e_f, e_r, short),
                         chain(sg, e_f, e_r, long_))
            np.asarray(fns[name][1](nf))
            np.asarray(fns[name][0](nf))
        best = {}
        for _ in range(6):
            for name, (s, l) in fns.items():
                t0 = time.perf_counter(); np.asarray(s(nf))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter(); np.asarray(l(nf))
                tl = time.perf_counter() - t0
                per = (tl - ts) / (long_ - short) * 1e3
                if name not in best or per < best[name]:
                    best[name] = per
        print(f"  fused fwd: ng8w1 {best['ng8w1']:.2f} ms  "
              f"ng1w2 {best['ng1w2']:.2f} ms "
              f"({best['ng8w1']/best['ng1w2']:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
