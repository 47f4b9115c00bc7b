"""Jacobi-equilibrated rr-tier study on the trained heat_r20 factor.

VERDICT round-2 item 6, attack #2 (after rds_study.py measured the ds
hybrids): symmetric Jacobi scaling As = D^-1/2 A D^-1/2 equilibrates the
row scales that the heat coefficient field spreads over decades, which
is exactly what f32 rounding amplifies. The transform is exact in exact
arithmetic (same preconditioned spectrum as the host fp64 oracle):

    solve  As y = D^-1/2 b,  x = D^-1/2 y
    Ms^-1  = D^1/2 (eps I + L L^T) D^1/2 = eps*D + Ls Ls^T,  Ls = D^1/2 L

so host-oracle iteration counts are directly comparable. Variants:
  rr       residual-replacement f32 (production default, baseline)
  rr_jac   rr on the equilibrated system
  rds_jac  rr + double-single A-matvec on the equilibrated system

Usage: python scripts/scaled_rr_study.py [max_samples=3] [out=output/scaled_rr_study.csv]
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    on_tpu = kv.get("tpu", "0") == "1"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    max_samples = int(kv.get("max_samples", 3))
    out = kv.get("out", "output/scaled_rr_study.csv")

    import jax.numpy as jnp
    import scipy.sparse as sp
    import yaml

    import tpu_spai  # noqa: F401
    from tpu_spai.cli.train import build_dataset
    from tpu_spai.config import _wrap
    from tpu_spai.data.batching import collate
    from tpu_spai.data.folder import split_dataset
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.solver import GselSpaiPrec, build_gsel_csr
    from tpu_spai.solver.gsel_solver import gsel_matvec, pcg_gsel_rr
    from tpu_spai.solver.host_baselines import get_pcg_iter_time
    from tpu_spai.sparse.convert import graph_to_csr
    from tpu_spai.train import get_workspace
    from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

    impl = "pallas" if on_tpu else "xla"

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class EpsDiagSpai:
        """y = eps_diag*x + Ls (Ls^T x) — the equilibrated-space SPAI.

        Attribute names avoid `l_t` so pcg_gsel_rr routes this through its
        generic-preconditioner branch (f32 apply; M-error only perturbs)."""

        planes_fwd: object
        planes_t: object
        eps_diag: jax.Array

        def __call__(self, r: jax.Array) -> jax.Array:
            rf = r.reshape(-1)
            lt_r = gsel_matvec(self.planes_t, rf, impl)
            y = gsel_matvec(self.planes_fwd, lt_r, impl) + self.eps_diag * rf
            return y.reshape(r.shape)

    ckpt_dir = kv.get("ckpt", "outputs/heat_r20_v2/checkpoints")
    with open(os.path.join(ckpt_dir, "config.yaml")) as f:
        cfg = _wrap(yaml.safe_load(f))
    dataset = build_dataset(cfg)
    ws = get_workspace(cfg.select("workspace", "simple"))(
        gnn=cfg["gnn"], loss=cfg["loss"], block_size=dataset.block_size,
        epsilon=float(cfg["epsilon"]),
    )
    _, va = split_dataset(len(dataset), cfg["split"]["train"], seed=42)
    example = collate([dataset.get(va[0])])
    params = ws.init_params(jax.random.key(0), example)
    params = load_checkpoint(latest_checkpoint(ckpt_dir), params)

    rows = []
    for i in va[:max_samples]:
        batch = collate([dataset.get(i)])
        n_valid = int(np.sum(np.asarray(batch.node_valid)))
        msize = n_valid * batch.block_size
        e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
        ei = np.stack(
            [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
        )
        a_csr = graph_to_csr(
            ei[:, :e_valid], np.asarray(batch.graph.blocks)[:e_valid],
            msize, mask=np.asarray(batch.mask)[:n_valid],
        )
        l_csr = ws.factor_csr(params, batch, n_valid_edges=e_valid)[
            :msize, :msize
        ]
        r = np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64)
        b = a_csr @ r

        it_host, _, _ = get_pcg_iter_time(
            a_csr, r, l_csr, ws.epsilon, rtol=1e-6
        )

        perm = rcm_permutation(a_csr)
        a_p = a_csr[perm][:, perm].tocsr()
        a_p.sort_indices()
        l_p = l_csr[perm][:, perm].tocsr()
        l_p.sort_indices()
        d = np.asarray(a_p.diagonal(), np.float64)
        drange = float(d.max() / d.min())
        b_p = b[perm]

        row = {"sample": int(i), "n": msize, "host_fp64": it_host,
               "diag_range": round(drange, 1)}

        # --- rr baseline (unscaled) ------------------------------------
        ga = build_gsel_csr(a_p, double_single=True)
        gl = build_gsel_csr(l_p)
        glt = build_gsel_csr(l_p.T.tocsr())
        prec = GselSpaiPrec(gl, glt, jnp.float32(ws.epsilon), impl=impl)

        # --- equilibrated system ---------------------------------------
        s_inv = 1.0 / np.sqrt(d)  # D^-1/2
        s_mat = sp.diags(s_inv)
        a_s = sp.csr_matrix(s_mat @ a_p @ s_mat)
        a_s.sort_indices()
        l_s = sp.csr_matrix(sp.diags(np.sqrt(d)) @ l_p)  # Ls = D^1/2 L
        l_s.sort_indices()
        ga_s = build_gsel_csr(a_s, double_single=True)
        gl_s = build_gsel_csr(l_s)
        glt_s = build_gsel_csr(l_s.T.tocsr())
        prec_s = EpsDiagSpai(
            gl_s, glt_s,
            jnp.asarray(ws.epsilon * d, jnp.float32),
        )
        b_s = jnp.asarray(b_p * s_inv)

        for tier, (g_use, b_use, p_use, kwargs, unscale) in {
            "rr": (ga, jnp.asarray(b_p), prec, {}, None),
            "rr_jac": (ga_s, b_s, prec_s, {}, s_inv),
            "rds_jac": (ga_s, b_s, prec_s,
                        {"spmv_precision": "ds_a"}, s_inv),
        }.items():
            res = pcg_gsel_rr(
                g_use, b_use, prec=p_use, rtol=1e-6, max_iter=5 * msize,
                impl=impl, **kwargs,
            )
            y = np.asarray(res.x)
            x = np.empty(msize)
            x[perm] = y * unscale if unscale is not None else y
            true_rel = np.linalg.norm(a_csr @ x - b) / np.linalg.norm(b)
            row[f"{tier}_iters"] = int(res.iters)
            row[f"{tier}_true_relres"] = float(true_rel)
        rows.append(row)
        print(row, flush=True)

    import pandas as pd

    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_csv(out, index=False)
    print(df.mean(numeric_only=True).to_string())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
