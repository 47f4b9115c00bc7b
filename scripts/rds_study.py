"""rr vs rds iteration study on the trained heat_r20 factor (CPU).

VERDICT round-2 item 6: the rr tier's f32 A-matvec inflates iterations
~2.3x over the fp64 host oracle on this kappa~1e5 family. The rds tier
(spmv_precision='ds') runs the A-matvec in double-single; on the CPU
backend the xla ds path computes in real f64, so the iteration counts
here predict the on-TPU ds behavior (kernels/ds.py platform note).

Usage: python scripts/rds_study.py [max_samples=2] [out=output/rds_study.csv]
"""

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
    max_samples = int(kv.get("max_samples", 2))
    out = kv.get("out", "output/rds_study.csv")

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
    from tpu_spai.solver.gsel_solver import pcg_gsel_rr
    from tpu_spai.solver.host_baselines import get_pcg_iter_time
    from tpu_spai.sparse.convert import graph_to_csr
    from tpu_spai.train import get_workspace
    from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

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
        ga = build_gsel_csr(a_p, double_single=True)
        gl = build_gsel_csr(l_p, double_single=True)
        glt = build_gsel_csr(l_p.T.tocsr(), double_single=True)
        prec = GselSpaiPrec(gl, glt, jnp.float32(ws.epsilon), impl="xla")
        bp = jnp.asarray(b[perm])

        import time

        impl = "pallas" if on_tpu else "xla"
        row = {"sample": int(i), "n": msize, "host_fp64": it_host}
        for tier, kwargs in (
            ("rr", {}),
            ("ds_a", {"spmv_precision": "ds_a"}),
            ("ds_prec", {"spmv_precision": "ds_prec"}),
            ("ds_all", {"spmv_precision": "ds"}),
        ):
            solve = lambda: pcg_gsel_rr(  # noqa: E731
                ga, bp, prec=prec, rtol=1e-6, max_iter=5 * msize,
                impl=impl, **kwargs,
            )
            res = solve()
            np.asarray(res.x)  # compile + force
            walls = []
            for _ in range(3 if on_tpu else 1):
                t0 = time.perf_counter()
                res = solve()
                np.asarray(res.x)
                walls.append(time.perf_counter() - t0)
            # true residual check against the fp64 operator
            x = np.empty(msize)
            x[perm] = np.asarray(res.x)
            true_rel = np.linalg.norm(a_csr @ x - b) / np.linalg.norm(b)
            row[f"{tier}_iters"] = int(res.iters)
            row[f"{tier}_true_relres"] = float(true_rel)
            row[f"{tier}_wall_ms"] = round(min(walls) * 1e3, 2)
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
