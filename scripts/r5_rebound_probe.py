"""TPU calibration of the rr rebound detector (VERDICT r4 item 4).

On the 4 flagship heat_r20 w48 test samples, runs the f32-A rr solve
under an ensemble of 1e-12-relative rhs perturbations (the bistability
trigger from docs/PERF.md round-4a) and records (iters, rebounds) per
solve, plus the rds tier's counts for reference. Calibrates
REBOUND_ESCALATE_THRESHOLD: the good branch (iters = host oracle ~99)
should show rebounds below the threshold, the bad branch (~135-149)
at/above it — i.e. the detector separates the branches.

Run ON the TPU, serialized: timeout 1800 python scripts/r5_rebound_probe.py
Writes output/r5_rebound_probe.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import jax.random as jr
import scipy.sparse as sp

import tpu_spai  # noqa: F401
from tpu_spai.cli.train import CONFIG_DIR, build_dataset
from tpu_spai.config import cli_config
from tpu_spai.data.batching import collate
from tpu_spai.data.folder import split_dataset
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.sparse.convert import graph_to_csr
from tpu_spai.train import get_workspace
from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import tpu_spai.solver.gsel_solver as gsol

    cfg = cli_config([
        "exp_name=bench", "data.prefix=generated/heat_r20",
        "gnn_features=48",
        "data.is_fixed_topology=true", "data.has_shared_features=true",
        "data.use_node_features=true", "data.use_mask_as_node_feature=true",
        "data.load_into_memory=true",
    ], CONFIG_DIR, "basic")
    ds_ = build_dataset(cfg)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds_.block_size,
        epsilon=float(cfg.epsilon),
    )
    tr, va = split_dataset(len(ds_), cfg.split["train"], seed=42)
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    params = None
    out = {"impl": impl, "samples": []}
    rng = np.random.default_rng(5)
    for si in range(4):
        batch = collate([ds_.get(va[si])])
        if params is None:
            params = ws.init_params(jr.key(0), batch)
            params = load_checkpoint(
                latest_checkpoint("outputs/heat_r20_w48/checkpoints"),
                params)
        n_valid = int(np.sum(np.asarray(batch.node_valid)))
        e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
        ei = np.stack([np.asarray(batch.graph.edge_row),
                       np.asarray(batch.graph.edge_col)])
        a = graph_to_csr(
            ei[:, :e_valid], np.asarray(batch.graph.blocks)[:e_valid],
            n_valid, mask=np.asarray(batch.mask)[:n_valid])
        l_csr = sp.csr_matrix(
            ws.factor_csr(params, batch, n_valid_edges=e_valid)
            [:n_valid, :n_valid])
        b = a @ np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64)
        perm = rcm_permutation(a)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        lp = l_csr[perm][:, perm].tocsr()
        lp.sort_indices()
        g = gsol.build_gsel_csr(ap, double_single=True)
        gl = gsol.build_gsel_csr(lp)
        glt = gsol.build_gsel_csr(sp.csr_matrix(lp.T).tocsr())
        prec = gsol.GselSpaiPrec(gl, glt, jnp.float32(float(ws.epsilon)),
                                 impl=impl)
        bp = b[perm]
        bscale = np.linalg.norm(bp) / np.sqrt(len(bp))
        row = {"f32": [], "rds": []}
        for k in range(6):
            pert = 0.0 if k == 0 else 1e-12 * bscale * rng.standard_normal(
                len(bp))
            bb = jnp.asarray(bp + pert)
            r = gsol.pcg_gsel_rr(
                g, bb, prec=prec, rtol=1e-6, max_iter=20000, impl=impl,
                escalate_on_rebound=False)
            row["f32"].append([int(r.iters), int(r.rebounds)])
            if k < 2:
                r2 = gsol.pcg_gsel_rr(
                    g, bb, prec=prec, rtol=1e-6, max_iter=20000, impl=impl,
                    spmv_precision="ds_a", escalate_on_rebound=False)
                row["rds"].append([int(r2.iters), int(r2.rebounds)])
        out["samples"].append(row)
        log(f"sample {si}: f32 (iters,reb)={row['f32']} rds={row['rds']}")
    with open("output/r5_rebound_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
