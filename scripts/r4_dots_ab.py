"""TPU A/B: cheap (chunk64) vs full (compensated tree) INNER dots in the
grouped rr solver, on the pallas path, all 4 flagship w48 test samples.

Context (round 4): on the CPU/xla path both tiers land the same
trajectory branch (~149 iters — the ds-noise-floor excursion,
docs/PERF.md round-4a), but the two committed TPU captures differ
(full dots -> 99.0 x4; fast dots -> 135.8 avg). This isolates whether
the fast dots flip the pallas trajectory branch or today's phase does.

Run ON the TPU, serialized: timeout 1800 python scripts/r4_dots_ab.py
Writes output/r4_dots_ab.json.
"""

import importlib
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
from tpu_spai.kernels import ds as dsm
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
        row = {}
        for name in ("fast", "full"):
            orig = dsm.ds_dot_fast
            if name == "full":
                dsm.ds_dot_fast = dsm.ds_dot
            importlib.reload(gsol)
            x64, iters, relres, conv, _reb = gsol._rr_grouped_jit(
                g,
                gsol.GselSpaiPrec(gl, glt, jnp.float32(float(ws.epsilon)),
                                  impl=impl),
                jnp.asarray(b[perm]), jnp.float64(1e-6),
                jnp.int32(20000), impl, 16, a_ds=True, prec_ds=False)
            x = np.empty(len(b))
            x[perm] = np.asarray(x64)
            rel = float(np.linalg.norm(a @ x - b) / np.linalg.norm(b))
            row[name] = {"iters": int(iters), "true_rel": rel}
            dsm.ds_dot_fast = orig
        out["samples"].append(row)
        log(f"sample {si}: fast={row['fast']['iters']} "
            f"full={row['full']['iters']}")
    with open("output/r4_dots_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
