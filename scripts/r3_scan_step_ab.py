"""A/B: training-step time with nn.scan MP layers vs layered, at the
round-1k measurement point (synthetic 48x6 GNN, big padded bucket).

VERDICT r2 item 8 bar: step time <= 2x sum-of-parts at the 1.57M-edge
bucket (round-1k measured ~3x: fwd+bwd parts ~0.45 s vs ~1.4 s step).
Run ON the TPU, serialized:  timeout 1800 python scripts/r3_scan_step_ab.py
Writes output/r3_scan_step_ab.json.
"""

import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import tpu_spai  # noqa: F401
from tpu_spai.data.batching import collate
from tpu_spai.datagen.synthetic import SyntheticDatagen
from tpu_spai.data.folder import FolderDataset


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import optax

    from tpu_spai.train import get_workspace

    wd = "/tmp/r3_scan_ab"
    import os

    if not os.path.isdir(f"{wd}/synthetic/mat"):
        log("generating synthetic reference-scale samples (one-time)...")
        SyntheticDatagen(
            prefix=f"{wd}/synthetic", max_count=2, low=10240, high=20480,
            sparsity=3e-4, alpha=1e-3, seed=7,
        ).generate()
    ds = FolderDataset(
        f"{wd}/synthetic", is_fixed_topology=False,
        has_shared_features=False, use_node_features=False,
        use_edge_features_as_node_feature="mean",
    )
    batch = collate([ds.get(0), ds.get(1)])
    e_pad = int(np.asarray(batch.graph.edge_row).shape[0])
    log(f"batch: {batch.n_nodes} nodes, {e_pad} padded edges")

    gnn_cfg = {
        "node_features": 48, "edge_features": 48, "num_mp_layers": 6,
        "node_residual": True, "edge_residual": True,
        "node_encoder": {"hidden_channels": 48, "num_layers": 2},
        "edge_encoder": {"hidden_channels": 48, "num_layers": 2},
        "node_decoder": {"hidden_channels": 48, "num_layers": 2},
        "edge_decoder": {"hidden_channels": 48, "num_layers": 2},
        "node_mlp": {"pre_norm": "layer", "hidden_channels": 48,
                     "num_layers": 2},
        "edge_mlp": {"pre_norm": "layer", "hidden_channels": 48,
                     "num_layers": 2},
        "msg_mlp": {"pre_norm": "layer", "hidden_channels": 48,
                    "num_layers": 2},
        "remat": True,
    }
    loss_cfg = {"name": "RelativeL2Loss_ANorm", "params": {}}

    out = {"edges_padded": e_pad}
    for scan in (False, True):
        ws = get_workspace("simple")(
            gnn={**gnn_cfg, "scan_mp": scan}, loss=loss_cfg,
            block_size=1, epsilon=3e-3,
        )
        params = ws.init_params(jax.random.key(0), batch)
        tx = optax.adamw(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, batch):
            (loss, _), grads = jax.value_and_grad(
                ws.loss, has_aux=True
            )(params, batch)
            upd, opt = tx.update(grads, opt, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
            return params, opt, loss

        t0 = time.perf_counter()
        params, opt, loss = step(params, opt, batch)
        float(loss)  # host fetch forces execution
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            params, opt, loss = step(params, opt, batch)
            float(loss)
            ts.append(time.perf_counter() - t0)
        key = "scan" if scan else "layered"
        out[key] = {
            "compile_s": round(compile_s, 2),
            "step_ms_min": round(min(ts) * 1e3, 1),
            "step_ms_med": round(sorted(ts)[len(ts) // 2] * 1e3, 1),
        }
        log(key, out[key])

    if "scan" in out and "layered" in out:
        out["speedup_min"] = round(
            out["layered"]["step_ms_min"] / out["scan"]["step_ms_min"], 3
        )
    with open("output/r3_scan_step_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
