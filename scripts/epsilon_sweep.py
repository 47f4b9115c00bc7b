"""Eval-time epsilon sweep for a trained SPAI checkpoint (CPU, host fp64).

VERDICT round-2 item 4: the train-time epsilon (3e-3, config/basic.yaml
"Cannot be too small") need not be the best EVAL epsilon — the reference
sweeps override_epsilon 1e-6..1e-1 at inference
(misc/infer_all_precision_epsilon_override.sh). This script loads a
checkpoint's own saved config, computes the factor once per test sample,
then counts host-fp64 CG iterations for each epsilon, next to the
FSAI/AINV/IC baselines.

Usage:
  python scripts/epsilon_sweep.py CKPT_DIR [data.prefix=...] \
      [eps=1e-6,1e-5,...] [max_samples=4] [out=output/eps_sweep.csv]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    args = sys.argv[1:]
    ckpt_dir = args[0]
    kv = dict(a.split("=", 1) for a in args[1:])
    eps_grid = [
        float(x)
        for x in kv.get(
            "eps", "1e-6,1e-5,1e-4,3e-4,1e-3,3e-3,1e-2,3e-2,1e-1"
        ).split(",")
    ]
    max_samples = int(kv.get("max_samples", 4))
    out = kv.get("out", "output/eps_sweep.csv")

    import yaml

    import tpu_spai  # noqa: F401
    from tpu_spai.config import _wrap
    from tpu_spai.cli.train import build_dataset
    from tpu_spai.data.batching import collate
    from tpu_spai.data.folder import split_dataset
    from tpu_spai.solver.host_baselines import (
        get_cg_iter_time,
        get_pcg_iter_time,
    )
    from tpu_spai.sparse.convert import graph_to_csr
    from tpu_spai.train import get_workspace
    from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

    with open(os.path.join(ckpt_dir, "config.yaml")) as f:
        cfg = _wrap(yaml.safe_load(f))
    if "data.prefix" in kv:
        cfg["data"]["prefix"] = kv["data.prefix"]

    dataset = build_dataset(cfg)
    ws = get_workspace(cfg.select("workspace", "simple"))(
        gnn=cfg["gnn"], loss=cfg["loss"], block_size=dataset.block_size,
        epsilon=float(cfg["epsilon"]),
    )
    scaled = ws.name == "scaled"
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

        row = {"sample": int(i), "n": msize}
        for m in ("diagonal", "ic", "ainv", "fsai"):
            try:
                it, _, _ = get_cg_iter_time(
                    a_csr, r, rtol=1e-6, method=m, raise_on_fail=False
                )
                row[m] = it
            except Exception:  # noqa: BLE001
                row[m] = float("nan")
        for e in eps_grid:
            it, _, _ = get_pcg_iter_time(
                a_csr, r, l_csr, e, rtol=1e-6, scaled=scaled,
            )
            row[f"eps_{e:g}"] = it
        rows.append(row)
        print(row, flush=True)

    import pandas as pd

    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    df.to_csv(out, index=False)
    mean = df.drop(columns=["sample"]).mean()
    print("\nmeans:")
    print(mean.to_string())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
