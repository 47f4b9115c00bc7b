"""Train on the heat-multisource 2-D dataset (~ train_neural_pcg_heat.py).

Uses `HeatMultiSourceDataset` (reads the published archive layout when
present, synthesizes an equivalent implicit-Euler heat time-series corpus
otherwise) and trains the npcg workspace by default.

Usage:
    python -m tpu_spai.cli.train_neural_pcg_heat exp_name=heatmultisource \
        [n_domains=8] [steps_per_domain=8] [workspace=npcg]
"""

from __future__ import annotations

import sys

import tpu_spai  # noqa: F401
from ..config import cli_config
from ..data.adapters import HeatMultiSourceDataset
from ..logging_utils import get_logger
from ..train import fit, evaluate, get_workspace
from .train import CONFIG_DIR

log = get_logger()


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    dataset = HeatMultiSourceDataset(
        n_domains=int(cfg.select("n_domains", 8)),
        steps_per_domain=int(cfg.select("steps_per_domain", 8)),
        seed=int(cfg.select("seed", 42)),
    )
    ws_name = cfg.select("workspace", "npcg")
    kwargs = dict(
        gnn=cfg.gnn,
        loss=cfg.loss,
        block_size=dataset.block_size,
        epsilon=float(cfg.epsilon),
        batch_less=bool(cfg.select("batch_less", False)),
    )
    if ws_name == "nif":
        kwargs["drop_tol"] = float(cfg.select("drop_tol", 0.0))
    workspace = get_workspace(ws_name)(**kwargs)
    params = fit(workspace, dataset, cfg, out_dir=cfg.select("output_dir"),
                 seed=int(cfg.select("seed", 42)))

    from ..data.folder import split_dataset

    _, val_idx = split_dataset(len(dataset), cfg.split["train"], seed=42)
    evaluate(workspace, dataset, params, cfg, indices=val_idx[:4])
    return params


if __name__ == "__main__":
    main()
