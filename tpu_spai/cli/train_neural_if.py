"""Train on the NeuralIF "Random" dataset (~ reference train_neural_if.py).

Reads directories of torch-saved PyG graphs (`data_path/{train,val,test}`
or a single directory of .pt files) through `NIFTorchDataset` and trains
any workspace on them.

Usage:
    python -m tpu_spai.cli.train_neural_if exp_name=nif data_path=data/Random \
        [workspace=simple|npcg|nif]
"""

from __future__ import annotations

import sys
from pathlib import Path

import tpu_spai  # noqa: F401
from ..config import cli_config
from ..data.adapters import NIFTorchDataset
from ..logging_utils import get_logger
from ..train import fit, evaluate, get_workspace
from .train import CONFIG_DIR

log = get_logger()


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    root = Path(cfg.select("data_path", "data/Random"))
    train_dir = root / "train" if (root / "train").exists() else root
    dataset = NIFTorchDataset(train_dir, seed=int(cfg.select("seed", 42)))

    ws_name = cfg.select("workspace", "simple")
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
