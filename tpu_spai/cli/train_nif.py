"""Train the NeuralPCG / NIF baselines (~ reference train_nif.py).

Forces the NifLoss_Norm loss (train_nif.py:27-29) and uses the npcg/nif
workspaces (lower-triangular restriction + LLT product preconditioner;
nif adds two-hop + drop tolerance).

Usage:
    python -m tpu_spai.cli.train_nif exp_name=npcg_heat data.prefix=generated/heat \
        workspace=npcg|nif [drop_tol=1e-4]
"""

from __future__ import annotations

import sys

import tpu_spai  # noqa: F401
from ..config import cli_config
from ..logging_utils import get_logger
from ..train import fit, evaluate, get_workspace
from .train import CONFIG_DIR, build_dataset

log = get_logger()


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    if str(cfg.loss["name"]).lower() != "nifloss_norm":
        log.warning("Loss function in config is not NifLoss_Norm. Enforcing...")
        cfg.loss["name"] = "NifLoss_Norm"

    dataset = build_dataset(cfg)
    ws_name = cfg.select("workspace", "npcg")
    if ws_name not in ("npcg", "nif"):
        raise ValueError(f"train_nif supports npcg|nif, got {ws_name}")
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
