"""Training entry point (~ reference train.py).

Usage:
    python -m tpu_spai.cli.train exp_name=synthetic data.prefix=generated/synthetic \
        [workspace=simple|scaled|npcg|nif] [--config-name=basic_multidata] [key=value ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax

import tpu_spai  # noqa: F401
from ..config import cli_config
from ..data.folder import FolderDataset, MultiFolderDataset
from ..logging_utils import get_logger
from ..train import fit, evaluate, get_workspace
from ..train.checkpoints import latest_checkpoint, load_checkpoint

log = get_logger()

CONFIG_DIR = Path(__file__).resolve().parents[2] / "configs"


def build_dataset(cfg):
    data_cfg = dict(cfg.data)
    use_multi = "all_prefix" in data_cfg
    log.info(f"Use multidata: {use_multi}")
    if use_multi:
        all_prefix = data_cfg.pop("all_prefix")
        data_cfg.pop("prefix", None)
        return MultiFolderDataset(all_prefix, **data_cfg)
    return FolderDataset(**data_cfg)


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    dataset = build_dataset(cfg)
    log.info(
        f"dataset: len={len(dataset)} node_feat={dataset.num_node_features} "
        f"edge_feat={dataset.num_edge_features} block={dataset.block_size}"
    )

    ws_cls = get_workspace(cfg.select("workspace", "simple"))
    workspace = ws_cls(
        gnn=cfg.gnn,
        loss=cfg.loss,
        block_size=dataset.block_size,
        epsilon=float(cfg.epsilon),
        batch_less=bool(cfg.select("batch_less", False)),
    )

    # warm start (~ train.py:63-68 pretrained= handling)
    pretrained = cfg.select("pretrained", "")
    init_params = None
    if pretrained:
        from pathlib import Path as _P

        import jax as _jax

        from ..data.batching import collate

        ckpt = _P(pretrained)
        if ckpt.is_dir() and (ckpt / "latest.json").exists():
            ckpt = latest_checkpoint(ckpt)
        example = collate([dataset.get(0)])
        init_params = load_checkpoint(
            ckpt, workspace.init_params(_jax.random.key(0), example)
        )
        log.info(f"Loaded pretrained model from {ckpt}")

    params = fit(
        workspace,
        dataset,
        cfg,
        out_dir=cfg.select("output_dir"),
        seed=int(cfg.select("seed", 42)),
        init_params=init_params,
    )

    # test pass on the val split (reference: trainer.test on val loader).
    # skip_test=true skips it — used by intermediate segments of a
    # segmented run (trainer.epochs_per_run), where the per-segment test
    # pass costs minutes of TPU time without adding signal.
    if bool(cfg.select("skip_test", False)):
        log.info("skip_test=true: skipping end-of-run test pass")
        return params
    from ..data.folder import split_dataset

    _, val_idx = split_dataset(len(dataset), cfg.split["train"], seed=42)
    stats = evaluate(workspace, dataset, params, cfg, indices=val_idx[:8])
    if stats:
        keys = sorted(stats[0])
        means = {k: sum(s.get(k, 0.0) for s in stats) / len(stats) for k in keys}
        for k, v in means.items():
            log.info(f"test mean {k}: {v:.3f}")
    return params


if __name__ == "__main__":
    main()
