"""Orbax checkpointing (params + config), ~ Lightning ModelCheckpoint.

The reference saves every epoch with hyperparameters embedded
(train.py:82-89, workspace.py:52 save_hyperparameters); here a checkpoint
directory holds orbax param trees per epoch plus the composed config as
YAML, and `load_checkpoint` restores by example tree.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import yaml


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir, epoch: int, params, cfg=None, opt_state=None) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / f"epoch_{epoch:04d}").resolve()
    _ckptr().save(path, params, force=True)
    if opt_state is not None:
        # full-resume state (Lightning checkpoints carry optimizer state too)
        _ckptr().save(Path(str(path) + "_opt"), opt_state, force=True)
    if cfg is not None:
        with open(ckpt_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f)
    with open(ckpt_dir / "latest.json", "w") as f:
        json.dump({"epoch": epoch, "path": str(path)}, f)
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    meta = Path(ckpt_dir) / "latest.json"
    if not meta.exists():
        return None
    with open(meta) as f:
        return Path(json.load(f)["path"])


def load_checkpoint(path, example_params) -> Any:
    """Restore params; `example_params` provides the tree structure/shapes
    (e.g. from `workspace.init_params` on one batch)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    target = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x), example_params
    )
    return _ckptr().restore(path, target)


def load_opt_state(path, example_opt_state) -> Any:
    """Restore optimizer state saved next to a params checkpoint."""
    import orbax.checkpoint as ocp

    path = Path(str(Path(path).resolve()) + "_opt")
    target = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x), example_opt_state
    )
    return _ckptr().restore(path, target)
