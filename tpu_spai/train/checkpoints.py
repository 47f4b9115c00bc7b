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


def _has_scan(tree) -> bool:
    if isinstance(tree, dict):
        return "mp_scan" in tree or any(_has_scan(v) for v in tree.values())
    if hasattr(tree, "_fields") or isinstance(tree, (tuple, list)):
        return any(_has_scan(v) for v in tree)
    return False


def save_checkpoint(ckpt_dir, epoch: int, params, cfg=None, opt_state=None) -> Path:
    # on-disk convention: ALWAYS the layered (mp_0..mp_{L-1}) format, so
    # every checkpoint loads into layered models, scan_mp models, and
    # the slotted/dist inference paths alike
    from ..gnn.layers import unstack_mp_params

    if _has_scan(params):
        params = unstack_mp_params(params)
    if opt_state is not None and _has_scan(opt_state):
        opt_state = unstack_mp_params(opt_state)
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / f"epoch_{epoch:04d}").resolve()
    c = _ckptr()
    c.save(path, params, force=True)
    if opt_state is not None:
        # full-resume state (Lightning checkpoints carry optimizer state too)
        c.save(Path(str(path) + "_opt"), opt_state, force=True)
    # orbax saves are ASYNC: block until the directories are final BEFORE
    # latest.json is written. A process that exits right after fit()
    # (skip_test segments) used to kill the write mid-flight, leaving an
    # .orbax-checkpoint-tmp dir + a latest.json pointing at it — and the
    # next segment "found no checkpoint" and restarted from scratch
    # (bunny epoch-679 incident, round 5).
    c.wait_until_finished()
    if cfg is not None:
        with open(ckpt_dir / "config.yaml", "w") as f:
            yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f)
    with open(ckpt_dir / "latest.json", "w") as f:
        json.dump({"epoch": epoch, "path": str(path)}, f)
    return path


def _complete_epoch_dirs(ckpt_dir):
    """Sorted [(epoch, path)] of COMPLETE param checkpoints (skips _opt
    companions and interrupted .orbax-checkpoint-tmp writes)."""
    out = []
    for p in Path(ckpt_dir).glob("epoch_[0-9]*"):
        name = p.name
        if (
            name.endswith("_opt")
            or ".orbax-checkpoint-tmp" in name
            or not p.is_dir()
        ):
            continue
        try:
            ep = int(name.split("_")[1])
        except (IndexError, ValueError):
            continue
        out.append((ep, p))
    return sorted(out)


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    meta = Path(ckpt_dir) / "latest.json"
    if meta.exists():
        with open(meta) as f:
            p = Path(json.load(f)["path"])
        if p.is_dir():
            return p
    # latest.json missing, unreadable, or pointing at an interrupted
    # async write: fall back to the newest COMPLETE epoch dir instead of
    # "no checkpoint" — a killed save must cost one checkpoint interval,
    # never a from-scratch restart over a long continuation.
    done = _complete_epoch_dirs(ckpt_dir)
    return done[-1][1].resolve() if done else None


def load_checkpoint(path, example_params) -> Any:
    """Restore params; `example_params` provides the tree structure/shapes
    (e.g. from `workspace.init_params` on one batch). A scan_mp example
    is transparently restored from the layered on-disk format."""
    import orbax.checkpoint as ocp

    from ..gnn.layers import stack_mp_params, unstack_mp_params

    path = Path(path).resolve()
    scan = _has_scan(example_params)
    if scan:
        example_params = unstack_mp_params(example_params)
    target = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x), example_params
    )
    restored = _ckptr().restore(path, target)
    return stack_mp_params(restored) if scan else restored


def load_opt_state(path, example_opt_state) -> Any:
    """Restore optimizer state saved next to a params checkpoint (same
    layered-on-disk convention as load_checkpoint)."""
    import orbax.checkpoint as ocp

    from ..gnn.layers import stack_mp_params, unstack_mp_params

    path = Path(str(Path(path).resolve()) + "_opt")
    scan = _has_scan(example_opt_state)
    if scan:
        example_opt_state = unstack_mp_params(example_opt_state)
    target = jax.tree_util.tree_map(
        lambda x: ocp.utils.to_shape_dtype_struct(x), example_opt_state
    )
    restored = _ckptr().restore(path, target)
    return stack_mp_params(restored) if scan else restored
