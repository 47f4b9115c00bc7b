"""Optimizer/scheduler factories (optax) — parity with utils/optim.py.

adam / adamw / sgd optimizers; exp / cosine / cosine_warmup / onecycle /
none schedulers, stepped per-epoch like torch's schedulers (the reference
calls `scheduler.step()` once per epoch under Lightning's default), plus
global-norm gradient clipping (trainer.yaml `gradient_clip_val`).
"""

from __future__ import annotations

from typing import Optional

import optax


def create_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    max_epochs: int,
    params: Optional[dict] = None,
):
    params = dict(params or {})
    name = (name or "none").lower()
    if name == "none":
        return base_lr
    if name == "exp":
        gamma = params.get("gamma", 0.99)
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=steps_per_epoch,
            decay_rate=gamma,
            staircase=True,
        )
    if name == "cosine":
        t_max = params.get("T_max", max_epochs) * steps_per_epoch
        return optax.cosine_decay_schedule(init_value=base_lr, decay_steps=t_max)
    if name == "cosine_warmup":
        t0 = params.get("T_0", max(1, max_epochs // 4)) * steps_per_epoch
        return optax.sgdr_schedule(
            [
                dict(init_value=base_lr, peak_value=base_lr, decay_steps=t0,
                     warmup_steps=0, end_value=0.0)
            ]
            * 4
        )
    if name == "onecycle":
        total = params.get("total_steps", max_epochs * steps_per_epoch)
        return optax.linear_onecycle_schedule(
            transition_steps=total, peak_value=params.get("max_lr", base_lr)
        )
    raise ValueError(f"Unknown scheduler {name}")


def create_optimizer(
    opt_name: str,
    opt_params: dict,
    sched_name: str = "none",
    sched_params: Optional[dict] = None,
    steps_per_epoch: int = 1,
    max_epochs: int = 1,
    gradient_clip_val: Optional[float] = None,
) -> optax.GradientTransformation:
    opt_params = dict(opt_params or {})
    lr = float(opt_params.pop("lr", 1e-3))
    schedule = create_schedule(sched_name, lr, steps_per_epoch, max_epochs, sched_params)

    name = opt_name.lower()
    if name == "adam":
        tx = optax.adam(schedule, **opt_params)
    elif name == "adamw":
        wd = float(opt_params.pop("weight_decay", 0.0))
        tx = optax.adamw(schedule, weight_decay=wd, **opt_params)
    elif name == "sgd":
        tx = optax.sgd(schedule, **opt_params)
    else:
        raise ValueError(f"Unknown optimizer {opt_name}")

    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(float(gradient_clip_val)), tx)
    return tx
