"""Data-parallel training over a device mesh (shard_map + psum gradients).

The reference trains on a single GPU (SURVEY §2.10); this module is the
TPU-native scale-out for training: identical-shape `GraphBatch`es are
stacked along a leading shard axis, each device computes its loss/grad on
its shard, and gradients are `pmean`-ed before the optax update. The tiny
GNN (16-wide) needs no TP/PP — replicated params + sharded batch is the
whole story, and the row-partitioned solver (dist/cg.py) is the
model-parallel axis of the *solve* side.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..data.batching import GraphBatch


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack identically-shaped batches along a new leading shard axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_dp_train_step(
    workspace,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Returns jitted (params, opt_state, stacked_batch) -> (params,
    opt_state, loss) with psum-averaged gradients over `axis_name`."""

    def step(params, opt_state, shard_batch):
        batch = jax.tree_util.tree_map(lambda a: a[0], shard_batch)
        (loss, _aux), grads = jax.value_and_grad(workspace.loss, has_aux=True)(
            params, batch
        )
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    shard0 = P(axis_name)

    def specs_of(tree):
        return jax.tree_util.tree_map(lambda _: shard0, tree)

    def wrapped(params, opt_state, stacked):
        fn = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), specs_of(stacked)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return fn(params, opt_state, stacked)

    return jax.jit(wrapped)


def fit_data_parallel(
    workspace,
    dataset,
    cfg,
    mesh: Mesh,
    seed: int = 42,
    axis_name: str = "data",
):
    """Data-parallel `fit`: each step consumes n_devices micro-batches.

    Requires fixed buckets so shard batches stack; uses the same optimizer
    config as the single-device loop.
    """
    from ..data.batching import collate, _bucket
    from ..data.folder import split_dataset
    from ..train.optim import create_optimizer
    from ..logging_utils import get_logger

    log = get_logger()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    rng = np.random.default_rng(seed)
    train_idx, _ = split_dataset(len(dataset), cfg.split["train"], seed=42)
    batch_size = int(cfg.batch_size)

    # probe buckets across the dataset
    ns, es, ks = [], [], []
    for i in train_idx[: min(64, len(train_idx))]:
        s = dataset.get(i)
        ns.append(s.num_nodes)
        es.append(s.edge_index.shape[1])
        deg = np.bincount(s.edge_index[0]).max()
        ks.append(int(deg))
    buckets = dict(
        node_bucket=_bucket(max(ns) * batch_size),
        edge_bucket=_bucket(max(es) * batch_size),
        ell_width=int(max(ks)),
    )
    log.info(f"DP buckets: {buckets}, devices={n_dev}")

    def micro(ids):
        return collate([dataset.get(i) for i in ids], **buckets)

    example = micro(train_idx[:batch_size])
    params = workspace.init_params(jax.random.key(seed), example)
    tcfg = cfg.trainer
    max_epochs = int(tcfg["max_epochs"])
    steps_per_epoch = max(1, len(train_idx) // (batch_size * n_dev))
    tx = create_optimizer(
        cfg.optimizer["name"], dict(cfg.optimizer.get("params") or {}),
        cfg.scheduler["name"], dict(cfg.scheduler.get("params") or {}),
        steps_per_epoch=steps_per_epoch, max_epochs=max_epochs,
        gradient_clip_val=tcfg.get("gradient_clip_val"),
    )
    opt_state = tx.init(params)
    dp_step = make_dp_train_step(workspace, tx, mesh, axis_name)

    for epoch in range(max_epochs):
        idx = np.array(train_idx)
        rng.shuffle(idx)
        group = batch_size * n_dev
        losses = []
        for off in range(0, len(idx) - group + 1, group):
            shard_batches = [
                micro(idx[off + d * batch_size : off + (d + 1) * batch_size])
                for d in range(n_dev)
            ]
            stacked = stack_batches(shard_batches)
            params, opt_state, loss = dp_step(params, opt_state, stacked)
            losses.append(float(loss))
        log.info(f"DP epoch {epoch}: loss={np.mean(losses):.4e}")
    return params
