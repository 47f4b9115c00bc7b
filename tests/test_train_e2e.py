"""End-to-end: datagen -> folder contract -> dataset -> train -> converge.

The minimum full-capability slice (SURVEY §7 stage 4): train the GNN on a
tiny synthetic family and check that the learned SPAI preconditioner beats
unpreconditioned CG on held-out systems.
"""

import numpy as np
import pytest

from tpu_spai.config import load_config
from tpu_spai.data.folder import FolderDataset
from tpu_spai.datagen.synthetic import SyntheticDatagen
from tpu_spai.train import fit, get_workspace
from tpu_spai.train.loop import check_convergence
from tpu_spai.data.batching import collate

CONFIG_DIR = "configs"


@pytest.fixture(scope="module")
def tiny_synthetic(tmp_path_factory):
    prefix = tmp_path_factory.mktemp("data") / "synthetic"
    gen = SyntheticDatagen(
        prefix=str(prefix), max_count=12, low=120, high=160,
        sparsity=2e-2, alpha=1e-3, seed=7,
    )
    gen.generate()
    return str(prefix)


@pytest.fixture(scope="module")
def tiny_heat(tmp_path_factory):
    from tpu_spai.datagen.heat import HeatDatagen

    prefix = tmp_path_factory.mktemp("data") / "heat"
    HeatDatagen(prefix=str(prefix), mesh="box:6", max_count=16, seed=3).generate()
    return str(prefix)


def _cfg(prefix, **over):
    overrides = [
        "exp_name=test",
        f"data.prefix={prefix}",
        "data.is_fixed_topology=false",
        "data.has_shared_features=false",
        "data.use_node_features=false",
        "trainer.max_epochs=40",
        "trainer.check_val_every_n_epoch=40",
        "checkpoint.every_n_epochs=40",
        "batch_size=4",
        "gnn_features=8",
        "gnn.num_mp_layers=2",
        "check_methods=[none,diagonal]",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config(CONFIG_DIR, "basic", overrides)


def _cfg_heat(prefix, **over):
    overrides = [
        "exp_name=test_heat",
        f"data.prefix={prefix}",
        "trainer.max_epochs=60",
        "trainer.check_val_every_n_epoch=60",
        "checkpoint.every_n_epochs=60",
        "batch_size=4",
        "check_methods=[none,diagonal]",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config(CONFIG_DIR, "basic", overrides)


def test_train_simple_beats_unpreconditioned(tiny_heat, tmp_path):
    cfg = _cfg_heat(tiny_heat, output_dir=str(tmp_path / "out"))
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds.block_size,
        epsilon=float(cfg.epsilon),
    )
    params = fit(ws, ds, cfg, out_dir=str(tmp_path / "out"), seed=0)

    # held-out convergence: neural SPAI must beat unpreconditioned CG
    batch = collate([ds.get(0)])
    stats = check_convergence(
        ws, params, batch, ["none", "diagonal"], epsilon=float(cfg.epsilon),
        max_iter=2000,
    )
    assert stats["Val/cpu_neural_iter"] > 0
    assert stats["Val/cpu_neural_iter"] < stats["Val/cpu_none_iter"]
    # device PCG and host CG agree on the iteration count (small tolerance:
    # reduction order differs)
    assert abs(stats["Val/tpu_neural_iter"] - stats["Val/cpu_neural_iter"]) <= max(
        3, 0.1 * stats["Val/cpu_neural_iter"]
    )
    # checkpoint round-trip
    from tpu_spai.train.checkpoints import latest_checkpoint, load_checkpoint

    ck = latest_checkpoint(tmp_path / "out" / "checkpoints")
    assert ck is not None
    restored = load_checkpoint(ck, params)
    leaves0 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params)]
    leaves1 = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(restored)]
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(a, b)


def test_train_scaled_workspace_runs(tiny_synthetic, tmp_path):
    cfg = _cfg(
        tiny_synthetic,
        output_dir=str(tmp_path / "out2"),
        workspace="scaled",
        **{"trainer.max_epochs": 3, "trainer.check_val_every_n_epoch": 3},
    )
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("scaled")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds.block_size,
        epsilon=float(cfg.epsilon),
    )
    params = fit(ws, ds, cfg, out_dir=str(tmp_path / "out2"), seed=0)
    batch = collate([ds.get(1)])
    stats = check_convergence(
        ws, params, batch, ["none"], epsilon=float(cfg.epsilon), max_iter=2000
    )
    assert "Val/cpu_neural_iter" in stats


def test_train_npcg_workspace_runs(tiny_synthetic, tmp_path):
    cfg = _cfg(
        tiny_synthetic,
        output_dir=str(tmp_path / "out3"),
        workspace="npcg",
        **{"trainer.max_epochs": 3, "trainer.check_val_every_n_epoch": 3},
    )
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("npcg")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds.block_size,
        epsilon=float(cfg.epsilon),
    )
    params = fit(ws, ds, cfg, out_dir=str(tmp_path / "out3"), seed=0)
    batch = collate([ds.get(1)])
    stats = check_convergence(
        ws, params, batch, ["none"], epsilon=float(cfg.epsilon), max_iter=2000
    )
    assert "Val/cpu_neural_iter" in stats


def test_resume_missing_checkpoint_starts_fresh(tiny_synthetic, tmp_path):
    # first segment of a segmented run: resume= points at a checkpoint
    # dir that does not exist yet — must start fresh, not crash
    # (regression: the round-2 TPU queue lost its bunny training segments
    # to an orbax FileNotFoundError here)
    cfg = _cfg(
        tiny_synthetic,
        output_dir=str(tmp_path / "out3"),
        resume=str(tmp_path / "out3" / "checkpoints"),
        **{"trainer.max_epochs": 2},
    )
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds.block_size,
        epsilon=float(cfg.epsilon),
    )
    params = fit(ws, ds, cfg, out_dir=str(tmp_path / "out3"), seed=0)
    assert params is not None


def test_params_only_opt_state_fast_forwards_schedule_only():
    # ADVICE r3: the params-only resume fallback must fast-forward the
    # LR-schedule position but leave scale_by_adam's count at 0 so bias
    # correction warms up against the freshly zeroed moments
    import jax.numpy as jnp
    import optax

    from tpu_spai.train.loop import params_only_opt_state

    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(
            optax.exponential_decay(1e-3, 10, 0.99, staircase=True),
            weight_decay=3e-3,
        ),
    )
    state = tx.init({"w": jnp.ones((3,))})
    out = params_only_opt_state(state, 4320)

    def find(s, typ):
        hits = []

        def walk(node):
            if isinstance(node, typ):
                hits.append(node)
                return
            if hasattr(node, "_fields"):
                for f in node._fields:
                    walk(getattr(node, f))
            elif isinstance(node, (tuple, list)):
                for c in node:
                    walk(c)

        walk(s)
        return hits

    (adam,) = find(out, optax.ScaleByAdamState)
    scheds = find(out, optax.ScaleByScheduleState)
    assert int(adam.count) == 0
    assert scheds and all(int(s.count) == 4320 for s in scheds)


def test_resume_params_only_checkpoint(tiny_synthetic, tmp_path):
    # segment killed after pruning `_opt`: resume from a params-only
    # checkpoint must warm-restart (warn), not crash — including when
    # the `_opt` dir exists but is corrupt (ADVICE r3 low)
    import shutil

    out = tmp_path / "out_po"
    cfg = _cfg(
        tiny_synthetic,
        output_dir=str(out),
        **{"trainer.max_epochs": 2, "checkpoint.every_n_epochs": 1},
    )
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=ds.block_size,
        epsilon=float(cfg.epsilon),
    )
    fit(ws, ds, cfg, out_dir=str(out), seed=0)
    ckdir = out / "checkpoints"
    # prune every _opt sibling; corrupt one by leaving an empty dir
    for p in ckdir.glob("epoch_*_opt"):
        shutil.rmtree(p)
    from tpu_spai.train.checkpoints import latest_checkpoint

    last = latest_checkpoint(ckdir)
    (ckdir / (last.name + "_opt")).mkdir()  # corrupt/incomplete _opt
    cfg2 = _cfg(
        tiny_synthetic,
        output_dir=str(out),
        resume=str(ckdir),
        **{"trainer.max_epochs": 3, "checkpoint.every_n_epochs": 1},
    )
    fit(ws, ds, cfg2, out_dir=str(out), seed=0)  # must not raise
