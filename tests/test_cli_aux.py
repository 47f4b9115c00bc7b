"""Smoke e2e tests for the auxiliary CLI entry points (SURVEY §2.1):
cond, train_nif, train_neural_if, train_neural_pcg_heat,
infer_neural_pcg_heat — tiny data, a couple of epochs, CPU."""

import numpy as np
import pandas as pd
import pytest

from tpu_spai.cli import train as train_cli
from tpu_spai.datagen.synthetic import SyntheticDatagen


@pytest.fixture(scope="module")
def tiny_synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_aux")
    prefix = root / "synthetic"
    SyntheticDatagen(
        prefix=str(prefix), max_count=6, low=80, high=110,
        sparsity=3e-2, alpha=1e-3, seed=7,
    ).generate()
    return root, prefix


_DATA_FLAGS = [
    "data.is_fixed_topology=false",
    "data.has_shared_features=false",
    "data.use_node_features=false",
    "gnn_features=8",
    "gnn.num_mp_layers=1",
    "batch_size=3",
]


def test_cond_cli(tiny_synth):
    root, prefix = tiny_synth
    out = root / "cond_train"
    train_cli.main([
        "exp_name=cond_e2e", f"data.prefix={prefix}", *_DATA_FLAGS,
        "trainer.max_epochs=2", "trainer.check_val_every_n_epoch=99",
        "checkpoint.every_n_epochs=2", "check_methods=[none]",
        f"output_dir={out}",
    ])
    from tpu_spai.cli import cond as cond_cli

    cond_out = root / "cond_out"
    cond_cli.main([
        "exp_name=cond_e2e", f"data.prefix={prefix}", *_DATA_FLAGS,
        f"pretrained={out}/checkpoints", "max_samples=1",
        f"out_dir={cond_out}",
    ])
    cond_csv = cond_out / "cond_cond_e2e.csv"
    kap_csv = cond_out / "kaporin_cond_e2e.csv"
    assert cond_csv.exists() and kap_csv.exists()
    df = pd.read_csv(cond_csv)
    assert {"neural", "none", "diag"} <= set(df.columns) or len(df) > 0


def test_train_nif_cli(tiny_synth, tmp_path):
    root, prefix = tiny_synth
    from tpu_spai.cli import train_nif as nif_cli

    params = nif_cli.main([
        "exp_name=nif_e2e", f"data.prefix={prefix}", *_DATA_FLAGS,
        "workspace=npcg", "trainer.max_epochs=1",
        "trainer.check_val_every_n_epoch=99", "check_methods=[none]",
        f"output_dir={tmp_path}/nif_out",
    ])
    assert params is not None


class _PtGraph:
    """Minimal PyG-Data lookalike (module-level: torch.save pickles it)."""


def _write_pt_graphs(folder, n_graphs=4, n=60, seed=3):
    import torch

    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for gi in range(n_graphs):
        import scipy.sparse as sp

        m = sp.random(n, n, density=0.06, random_state=rng, format="csr")
        a = sp.csr_matrix(m + m.T + sp.eye(n) * 4.0)
        coo = a.tocoo()

        g = _PtGraph()
        g.x = torch.tensor(
            rng.standard_normal((n, 2)).astype(np.float32))
        g.edge_index = torch.tensor(
            np.stack([coo.row, coo.col]).astype(np.int64))
        g.edge_attr = torch.tensor(coo.data.astype(np.float32))
        torch.save(g, folder / f"g{gi}.pt")


def test_train_neural_if_cli(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841
    data = tmp_path / "Random"
    _write_pt_graphs(data)
    from tpu_spai.cli import train_neural_if as tni_cli

    params = tni_cli.main([
        "exp_name=neuralif_e2e", f"data_path={data}",
        "gnn_features=8", "gnn.num_mp_layers=1", "batch_size=2",
        "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=99",
        "check_methods=[none]", f"output_dir={tmp_path}/out",
    ])
    assert params is not None


def test_heatmultisource_train_and_infer(tmp_path):
    from tpu_spai.cli import train_neural_pcg_heat as tph_cli

    params = tph_cli.main([
        "exp_name=heatms_e2e", "n_domains=2", "steps_per_domain=2",
        "gnn_features=8", "gnn.num_mp_layers=1", "batch_size=2",
        "trainer.max_epochs=1", "trainer.check_val_every_n_epoch=99",
        "check_methods=[none]", f"output_dir={tmp_path}/out",
    ])
    assert params is not None

    from tpu_spai.cli import infer_neural_pcg_heat as iph_cli

    iph_cli.main([
        "exp_name=heatms_e2e", "n_domains=2", "steps_per_domain=2",
        "gnn_features=8", "gnn.num_mp_layers=1",
        f"pretrained={tmp_path}/out/checkpoints", "max_samples=1",
        f"out_dir={tmp_path}/infer_out",
    ])
    import glob

    assert glob.glob(str(tmp_path / "infer_out" / "*.csv"))
