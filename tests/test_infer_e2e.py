"""End-to-end infer CLI: datagen -> train briefly -> benchmark harness.

Exercises the full `python -m tpu_spai.cli.infer` path on CPU, including
the gsel fast-kernel solve (impl auto-selects 'xla' off-TPU) and the CSV
schemas the reference's misc/ scripts consume (infer.py:374-384).
"""

import numpy as np
import pandas as pd
import pytest

from tpu_spai.cli import infer as infer_cli
from tpu_spai.cli import train as train_cli
from tpu_spai.datagen.synthetic import SyntheticDatagen


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer_e2e")
    prefix = root / "synthetic"
    SyntheticDatagen(
        prefix=str(prefix), max_count=8, low=100, high=140,
        sparsity=2e-2, alpha=1e-3, seed=11,
    ).generate()
    out = root / "out"
    train_cli.main([
        "exp_name=infer_e2e",
        f"data.prefix={prefix}",
        "data.is_fixed_topology=false",
        "data.has_shared_features=false",
        "data.use_node_features=false",
        "trainer.max_epochs=3",
        "trainer.check_val_every_n_epoch=99",
        "checkpoint.every_n_epochs=3",
        "batch_size=4",
        "gnn_features=8",
        "gnn.num_mp_layers=2",
        "check_methods=[none]",
        f"output_dir={out}",
    ])
    return root, prefix, out


def test_infer_cli_writes_csvs(trained):
    root, prefix, out = trained
    infer_out = root / "infer_out"
    infer_cli.main([
        "exp_name=infer_e2e",
        f"data.prefix={prefix}",
        "data.is_fixed_topology=false",
        "data.has_shared_features=false",
        "data.use_node_features=false",
        "gnn_features=8",
        "gnn.num_mp_layers=2",
        f"pretrained={out}/checkpoints",
        "check_methods=[none,diagonal,ainv,fsai]",
        "max_samples=1",
        "+multi_rhs=3",
        f"out_dir={infer_out}",
    ])
    per_sample = infer_out / "all_infer_infer_e2e_6.csv"
    agg = infer_out / "infer_infer_e2e_6.csv"
    assert per_sample.exists() and agg.exists()
    df = pd.read_csv(per_sample)
    assert "Matrix Size" in df.columns
    keys = set(df["Key"]) if "Key" in df.columns else set(df.iloc[:, 0])
    # gsel fast-kernel row must be present (xla impl on CPU)
    assert any("Neural+TPU" in str(k) for k in keys), keys
    assert any("Neural" == str(k) for k in keys), keys
    # fully on-device slot-layout construction + solve row
    assert any("NeuralSlot+TPU" in str(k) for k in keys), keys
    # batched multi-RHS row (+multi_rhs=3 -> per-column time, max iters)
    assert any("NeuralMRHS3+TPU" in str(k) for k in keys), keys
    # classical FSAI rides the gsel device path too (2-SpMV apply — the
    # reference's CUDA columns for these methods, infer.py:310-321). AINV
    # may break down (non-finite factor) on this ill-conditioned synthetic
    # family: if its TPU row is present its iterations must be finite,
    # otherwise it must have been honestly skipped (not nan-filled) —
    # the finiteness check below covers both outcomes.
    assert any("PCG-fsai-tpu" in str(k) for k in keys), keys
    tpu_rows = df[df["Key"].astype(str).str.contains("tpu")]
    assert np.isfinite(tpu_rows["#Iteration"].to_numpy(float)).all()


def test_infer_ic_device_row_topology_cache(tmp_path):
    """Device-IC row with the per-topology level-schedule cache
    (VERDICT r3 item 8): fixed-topology dataset, 2 samples — the second
    sample reuses the cached pattern work; the row must exist for both
    with finite iterations."""
    from tpu_spai.datagen.heat import HeatDatagen

    prefix = tmp_path / "heat_ic"
    HeatDatagen(
        prefix=str(prefix), mesh="box:5", max_count=6, seed=3,
    ).generate()
    out = tmp_path / "out"
    train_cli.main([
        "exp_name=ic_e2e",
        f"data.prefix={prefix}",
        "data.is_fixed_topology=true",
        "data.has_shared_features=true",
        "data.use_node_features=true",
        "data.use_mask_as_node_feature=true",
        "trainer.max_epochs=2",
        "trainer.check_val_every_n_epoch=99",
        "checkpoint.every_n_epochs=2",
        "gnn_features=8", "gnn.num_mp_layers=1",
        "check_methods=[none]",
        f"output_dir={out}",
    ])
    infer_out = tmp_path / "infer_out"
    infer_cli.main([
        "exp_name=ic_e2e",
        f"data.prefix={prefix}",
        "data.is_fixed_topology=true",
        "data.has_shared_features=true",
        "data.use_node_features=true",
        "data.use_mask_as_node_feature=true",
        "gnn_features=8", "gnn.num_mp_layers=1",
        f"pretrained={out}/checkpoints",
        "check_methods=[ic]",
        "max_samples=2",
        f"out_dir={infer_out}",
    ])
    df = pd.read_csv(infer_out / "all_infer_ic_e2e_6.csv")
    ic_rows = df[df["Key"] == "PCG-ic-tpu"]
    assert len(ic_rows) == 2, set(df["Key"])
    assert np.isfinite(ic_rows["#Iteration"]).all()
    # host-vs-device iteration sanity: same factor, chunk64 tier
    host = df[df["Key"] == "PCG-ic-cpu"]["#Iteration"]
    assert (ic_rows["#Iteration"] <= 3 * host.max() + 5).all()
