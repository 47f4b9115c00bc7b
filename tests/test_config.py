"""Config system tests: composition, interpolation, overrides, missing."""

import pytest

from tpu_spai.config import Config, load_config


def test_compose_and_interpolate(tmp_path):
    (tmp_path / "sub.yaml").write_text("a:\n  b: 2\nwidth: ${a.b}\n")
    (tmp_path / "main.yaml").write_text(
        "defaults:\n  - sub\n  - _self_\nname: exp\nout: run_${name}\n"
    )
    cfg = load_config(tmp_path, "main")
    assert cfg.a["b"] == 2
    assert cfg.width == 2  # whole-string interpolation keeps int type
    assert cfg.out == "run_exp"


def test_overrides_and_add(tmp_path):
    (tmp_path / "c.yaml").write_text("x: 1\nnested:\n  y: 2\n")
    cfg = load_config(tmp_path, "c", ["x=5", "nested.y=7", "+extra.z=[1,2]"])
    assert cfg.x == 5
    assert cfg.nested["y"] == 7
    assert cfg.extra["z"] == [1, 2]


def test_missing_mandatory(tmp_path):
    (tmp_path / "m.yaml").write_text("must: '???'\n")
    with pytest.raises(ValueError, match="mandatory"):
        load_config(tmp_path, "m")
    cfg = load_config(tmp_path, "m", ["must=ok"])
    assert cfg.must == "ok"


def test_self_ordering(tmp_path):
    (tmp_path / "base.yaml").write_text("v: 1\nw: 1\n")
    (tmp_path / "top.yaml").write_text(
        "defaults:\n  - base\n  - _self_\nv: 2\n"
    )
    cfg = load_config(tmp_path, "top")
    assert cfg.v == 2 and cfg.w == 1


def test_repo_configs_compose():
    cfg = load_config("configs", "basic", ["exp_name=t", "batch_size=2", "epsilon=1e-3"])
    assert cfg.data["prefix"] == "generated/t"
    assert cfg.gnn["node_features"] == 16  # ${gnn_features}
    assert cfg.loss["name"] == "RelativeL2Loss_ANorm"
    cfg2 = load_config("configs", "basic_multidata", ["exp_name=t"])
    assert len(cfg2.data["all_prefix"]) == 8


def test_two_hop_dataset(tmp_path, rng):
    from tpu_spai.datagen.heat import HeatDatagen
    from tpu_spai.data.folder import FolderDataset

    p = tmp_path / "h"
    HeatDatagen(prefix=str(p), mesh="box:3", max_count=2, seed=1).generate()
    ds1 = FolderDataset(prefix=str(p), has_shared_features=True)
    ds2 = FolderDataset(prefix=str(p), has_shared_features=True, use_two_hop=True)
    s1, s2 = ds1.get(0), ds2.get(0)
    assert s2.edge_index.shape[1] > s1.edge_index.shape[1]
    # original entries preserved; new edges zero — compare assembled matrices
    from tpu_spai.sparse import graph_to_csr

    # descale (the mean normalization sees the added zero blocks, so the
    # two datasets have different matrix_scale — the assembled operator
    # must still agree)
    a1 = graph_to_csr(s1.edge_index, s1.matrix_values / s1.matrix_scale, s1.num_nodes)
    a2 = graph_to_csr(s2.edge_index, s2.matrix_values / s2.matrix_scale, s2.num_nodes)
    import numpy as np

    np.testing.assert_allclose(a2.toarray(), a1.toarray(), atol=1e-4)
