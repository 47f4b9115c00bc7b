"""External-dataset adapters: NIF torch graphs + heat multi-source."""

import numpy as np
import pytest


def test_nif_torch_dataset_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace as FakeData

    # build two tiny SPD graphs in the NeuralIF .pt layout
    rng = np.random.default_rng(0)
    for i in range(2):
        n = 12
        m = np.tril(rng.random((n, n)) < 0.3) | np.eye(n, dtype=bool)
        a = (m | m.T).astype(np.float64) * rng.random((n, n))
        a = (a + a.T) / 2 + n * np.eye(n)
        r, c = np.nonzero(a)
        d = FakeData()
        d.x = torch.tensor(rng.standard_normal((n, 1)), dtype=torch.float32)
        d.edge_index = torch.tensor(np.stack([r, c]), dtype=torch.long)
        d.edge_attr = torch.tensor(a[r, c], dtype=torch.float32).reshape(-1, 1)
        torch.save(d, tmp_path / f"g{i}.pt")

    from tpu_spai.data.adapters import NIFTorchDataset

    ds = NIFTorchDataset(tmp_path, seed=1)
    assert len(ds) == 2
    s = ds.get(0)
    assert s.block_size == 1
    assert s.inv_diag is not None and np.isfinite(s.inv_diag).all()
    # matrix round-trips
    from tpu_spai.sparse import graph_to_csr

    a_back = graph_to_csr(s.edge_index, s.matrix_values, s.num_nodes)
    assert a_back.nnz == s.edge_index.shape[1]


def test_heat_multisource_systems_are_spd():
    from tpu_spai.data.adapters import HeatMultiSourceDataset
    from tpu_spai.sparse import graph_to_csr

    ds = HeatMultiSourceDataset(n_domains=2, steps_per_domain=2,
                                res_range=(6, 8), seed=3)
    assert len(ds) == 4
    s = ds.get(0)
    assert s.x.shape[1] == 4  # [pos_x, pos_y, u, dirichlet]
    assert s.edge_attr.shape[1] == 2  # [len, a_ij]
    a = graph_to_csr(s.edge_index, s.matrix_values, s.num_nodes)
    w = np.linalg.eigvalsh(a.toarray())
    assert w.min() > 0
    # time series: subsequent steps have evolving u feature
    s1 = ds.get(1)
    assert not np.allclose(s.x[:, 2], s1.x[:, 2])
