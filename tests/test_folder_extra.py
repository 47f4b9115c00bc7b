"""Folder-contract extras: multi-RHS columns, lhs/gt flow, file-RHS mode."""

import numpy as np
import jax

from tpu_spai.data.batching import collate
from tpu_spai.data.folder import FolderDataset
from tpu_spai.datagen.synthetic import SyntheticDatagen
from tpu_spai.gnn.losses import create_loss


def test_lhs_rhs_gt_flow(tmp_path, rng):
    # generate with direct-solve lhs + 3 stacked RHS columns per matrix
    gen = SyntheticDatagen(
        prefix=str(tmp_path / "s"), max_count=3, low=40, high=60,
        sparsity=8e-2, alpha=1e-2, seed=3, with_lhs=True, rhs_per_matrix=3,
    )
    gen.generate()
    ds = FolderDataset(
        prefix=str(tmp_path / "s"), is_fixed_topology=False,
        has_shared_features=False, use_node_features=False,
        use_random_rhs=False,
    )
    # 3 matrices x 3 columns = 9 samples
    assert len(ds) == 9
    s = ds.get(0)
    assert s.gt is not None
    # A (descaled) @ gt (descaled) == rhs: the loader's residual oracle
    from tpu_spai.sparse import graph_to_csr

    a = graph_to_csr(
        s.edge_index, s.matrix_values / s.matrix_scale, s.num_nodes
    )
    gt = np.asarray(s.gt).ravel() * s.matrix_scale  # undo make_data descale
    r = np.asarray(s.residual).ravel()
    np.testing.assert_allclose(a @ gt, r, rtol=1e-4, atol=1e-6)

    # PlainNorm losses consume gt through the batch
    batch = collate([ds.get(0), ds.get(1)])
    assert batch.gt is not None
    d = jax.numpy.asarray(rng.standard_normal((batch.n_nodes, 1)))
    loss = create_loss("relativel2loss_plainnorm")(batch, d, batch.graph.blocks)
    assert np.isfinite(float(loss))


def test_columns_are_distinct_samples(tmp_path):
    gen = SyntheticDatagen(
        prefix=str(tmp_path / "s2"), max_count=2, low=30, high=40,
        sparsity=1e-1, alpha=1e-2, seed=5, rhs_per_matrix=2,
    )
    gen.generate()
    ds = FolderDataset(
        prefix=str(tmp_path / "s2"), is_fixed_topology=False,
        has_shared_features=False, use_node_features=False,
        use_random_rhs=False,
    )
    assert len(ds) == 4
    r0 = np.asarray(ds.get(0).residual)
    r1 = np.asarray(ds.get(1).residual)
    assert not np.allclose(r0, r1)  # different columns -> different samples
