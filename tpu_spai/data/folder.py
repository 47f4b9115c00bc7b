"""Folder-contract dataset reader (parity: neural_cg/data.py:339-667).

Dataset folder layout (written by `tpu_spai.datagen.base`, same contract as
the reference's DatagenBase, datagen_helper.py:230-322):

    <prefix>/
      mat/*.npy            fixed-topology: CSR values only (demo.mtx gives
                           the pattern), or
      mat/*.mtx            variable-topology: full MatrixMarket matrices
      rhs/*.npy            [n_dofs_or_nodes?, k] stacked right-hand sides —
                           each column is a separate sample
      lhs/*.npy            optional direct solutions (ground truth)
      mask/*.npy           optional [n, b] Dirichlet masks
      features/*.npy       optional [n, F] per-sample node features
      shared_features.npy  optional [n, Fs] topology-constant features
      demo.mtx             fixed-topology pattern (DOF-level CSR)
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.io import mmread

from .sample import AggKind, GraphSample, RawSample, make_features


def _block_graph_from_csr(
    mat: sp.csr_matrix, block_size: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """DOF CSR -> (block_values [nE,b,b], edge_index [2,nE], n_block_rows)."""
    from ..sparse.convert import blocks_from_coo

    if block_size == 1:
        coo = mat.tocoo()
        order = np.lexsort((coo.col, coo.row))
        vals = coo.data[order].reshape(-1, 1, 1)
        ei = np.stack([coo.row[order], coo.col[order]]).astype(np.int64)
        return vals, ei, mat.shape[0]
    vals, brow, bcol = blocks_from_coo(mat.tocoo(), block_size)
    ei = np.stack([brow, bcol]).astype(np.int64)
    return vals, ei, mat.shape[0] // block_size


class FolderDataset:
    """Reads the dataset-folder contract back into `GraphSample`s."""

    def __init__(
        self,
        prefix: str,
        is_fixed_topology: bool = True,
        load_into_memory: bool = True,
        block_size: int = 1,
        has_shared_features: bool = False,
        use_node_features: bool = True,
        use_matrix_as_edge_feature: bool = True,
        use_mask_as_node_feature: bool = True,
        use_node_features_as_edge_feature: bool = False,
        use_edge_features_as_node_feature: AggKind = "disable",
        use_random_rhs: bool = True,
        normalize_matrix: "bool | str" = "mean",
        use_two_hop: bool = False,
        seed: int = 0,
    ):
        self.path = Path(prefix)
        self.is_fixed_topology = is_fixed_topology
        # NIF baseline: expand sparsity to two hops before the GNN
        # (nif.py:266,278); new edges carry zero matrix blocks.
        self.use_two_hop = use_two_hop
        self.block_size = block_size
        self.rng = np.random.default_rng(seed)

        pat = "*.npy" if is_fixed_topology else "*.mtx"
        self.mat_files = sorted((self.path / "mat").glob(pat))
        if not self.mat_files and is_fixed_topology:
            # tolerate mtx in fixed mode too
            self.mat_files = sorted((self.path / "mat").glob("*.mtx"))
            self.is_fixed_topology = False
        self.lhs_files = sorted((self.path / "lhs").glob("*.npy"))
        self.rhs_files = sorted((self.path / "rhs").glob("*.npy"))
        self.mask_files = sorted((self.path / "mask").glob("*.npy"))
        self.feature_files = sorted((self.path / "features").glob("*.npy"))
        if not self.mat_files:
            raise FileNotFoundError(f"no matrices under {self.path / 'mat'}")
        if self.lhs_files:
            assert len(self.lhs_files) == len(self.mat_files)
        if self.rhs_files:
            assert len(self.rhs_files) == len(self.mat_files)

        self.shared_features = None
        if has_shared_features:
            self.shared_features = np.load(self.path / "shared_features.npy")

        # multi-RHS: every column of rhs/*.npy is its own sample
        # (data.py:390-397)
        samples: List[Tuple[int, int]] = []
        for idx, f in enumerate(self.rhs_files):
            cols = np.load(f)
            ncol = 1 if cols.ndim == 1 else cols.shape[1]
            for c in range(ncol):
                samples.append((idx, c))
        self.samples = samples

        self.use_node_features = use_node_features
        self.flags = dict(
            use_matrix_as_edge_feature=use_matrix_as_edge_feature,
            use_mask_as_node_feature=use_mask_as_node_feature,
            use_node_features_as_edge_feature=use_node_features_as_edge_feature,
            use_edge_features_as_node_feature=use_edge_features_as_node_feature,
            use_random_rhs=use_random_rhs,
            normalize_matrix=normalize_matrix,
        )

        if self.is_fixed_topology:
            topo_file = self.path / "demo.mtx"
            assert topo_file.exists(), f"fixed topology needs {topo_file}"
            self.topo_dofs = sp.csr_matrix(mmread(topo_file))
            self.topo_dofs.sort_indices()
            _, self.topo_edge_index, self.topo_nodes = _block_graph_from_csr(
                self.topo_dofs, block_size
            )

        # feature-count bookkeeping (data.py:412-432)
        self.num_node_features = 0
        if self.use_node_features:
            if self.feature_files:
                self.num_node_features = np.load(self.feature_files[0]).shape[1]
            if self.shared_features is not None:
                # shared features only count when node features are enabled
                # (data.py:415-419)
                self.num_node_features += self.shared_features.shape[1]
        if use_mask_as_node_feature:
            self.num_node_features += block_size
        self.num_edge_features = 0
        if use_matrix_as_edge_feature:
            self.num_edge_features += block_size * block_size
        if use_node_features_as_edge_feature:
            self.num_edge_features += self.num_node_features * 2
        if use_edge_features_as_node_feature != "disable":
            self.num_node_features += self.num_edge_features

        self._cache: Optional[List[RawSample]] = None
        if load_into_memory:
            self._cache = [self._load_raw(i) for i in range(len(self))]

    def __len__(self) -> int:
        return max(len(self.mat_files), len(self.samples))

    def _mat_and_col(self, idx: int) -> Tuple[int, int]:
        if self.samples:
            return self.samples[idx]
        return idx, 0

    def _load_raw(self, idx: int) -> RawSample:
        mat_id, col_id = self._mat_and_col(idx)
        mf = self.mat_files[mat_id]
        if mf.suffix == ".npy":
            values = np.load(mf)
            csr = sp.csr_matrix(
                (values, self.topo_dofs.indices, self.topo_dofs.indptr),
                shape=self.topo_dofs.shape,
            )
            block_values, edge_index, n_nodes = _block_graph_from_csr(
                csr, self.block_size
            )
        else:
            csr = sp.csr_matrix(mmread(mf))
            csr.sort_indices()
            block_values, edge_index, n_nodes = _block_graph_from_csr(
                csr, self.block_size
            )
        diagonals = csr.diagonal().reshape(-1, self.block_size)

        def load_cols(files):
            if not files:
                return None
            arr = np.load(files[mat_id])
            if arr.ndim == 1:
                arr = arr.reshape(-1, 1)
            return arr[:, col_id].reshape(-1, self.block_size)

        lhs = load_cols(self.lhs_files)
        rhs = load_cols(self.rhs_files)

        node_features = None
        if self.use_node_features:
            parts = []
            if self.feature_files:
                parts.append(np.load(self.feature_files[mat_id]))
            if self.shared_features is not None:
                parts.append(self.shared_features)
            if parts:
                node_features = np.concatenate(parts, axis=-1)

        mask = np.ones((n_nodes, self.block_size))
        if self.mask_files:
            mask = np.load(self.mask_files[mat_id]).reshape(n_nodes, self.block_size)

        return RawSample(
            block_values=block_values,
            diagonals=diagonals,
            edge_index=edge_index,
            node_features=node_features,
            lhs=lhs,
            rhs=rhs,
            mask=mask,
            num_nodes=n_nodes,
            block_size=self.block_size,
        )

    def get_raw(self, idx: int) -> RawSample:
        raw = self._cache[idx] if self._cache is not None else self._load_raw(idx)
        if self.use_two_hop:
            from ..gnn.graph_ops import two_hop_host
            import dataclasses as _dc

            new_ei, new_bv = two_hop_host(
                raw.edge_index, raw.num_nodes, raw.block_values
            )
            raw = _dc.replace(raw, edge_index=new_ei, block_values=new_bv)
        return raw

    def get(self, idx: int, is_inference: bool = False) -> GraphSample:
        s = make_features(
            self.get_raw(idx), rng=self.rng, is_inference=is_inference, **self.flags
        )
        assert s.x.shape[-1] == self.num_node_features, (
            f"node features {s.x.shape[-1]} != expected {self.num_node_features}"
        )
        assert s.edge_attr.shape[-1] == self.num_edge_features
        return s

    def __getitem__(self, idx: int) -> GraphSample:
        return self.get(idx)


class MultiFolderDataset:
    """Concatenation of per-resolution FolderDatasets (data.py:643-667)."""

    def __init__(self, all_prefix: Sequence[str], **kwargs):
        kwargs.pop("prefix", None)
        self.datasets = [FolderDataset(prefix=p, **kwargs) for p in all_prefix]
        lens = [len(d) for d in self.datasets]
        if len(set(lens)) != 1:
            # the reference's index convention (data.py:664-666) assumes
            # equal-length folders; fail loudly instead of wrapping around
            raise ValueError(f"MultiFolderDataset needs equal-length folders, got {lens}")
        self.dataset_length = len(self.datasets[0])
        self.block_size = self.datasets[0].block_size
        self.num_node_features = self.datasets[0].num_node_features
        self.num_edge_features = self.datasets[0].num_edge_features

    def __len__(self):
        return self.dataset_length * len(self.datasets)

    def get(self, idx: int, is_inference: bool = False) -> GraphSample:
        ds, di = divmod(idx, self.dataset_length)
        return self.datasets[ds].get(di, is_inference)

    def __getitem__(self, idx):
        return self.get(idx)


def split_dataset(n: int, train_ratio: float, seed: int = 42):
    """Deterministic shuffled train/val split (datamodule.py:25-27)."""
    from sklearn.model_selection import train_test_split

    tr, va = train_test_split(
        range(n), train_size=train_ratio, random_state=seed, shuffle=True
    )
    return list(tr), list(va)
