"""Poisson problem generators (~ datagen/poisson.py, poisson3d_tetmesh.py).

Poisson 2-D (fixed topology): a surface mesh's Laplacian with a random 10%
subset of boundary vertices Dirichlet-masked per step, eliminated via
`apply_dbc_masking` so the system stays SPD (poisson.py:76-84). No node
features; shared features = vertex positions.

Poisson 3-D (variable topology): per-sample tet mesh; Dirichlet patches
grown from random boundary seed vertices by BFS over boundary edges
(poisson3d_tetmesh.py:59-65); node features = vertex positions.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..native import laplacian
from ..sparse.convert import apply_dbc_masking
from .base import DatagenBase
from .meshes import (
    boundary_vertices_tet,
    boundary_vertices_tri,
    boundary_faces_tet,
    grid_tri,
    perturbed_unit_box_tet,
    load_obj,
)


class PoissonDatagen(DatagenBase):
    """Fixed-topology 2-D Poisson with random Dirichlet subsets."""

    def __init__(
        self,
        prefix: str = "generated/poisson",
        mesh: str = "grid:40",
        ratio: float = 0.1,
        reg_eps: float = 1e-6,
        seed: int = 42,
        **kw,
    ):
        super().__init__(prefix=prefix, seed=seed, **kw)
        from .heat import _make_mesh

        self.nodes, self.elems = _make_mesh(mesh)
        if self.elems.shape[1] == 3:
            self.boundaries = boundary_vertices_tri(self.elems)
        else:
            self.boundaries = boundary_vertices_tet(self.elems)
        self.ratio = ratio
        # pure Neumann Laplacian is singular; the reference's masking always
        # pins >=1 boundary vertex, making the masked system SPD. A tiny
        # regularization keeps the *unmasked* demo topology factorizable.
        self.reg_eps = reg_eps
        assert len(self.boundaries) > 1

    def shared_features(self):
        return self.nodes

    def topology(self) -> sp.csr_matrix:
        lap = laplacian(self.nodes, self.elems)
        out = sp.csr_matrix(lap + self.reg_eps * sp.eye(lap.shape[0]))
        out.sort_indices()
        return out

    def step(self):
        lap = laplacian(self.nodes, self.elems)
        lap = sp.csr_matrix(lap + self.reg_eps * sp.eye(lap.shape[0]))
        n = lap.shape[0]
        dbc_cnt = max(1, int(self.ratio * len(self.boundaries)))
        mask = np.ones((n, 1), dtype=np.float64)
        pick = self.rng.choice(len(self.boundaries), size=dbc_cnt, replace=False)
        mask[self.boundaries[pick]] = 0
        masked = apply_dbc_masking(lap, mask)
        masked.sort_indices()
        return masked, mask, None, None


class MultimeshPoissonDatagen(DatagenBase):
    """Variable-topology 3-D Poisson with grown Dirichlet patches."""

    def __init__(
        self,
        prefix: str = "generated/poisson3d",
        seed_count: int = 8,
        grow_iteration: int = 2,
        res_range=(5, 9),
        jitter: float = 0.25,
        seed: int = 42,
        **kw,
    ):
        super().__init__(prefix=prefix, seed=seed, **kw)
        self.seed_count = seed_count
        self.grow_iteration = grow_iteration
        self.res_range = res_range
        self.jitter = jitter

    def step(self):
        lo, hi = self.res_range
        res = tuple(int(self.rng.integers(lo, hi + 1)) for _ in range(3))
        nodes, elems = perturbed_unit_box_tet(*res, jitter=self.jitter, rng=self.rng)
        n = len(nodes)
        bverts = boundary_vertices_tet(elems)
        bfaces = boundary_faces_tet(elems)
        # boundary-edge adjacency graph for patch growth
        edges = np.concatenate(
            [bfaces[:, [0, 1]], bfaces[:, [1, 2]], bfaces[:, [2, 0]]]
        )
        edges = np.unique(np.sort(edges, axis=1), axis=0)
        adj = sp.csr_matrix(
            (np.ones(2 * len(edges)),
             (np.concatenate([edges[:, 0], edges[:, 1]]),
              np.concatenate([edges[:, 1], edges[:, 0]]))),
            shape=(n, n),
        )
        from .meshes import subgraph_grow

        seeds = bverts[self.rng.choice(len(bverts), self.seed_count, replace=False)]
        patch = subgraph_grow(adj.indptr, adj.indices, seeds, self.grow_iteration)
        mask = np.ones((n, 1), dtype=np.float64)
        mask[patch] = 0
        lap = laplacian(nodes, elems)
        masked = apply_dbc_masking(lap, mask)
        masked.sort_indices()
        return masked, mask, nodes, None


def main(argv=None):
    import sys
    from pathlib import Path

    from ..config import cli_config

    args = argv if argv is not None else sys.argv[1:]
    cfg_dir = Path(__file__).resolve().parents[2] / "configs" / "datagen"
    name = "poisson"
    for a in args:
        if a.startswith("--config-name="):
            name = a.split("=", 1)[1]
    cfg = cli_config(args, cfg_dir, name)
    cls = MultimeshPoissonDatagen if cfg.select("multimesh", False) else PoissonDatagen
    kwargs = {k: v for k, v in cfg.to_dict().items() if k != "multimesh"}
    cls(**kwargs).generate()


if __name__ == "__main__":
    main()
