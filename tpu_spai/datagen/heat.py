"""Heat problem generators (~ datagen/heat.py, heat_tetmesh.py,
heat_tetmesh_high_contrast.py, heat_objmesh.py).

Fixed-topology heat: one mesh, per-step random conductivity field kappa;
system ``S = L(kappa) + eps * M_lumped`` (heat.py:81-96); node features =
the vertex field; shared features = vertex positions (heat.py:77-78
get_shared).

Multimesh heat (variable topology): per-sample mesh + random density rho in
[min, max]; ``S = L + diag(M * rho)`` (heat_tetmesh.py:17-56); OOD variants
fix rho = min_density with random_field=false (README.md:67-71). The
reference draws ~10k TetWild meshes; without external mesh archives we
sample perturbed structured tet boxes of varying resolution — same
variable-topology / variable-size training signal.

High-contrast variant: thresholded (piecewise-constant) density field
(heat_tetmesh_high_contrast.py:36-38).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..native import laplacian, lumped_mass
from .base import DatagenBase
from .meshes import grid_tri, perturbed_unit_box_tet, unit_box_tet, load_obj
from .random_fields import GaussianRandomField, minmax_scaled_field, to_elem_field


class HeatDatagen(DatagenBase):
    """Fixed-topology heat on a single mesh."""

    def __init__(
        self,
        prefix: str = "generated/heat",
        mesh: str = "box:8",  # "box:N" tet box, "grid:N" triangle grid, or an .obj path
        var: float = 0.99,
        eps: float = 1e-4,
        grf_var: float = 5.0,
        grf_len_scale: float = 1.0,
        seed: int = 42,
        **kw,
    ):
        super().__init__(prefix=prefix, seed=seed, **kw)
        self.nodes, self.elems = _make_mesh(mesh)
        self.var = var
        self.eps = eps
        self.grf = GaussianRandomField(dim=3, var=grf_var, len_scale=grf_len_scale)
        self.mass = lumped_mass(self.nodes, self.elems)
        self._seed_counter = seed * 1000

    def shared_features(self) -> np.ndarray:
        return self.nodes  # (heat.py:77-78)

    def topology(self) -> sp.csr_matrix:
        return laplacian(self.nodes, self.elems)

    def step(self):
        self._seed_counter += 1
        # field in (1-var, 1]: (heat.py:82-88)
        field = minmax_scaled_field(
            self.grf, self.nodes, self._seed_counter, 1.0 - self.var, 1.0
        )
        lap = laplacian(self.nodes, self.elems, to_elem_field(self.elems, field))
        s = sp.csr_matrix(lap + sp.diags(self.eps * self.mass))
        s.sort_indices()
        return s, None, field[:, None], None


class MultimeshHeatDatagen(DatagenBase):
    """Variable-topology heat over randomly perturbed/resized tet meshes."""

    def __init__(
        self,
        prefix: str = "generated/heat_tetmesh",
        min_density: float = 1e-4,
        max_density: float = 5e-4,
        random_field: bool = True,
        high_contrast: bool = False,
        res_range: Tuple[int, int] = (5, 9),
        jitter: float = 0.25,
        grf_var: float = 5.0,
        grf_len_scale: float = 1.0,
        seed: int = 42,
        **kw,
    ):
        super().__init__(prefix=prefix, seed=seed, **kw)
        self.min_density = min_density
        self.max_density = max_density
        self.random_field = random_field
        self.high_contrast = high_contrast
        self.res_range = res_range
        self.jitter = jitter
        self.grf = GaussianRandomField(dim=3, var=grf_var, len_scale=grf_len_scale)
        self._seed_counter = seed * 1000

    def step(self):
        self._seed_counter += 1
        lo, hi = self.res_range
        res = tuple(int(self.rng.integers(lo, hi + 1)) for _ in range(3))
        nodes, elems = perturbed_unit_box_tet(*res, jitter=self.jitter, rng=self.rng)
        lap = laplacian(nodes, elems)
        mass = lumped_mass(nodes, elems)
        if self.random_field:
            rho = minmax_scaled_field(
                self.grf, nodes, self._seed_counter, self.min_density, self.max_density
            )
            if self.high_contrast:
                # piecewise-constant: threshold at the midpoint
                # (heat_tetmesh_high_contrast.py:36-38)
                mid = 0.5 * (self.min_density + self.max_density)
                rho = np.where(rho > mid, self.max_density, self.min_density)
        else:
            rho = np.full(len(nodes), self.min_density)
        s = sp.csr_matrix(lap + sp.diags(mass * rho))
        s.sort_indices()
        return s, None, rho[:, None], None


def _make_mesh(spec: str):
    if spec.startswith("box:"):
        n = int(spec.split(":")[1])
        return unit_box_tet(n, n, n)
    if spec.startswith("grid:"):
        n = int(spec.split(":")[1])
        return grid_tri(n, n)
    if spec.startswith("tet:"):
        # volume-mesh a closed OBJ surface (the reference's tetgen path,
        # datagen/heat.py:9 via datagen_helper.tetrahedralize). Optional
        # trailing ":<mult>" scales the interior spacing (resolution
        # control, like tetgen's -a volume bound): "tet:bunny.obj:1.5".
        from .meshes import tetrahedralize

        parts = spec.split(":")
        mult = float(parts[2]) if len(parts) > 2 else 1.0
        nodes, faces = load_obj(parts[1])
        spacing = None
        if mult != 1.0:
            e = np.concatenate(
                [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
            )
            spacing = mult * float(np.median(
                np.linalg.norm(nodes[e[:, 0]] - nodes[e[:, 1]], axis=1)
            ))
        return tetrahedralize(nodes, faces, spacing=spacing)
    nodes, faces = load_obj(spec)
    return nodes, faces


def main(argv=None):
    import sys
    from pathlib import Path

    from ..config import cli_config

    cfg_dir = Path(__file__).resolve().parents[2] / "configs" / "datagen"
    args = argv if argv is not None else sys.argv[1:]
    name = "heat"
    for a in args:
        if a.startswith("--config-name="):
            name = a.split("=", 1)[1]
    cfg = cli_config(args, cfg_dir, name)
    cls = MultimeshHeatDatagen if cfg.select("multimesh", False) else HeatDatagen
    kwargs = {k: v for k, v in cfg.to_dict().items() if k not in ("multimesh",)}
    cls(**kwargs).generate()


if __name__ == "__main__":
    main()
