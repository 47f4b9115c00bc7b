"""Problem generators writing the dataset-folder contract.

Parity with the reference's L1 layer (datagen/*.py +
neural_cg/datagen_helper.py): every generator subclasses `DatagenBase`,
yields `(csr, mask, features, rhs)` steps, and writes `mat/ rhs/ lhs/ mask/
features/` (+ `demo.mtx` for fixed topology) so `FolderDataset` can read it
back. Native FEM assembly comes from csrc/ via `tpu_spai.native`.

Families: synthetic (random SPD), heat (surface/tet meshes, random
conductivity fields), poisson 2D/3D (random Dirichlet patches),
elasticity (hyperelastic tet FEM Hessians, block_size=3).
"""

from .base import DatagenBase
from .synthetic import SyntheticDatagen, generate_spd_sparse_matrix

__all__ = ["DatagenBase", "SyntheticDatagen", "generate_spd_sparse_matrix"]
