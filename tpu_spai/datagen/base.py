"""Dataset-folder writer base class (~ datagen_helper.py:199-395).

Subclasses implement:
  * ``topology() -> csr | None``  — fixed sparsity pattern (written as
    demo.mtx) or None for variable-topology families,
  * ``step() -> (csr, mask, features, rhs)`` — one sample; mask/features/
    rhs may be None.

`generate()` loops ``max_count`` steps, writes the folder contract
(values-only .npy when fixed topology, .mtx otherwise; stacked multi-column
rhs; optional direct-solve lhs via scipy splu — datagen_helper.py:309-321),
then runs the post-hoc integrity check: reload through the production
`FolderDataset` and materialize one sample (datagen_helper.py:373-394).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.io import mmwrite

from ..logging_utils import get_logger

log = get_logger()


def align_to_pattern(mat: sp.spmatrix, demo: sp.csr_matrix) -> sp.csr_matrix:
    """Embed `mat`'s values into `demo`'s (sorted CSR) sparsity pattern.

    `mat`'s pattern must be a subset of `demo`'s; missing entries get 0.
    """
    mat = sp.csr_matrix(mat)
    mat.sort_indices()
    n = demo.shape[1]
    demo_keys = (
        np.repeat(np.arange(demo.shape[0]), np.diff(demo.indptr)).astype(np.int64) * n
        + demo.indices
    )
    mat_keys = (
        np.repeat(np.arange(mat.shape[0]), np.diff(mat.indptr)).astype(np.int64) * n
        + mat.indices
    )
    pos = np.searchsorted(demo_keys, mat_keys)
    if not np.array_equal(demo_keys[pos], mat_keys):
        raise ValueError("step matrix pattern is not a subset of the topology")
    data = np.zeros_like(demo.data)
    data[pos] = mat.data
    return sp.csr_matrix((data, demo.indices.copy(), demo.indptr.copy()), shape=demo.shape)


class DatagenBase:
    def __init__(
        self,
        prefix: str,
        max_count: int = 16,
        rhs_per_matrix: int = 1,
        with_lhs: bool = False,
        dry_run: bool = False,
        overwrite: bool = True,
        seed: int = 0,
    ):
        self.prefix = Path(prefix)
        self.max_count = max_count
        self.rhs_per_matrix = rhs_per_matrix
        self.with_lhs = with_lhs
        self.dry_run = dry_run
        self.overwrite = overwrite
        self.rng = np.random.default_rng(seed)
        self._count = 0

    # -- subclass API -------------------------------------------------------

    def topology(self) -> Optional[sp.csr_matrix]:
        """Fixed sparsity pattern (None => variable topology)."""
        return None

    def step(
        self,
    ) -> Tuple[sp.csr_matrix, Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
        raise NotImplementedError

    def shared_features(self) -> Optional[np.ndarray]:
        return None

    @property
    def block_size(self) -> int:
        return 1

    # -- folder contract ----------------------------------------------------

    def prepare(self):
        if self.dry_run:
            return
        if self.prefix.exists() and self.overwrite:
            shutil.rmtree(self.prefix)
        for sub in ["mat", "rhs", "lhs", "mask", "features"]:
            (self.prefix / sub).mkdir(parents=True, exist_ok=True)

    def append(
        self,
        mat: sp.csr_matrix,
        mask: Optional[np.ndarray],
        features: Optional[np.ndarray],
        rhs: Optional[np.ndarray],
        fixed_topology: bool,
    ):
        i = self._count
        self._count += 1
        if self.dry_run:
            return
        name = f"{i:06d}"
        mat = sp.csr_matrix(mat)
        mat.sort_indices()
        n = mat.shape[0]
        if fixed_topology:
            np.save(self.prefix / "mat" / f"{name}.npy", mat.data)
        else:
            mmwrite(self.prefix / "mat" / f"{name}.mtx", sp.coo_matrix(mat))
        if mask is not None:
            np.save(self.prefix / "mask" / f"{name}.npy", np.asarray(mask))
        if features is not None:
            np.save(self.prefix / "features" / f"{name}.npy", np.asarray(features))
        # rhs: stack rhs_per_matrix columns; random-normalized fallback
        # (datagen_helper.py:285-292)
        if rhs is None:
            rhs = self.rng.standard_normal((n, self.rhs_per_matrix))
            rhs /= np.linalg.norm(rhs, axis=0, keepdims=True)
        rhs = np.asarray(rhs)
        if rhs.ndim == 1:
            rhs = rhs[:, None]
        np.save(self.prefix / "rhs" / f"{name}.npy", rhs)
        if self.with_lhs:
            lu = sp.linalg.splu(sp.csc_matrix(mat))
            lhs = np.column_stack([lu.solve(rhs[:, c]) for c in range(rhs.shape[1])])
            np.save(self.prefix / "lhs" / f"{name}.npy", lhs)

    def generate(self):
        self.prepare()
        topo = self.topology()
        fixed = topo is not None
        if fixed and not self.dry_run:
            mmwrite(self.prefix / "demo.mtx", sp.coo_matrix(topo))
            sf = self.shared_features()
            if sf is not None:
                np.save(self.prefix / "shared_features.npy", sf)
        demo = None
        if fixed:
            demo = sp.csr_matrix(topo)
            demo.sort_indices()
        for i in range(self.max_count):
            mat, mask, features, rhs = self.step()
            if fixed:
                # align values onto the demo pattern (scipy binops drop
                # exact zeros, e.g. right-angle cotan weights on structured
                # meshes; the fixed-topology contract stores values-only)
                mat = align_to_pattern(mat, demo)
            self.append(mat, mask, features, rhs, fixed)
            if (i + 1) % 16 == 0:
                log.info(f"{self.prefix}: generated {i + 1}/{self.max_count}")
        if not self.dry_run:
            self.integrity_check(fixed)

    def integrity_check(self, fixed: bool):
        """Reload through the production dataset and materialize a sample
        (datagen_helper.py:373-394)."""
        from ..data.folder import FolderDataset

        has_shared = (self.prefix / "shared_features.npy").exists()
        ds = FolderDataset(
            prefix=str(self.prefix),
            is_fixed_topology=fixed,
            load_into_memory=False,
            block_size=self.block_size,
            has_shared_features=has_shared,
            use_node_features=bool(list((self.prefix / "features").glob("*.npy")))
            or has_shared,
        )
        s = ds.get(0)
        log.info(
            f"integrity ok: {self.prefix} len={len(ds)} x={s.x.shape} "
            f"edges={s.edge_index.shape[1]} block={s.block_size}"
        )
