"""Synthetic SPD problem family (~ datagen/synthetic.py).

Pure-algebra SPD systems ``A = (D M)^T (D M) + alpha I`` with anisotropic
column scaling ``D = diag(linspace(1, alpha, n))`` — the reference's
ill-conditioned random family (synthetic.py:10-27; config: n in
[10240, 20480], generator density 3e-4 -> actual sparsity ~0.2%).
Variable topology, no node features, no mask.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .base import DatagenBase


def generate_spd_sparse_matrix(
    n: int,
    sparsity: float = 3e-4,
    condition_amplifier: float = 1e-5,
    random_state=None,
) -> sp.csr_matrix:
    rng = np.random.default_rng(random_state)
    m = sp.random(n, n, density=sparsity, format="csr", random_state=rng)
    m.data = (m.data - 0.5) * 2  # scale to [-1, 1]
    scaling = np.linspace(1, condition_amplifier, n)
    m = sp.diags(scaling) @ m  # anisotropic column skew
    a = (m.T @ m).tocsr()
    a = sp.csr_matrix(a + sp.eye(n) * condition_amplifier)
    a.sort_indices()
    return a


class SyntheticDatagen(DatagenBase):
    def __init__(
        self,
        prefix: str = "generated/synthetic",
        max_count: int = 64,
        low: int = 10240,
        high: int = 20480,
        sparsity: float = 3e-4,
        alpha: float = 1e-5,
        seed: int = 42,
        **kw,
    ):
        super().__init__(prefix=prefix, max_count=max_count, seed=seed, **kw)
        self.low, self.high = low, high
        self.sparsity = sparsity
        self.alpha = alpha

    def step(self):
        n = int(self.rng.integers(self.low, self.high + 1))
        a = generate_spd_sparse_matrix(
            n, self.sparsity, self.alpha, random_state=self.rng
        )
        return a, None, None, None


def main(argv=None):
    import sys
    from pathlib import Path

    from ..config import cli_config

    cfg_dir = Path(__file__).resolve().parents[2] / "configs" / "datagen"
    cfg = cli_config(argv if argv is not None else sys.argv[1:], cfg_dir, "synthetic")
    gen = SyntheticDatagen(
        prefix=cfg.select("prefix", "generated/synthetic"),
        max_count=int(cfg.select("max_count", 64)),
        low=int(cfg.select("algebra.low", 10240)),
        high=int(cfg.select("algebra.high", 20480)),
        sparsity=float(cfg.select("sparsity", 3e-4)),
        alpha=float(cfg.select("algebra.epsilon", 1e-5)),
        seed=int(cfg.select("random_state", 42)),
    )
    gen.generate()


if __name__ == "__main__":
    main()
