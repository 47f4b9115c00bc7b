"""Sparse containers and converters (block-COO + ELL views) for TPU.

Parity surface (see /root/reference):
  - neural_cg/data.py:15-170  (to_bcoo_components, make_bsr_from_coo_inds,
    apply_dbc_masking) — reimplemented vectorized, host side, in `convert.py`.
  - neural_cg/utils/validate.py:22-51 (to_csr_cpu) — `convert.graph_to_csr`.

The device-side format (`BlockGraph` + `EllView`) is original TPU-first design:
scatter-free SpMV via padded-row (ELL) gather + block einsum, and a
precomputed edge permutation for transpose-SpMV over the structurally
symmetric SPD sparsity.
"""

from .bcoo import BlockGraph, EllView, build_ell, transpose_permutation
from .convert import (
    apply_dbc_masking,
    blocks_from_coo,
    graph_to_csr,
    csr_to_graph,
    random_spd_graph,
)

__all__ = [
    "BlockGraph",
    "EllView",
    "build_ell",
    "transpose_permutation",
    "apply_dbc_masking",
    "blocks_from_coo",
    "graph_to_csr",
    "csr_to_graph",
    "random_spd_graph",
]
