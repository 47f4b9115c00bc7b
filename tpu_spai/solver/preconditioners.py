"""Preconditioner operators as pytree data (stable under `jax.jit` caching).

Device-side equivalents of the pymathprim preconditioner menu used by the
reference (validate.py:54-160: none / diagonal / ext_spai / ext_spai_scaled)
plus the LLT product form (NeuralPCG baseline, nif.py:77,92). Each is a
frozen dataclass whose ``kind`` is static metadata and whose arrays are
pytree leaves, so `pcg` compiles once per (kind, shapes) rather than once
per Python closure.

  identity     : y = r
  jacobi       : y = r / diag(A)                  (element-wise)
  spai         : y = eps r + L (L^T r)            (the paper's M^{-1})
  spai_scaled  : y = eps D^{-1} r + L (D^{-1} (L^T r))
  llt          : y = L (L^T r)                    (no eps; NeuralPCG form)

Triangular-solve preconditioners (IC0 etc.) are deliberately host-side only
(`host_baselines.py`) — avoiding triangular solves on the accelerator is the
entire point of the SPAI method.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.spmv_xla import spai_apply, llt_apply
from ..sparse.bcoo import BlockGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preconditioner:
    kind: str = field(metadata=dict(static=True))
    graph: Optional[BlockGraph] = None  # SPAI/LLT factor (same topology as A)
    diag: Optional[jax.Array] = None  # [N, b] inverse-diagonal (jacobi/scaled)
    epsilon: Optional[jax.Array] = None  # scalar
    mask: Optional[jax.Array] = None  # [N, b] Dirichlet mask

    def __call__(self, r: jax.Array) -> jax.Array:
        if self.kind == "identity":
            return r
        if self.kind == "jacobi":
            return r * self.diag.reshape(r.shape)
        if self.kind == "spai":
            return spai_apply(
                self.graph, r, epsilon=self.epsilon, mask=self.mask
            ).reshape(r.shape)
        if self.kind == "spai_scaled":
            return spai_apply(
                self.graph, r, epsilon=self.epsilon, mask=self.mask, diag=self.diag
            ).reshape(r.shape)
        if self.kind == "llt":
            return llt_apply(self.graph, r, mask=self.mask).reshape(r.shape)
        raise ValueError(f"unknown preconditioner kind: {self.kind}")


def identity_prec() -> Preconditioner:
    return Preconditioner(kind="identity")


def jacobi_prec(graph_or_diag, eps: float = 0.0) -> Preconditioner:
    """Jacobi: pass the system graph (diagonal extracted) or a [N,b] diag."""
    if isinstance(graph_or_diag, BlockGraph):
        d = extract_diagonal(graph_or_diag)
    else:
        d = jnp.asarray(graph_or_diag)
    return Preconditioner(kind="jacobi", diag=1.0 / (d + eps))


def spai_prec(
    factor: BlockGraph, epsilon: float, mask: Optional[jax.Array] = None
) -> Preconditioner:
    return Preconditioner(
        kind="spai",
        graph=factor,
        epsilon=jnp.asarray(epsilon, dtype=factor.blocks.dtype),
        mask=mask,
    )


def spai_scaled_prec(
    factor: BlockGraph,
    epsilon: float,
    inv_diag: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Preconditioner:
    """Scaled SPAI: y = eps*D^{-1} r + L (D^{-1} (L^T r)).

    `inv_diag` is 1/diag(A) as [N, b] (reference scaled_workspace.py:98-101
    trains with `batch.inv_diag`; at solve time the reference instead folds
    D^{-1/2} into L — both formulations are supported, see
    `fold_rsqrt_diag` in train/workspace.py).
    """
    return Preconditioner(
        kind="spai_scaled",
        graph=factor,
        epsilon=jnp.asarray(epsilon, dtype=factor.blocks.dtype),
        diag=inv_diag,
        mask=mask,
    )


def llt_prec(factor: BlockGraph, mask: Optional[jax.Array] = None) -> Preconditioner:
    return Preconditioner(kind="llt", graph=factor, mask=mask)


def extract_diagonal(graph: BlockGraph) -> jax.Array:
    """Diagonal of the assembled matrix as [N, b] (host-index precompute).

    Uses the COO indices on host to locate diagonal blocks once; the gather
    itself stays on device so it works on traced ``blocks``.
    """
    rows = np.asarray(graph.edge_row)
    cols = np.asarray(graph.edge_col)
    (diag_edges,) = np.nonzero(rows == cols)
    # Keep only the first padding hit per node (padding edges sit at (0,0)).
    node_of = rows[diag_edges]
    order = np.argsort(node_of, kind="stable")
    uniq, first_idx = np.unique(node_of[order], return_index=True)
    if len(uniq) != graph.n_nodes:
        raise ValueError("matrix has empty diagonal blocks")
    first = np.empty(graph.n_nodes, dtype=np.int64)
    first[uniq] = diag_edges[order][first_idx]
    idx = jnp.asarray(first)
    dblocks = graph.blocks[idx]  # [N, b, b]
    b = graph.block_size
    return dblocks[:, jnp.arange(b), jnp.arange(b)]
