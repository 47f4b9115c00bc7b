"""Block-COO graph container and ELL (padded-row) views.

TPU-first sparse design
-----------------------
The reference (neural_cg/nn/basic_layers.py:112-142 `GraphSpmv`) performs
block SpMV as PyG message passing: per-edge `bmm` + CUDA `scatter_add`.
Scatter is hostile to TPU vector units, so the device format here is an
**ELL view**: every block-row's edges are padded to a common width ``K`` and
stored as two ``[N, K]`` integer index planes,

  * ``ell_edge[i, k]`` — edge id occupying slot ``k`` of row ``i``
  * ``ell_col[i, k]``  — the column (block) index of that edge

so that SpMV is a scatter-free ``gather → block-einsum → row-sum``::

  y[i] = sum_k mask[i,k] * blocks[ell_edge[i,k]] @ x[ell_col[i,k]]

Transpose-SpMV (needed by the SPAI apply ``eps*x + A @ (A^T @ x)``,
reference basic_layers.py:228-261) never materializes ``A^T``: SPD matrices
have structurally symmetric sparsity, so a precomputed **edge permutation**
``perm`` with ``(row[perm[e]], col[perm[e]]) == (col[e], row[e])`` lets the
same ELL planes serve the transpose by reading ``blocks[perm[...]]`` with the
``b×b`` block transposed in-register.

All shapes are static: edges and rows are padded (host side, numpy) so
variable-topology datasets hit a bounded set of compiled programs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllView:
    """Padded-row (ELL) index planes for scatter-free SpMV.

    ``ell_edge`` indexes into the graph's edge arrays; padding slots carry
    ``mask == 0`` and point at edge 0 / column 0 (their contribution is
    multiplied away, and reading a valid location keeps gathers in-bounds).
    """

    ell_edge: jax.Array  # int32 [N, K]
    ell_col: jax.Array  # int32 [N, K]
    ell_mask: jax.Array  # dtype [N, K] (0/1)

    @property
    def width(self) -> int:
        return self.ell_edge.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGraph:
    """A square block-sparse matrix as a graph (nodes = block rows).

    Mirrors the information content of the reference's PyG graphs
    (neural_cg/data.py:173-183 `RawData`): block values ``[E, b, b]`` on
    edges ``(edge_row, edge_col)`` over ``n_nodes`` block rows. Padding
    edges (``e >= n_edges_valid``) must carry zero blocks and may point
    anywhere in range; linear ops then need no edge mask.
    """

    edge_row: jax.Array  # int32 [E]
    edge_col: jax.Array  # int32 [E]
    blocks: jax.Array  # [E, b, b]
    n_nodes: int = _static()
    block_size: int = _static(default=1)
    # ELL views (None until attached; built host-side per topology)
    ell: Optional[EllView] = None
    ell_t: Optional[EllView] = None  # ELL of the transpose pattern
    transpose_perm: Optional[jax.Array] = None  # int32 [E]

    @property
    def n_edges(self) -> int:
        return self.edge_row.shape[0]

    @property
    def n_dofs(self) -> int:
        return self.n_nodes * self.block_size

    def with_blocks(self, blocks: jax.Array) -> "BlockGraph":
        """Same topology, new values (e.g. the GNN-predicted factor)."""
        return dataclasses.replace(self, blocks=blocks)

    def astype(self, dtype) -> "BlockGraph":
        return dataclasses.replace(self, blocks=self.blocks.astype(dtype))


# ---------------------------------------------------------------------------
# Host-side (numpy) topology preprocessing. Runs once per topology at data
# load time; results are reused across every CG iteration / training step.
# ---------------------------------------------------------------------------


def transpose_permutation(edge_row: np.ndarray, edge_col: np.ndarray) -> np.ndarray:
    """Permutation ``perm`` with edge ``perm[e]`` at ``(col[e], row[e])``.

    Requires a structurally symmetric pattern (true for the SPD systems this
    framework targets). Padding edges (if any) must be self-symmetric, e.g.
    ``(0, 0)`` duplicates are not allowed — callers pad with distinct
    diagonal self-loops or ensure uniqueness beforehand.
    """
    e = len(edge_row)
    order_fwd = np.lexsort((edge_col, edge_row))
    order_bwd = np.lexsort((edge_row, edge_col))
    # sorted-by-(row,col) edge k corresponds to sorted-by-(col,row) edge k.
    perm = np.empty(e, dtype=np.int64)
    perm[order_fwd] = order_bwd
    fr, fc = edge_row[perm], edge_col[perm]
    if not (np.array_equal(fr, edge_col) and np.array_equal(fc, edge_row)):
        raise ValueError("sparsity pattern is not structurally symmetric")
    return perm.astype(np.int32)


def build_ell(
    edge_row: np.ndarray,
    edge_col: np.ndarray,
    n_nodes: int,
    n_valid: Optional[int] = None,
    width: Optional[int] = None,
    mask_dtype=np.float32,
) -> EllView:
    """Build the padded-row index planes for ``y[i] = sum_j A[i,j] x[j]``.

    Args:
      edge_row/edge_col: block-level COO indices, possibly padded at the end.
      n_valid: number of real edges (padding beyond is ignored).
      width: pad rows to at least this many slots (bucketing across samples).
    """
    n_valid = len(edge_row) if n_valid is None else n_valid
    rows = np.asarray(edge_row[:n_valid])
    cols = np.asarray(edge_col[:n_valid])
    counts = np.bincount(rows, minlength=n_nodes)
    k = int(counts.max()) if n_valid else 1
    if width is not None:
        if width < k:
            raise ValueError(f"requested ELL width {width} < max row degree {k}")
        k = width
    order = np.argsort(rows, kind="stable")
    slot = np.arange(n_valid) - np.concatenate(([0], np.cumsum(counts)))[rows[order]]
    ell_edge = np.zeros((n_nodes, k), dtype=np.int32)
    ell_col = np.zeros((n_nodes, k), dtype=np.int32)
    ell_mask = np.zeros((n_nodes, k), dtype=mask_dtype)
    ell_edge[rows[order], slot] = order
    ell_col[rows[order], slot] = cols[order]
    ell_mask[rows[order], slot] = 1
    return EllView(
        ell_edge=jnp.asarray(ell_edge),
        ell_col=jnp.asarray(ell_col),
        ell_mask=jnp.asarray(ell_mask),
    )


def attach_ell(
    graph: BlockGraph,
    n_valid: Optional[int] = None,
    width: Optional[int] = None,
) -> BlockGraph:
    """Attach forward + transpose ELL views and the transpose permutation."""
    rows = np.asarray(graph.edge_row)
    cols = np.asarray(graph.edge_col)
    ell = build_ell(rows, cols, graph.n_nodes, n_valid, width)
    # Transpose pattern: row<->col swapped; same edge ids.
    ell_t = build_ell(cols, rows, graph.n_nodes, n_valid, width)
    nv = len(rows) if n_valid is None else n_valid
    # The transpose permutation exists only for structurally symmetric
    # patterns (SPD matrices); lower-triangular factors (NeuralPCG's L)
    # don't have one — their transpose-SpMV goes through `ell_t` instead.
    perm_arr = None
    try:
        perm = np.arange(len(rows), dtype=np.int32)
        perm[:nv] = transpose_permutation(rows[:nv], cols[:nv])
        perm_arr = jnp.asarray(perm)
    except ValueError:
        pass
    return dataclasses.replace(
        graph, ell=ell, ell_t=ell_t, transpose_perm=perm_arr
    )
