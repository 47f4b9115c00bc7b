"""Block-COO graph container and ELL (padded-row) views.

TPU-first sparse design
-----------------------
The reference (neural_cg/nn/basic_layers.py:112-142 `GraphSpmv`) performs
block SpMV as PyG message passing: per-edge `bmm` + CUDA `scatter_add`.
Scatter is hostile to TPU vector units, so the device format here is an
**ELL view**: every block-row's edges are padded to a common width ``K``
and stored as **transposed** ``[K, N]`` integer planes,

  * ``ell_edge[k, i]`` — edge id occupying slot ``k`` of row ``i``
  * ``ell_col[k, i]``  — the column (block) index of that edge

so that SpMV is a scatter-free ``gather → multiply → K-sum``::

  y[i] = sum_k mask[k,i] * blocks[ell_edge[k,i]] @ x[ell_col[k,i]]

Layout rationale (measured on TPU v5e): arrays must keep a large minor
(lane) dimension — ``[N, K]`` planes with K~13 pad the lane dim to 128
(10x wasted bandwidth) and trailing ``[...,b,b]`` block dims with b in
{1,3} are worse. The ``[K, N]`` planes keep N minor; block components are
stored as separate ``[b, b, K, N]`` value planes (`ell_vals`), frozen once
for solver-side matrices whose values never change across CG iterations,
or materialized on the fly from edge-ordered ``blocks`` for the GNN
training path (one extra gather).

Transpose-SpMV (needed by the SPAI apply ``eps*x + A (A^T x)``, reference
basic_layers.py:228-261) uses a second ELL view of the transposed pattern
(same edge ids, block transposed in-register) — no ``A^T`` materialization.

All shapes are static: edges and rows are padded host-side so
variable-topology datasets hit a bounded set of compiled programs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllView:
    """Transposed padded-row (ELL) index planes for scatter-free SpMV.

    Padding slots carry ``mask == 0`` and point at edge 0 / column 0
    (contribution multiplied away; in-bounds reads keep gathers cheap).
    """

    ell_edge: jax.Array  # int32 [K, N]
    ell_col: jax.Array  # int32 [K, N]
    ell_mask: jax.Array  # float32 [K, N] (0/1)

    @property
    def width(self) -> int:
        return self.ell_edge.shape[0]

    @property
    def n_rows(self) -> int:
        return self.ell_edge.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGraph:
    """A square block-sparse matrix as a graph (nodes = block rows).

    Mirrors the information content of the reference's PyG graphs
    (neural_cg/data.py:173-183 `RawData`): block values ``[E, b, b]`` on
    edges ``(edge_row, edge_col)`` over ``n_nodes`` block rows. Padding
    edges (``e >= n_edges_valid``) must carry zero blocks and may point
    anywhere in range; ELL views exclude them entirely.

    ``ell_vals`` / ``ell_vals_t`` are frozen ELL-ordered value planes
    ``[b, b, K, N]`` (mask pre-baked). They are built by `freeze_values`
    for matrices whose values are reused across many SpMVs (the CG system
    matrix and an already-predicted factor); `with_blocks` drops them.
    """

    edge_row: jax.Array  # int32 [E]
    edge_col: jax.Array  # int32 [E]
    blocks: jax.Array  # [E, b, b]
    n_nodes: int = _static()
    block_size: int = _static(default=1)
    ell: Optional[EllView] = None
    ell_t: Optional[EllView] = None  # ELL of the transpose pattern
    transpose_perm: Optional[jax.Array] = None  # int32 [E]
    ell_vals: Optional[jax.Array] = None  # [b, b, K, N]
    ell_vals_t: Optional[jax.Array] = None  # [b, b, K, N] (transposed blocks)

    @property
    def n_edges(self) -> int:
        return self.edge_row.shape[0]

    @property
    def n_dofs(self) -> int:
        return self.n_nodes * self.block_size

    def with_blocks(self, blocks: jax.Array) -> "BlockGraph":
        """Same topology, new values (e.g. the GNN-predicted factor).
        Frozen ELL value planes are dropped (they described old values)."""
        return dataclasses.replace(
            self, blocks=blocks, ell_vals=None, ell_vals_t=None
        )

    def astype(self, dtype) -> "BlockGraph":
        rep = dict(blocks=self.blocks.astype(dtype))
        if self.ell_vals is not None:
            rep["ell_vals"] = self.ell_vals.astype(dtype)
        if self.ell_vals_t is not None:
            rep["ell_vals_t"] = self.ell_vals_t.astype(dtype)
        return dataclasses.replace(self, **rep)

    def freeze_values(self) -> "BlockGraph":
        """Materialize masked ELL-ordered value planes for fast SpMV."""
        if self.ell is None:
            return self
        vals = _ell_values(self.ell, self.blocks, transpose_blocks=False)
        vals_t = None
        if self.ell_t is not None:
            vals_t = _ell_values(self.ell_t, self.blocks, transpose_blocks=True)
        return dataclasses.replace(self, ell_vals=vals, ell_vals_t=vals_t)


def _ell_values(
    ell: EllView, blocks: jax.Array, transpose_blocks: bool
) -> jax.Array:
    """Gather edge-ordered blocks into masked [b, b, K, N] ELL planes."""
    b = blocks.shape[-1]
    comp = blocks.transpose(1, 2, 0)  # [b, b, E] — component-major planes
    out = comp[:, :, ell.ell_edge]  # [b, b, K, N]
    if transpose_blocks:
        out = out.transpose(1, 0, 2, 3)
    return out * ell.ell_mask[None, None]


# ---------------------------------------------------------------------------
# Host-side (numpy) topology preprocessing. Runs once per topology at data
# load time; results are reused across every CG iteration / training step.
# ---------------------------------------------------------------------------


def transpose_permutation(edge_row: np.ndarray, edge_col: np.ndarray) -> np.ndarray:
    """Permutation ``perm`` with edge ``perm[e]`` at ``(col[e], row[e])``.

    Requires a structurally symmetric pattern (true for the SPD systems
    this framework targets).
    """
    e = len(edge_row)
    order_fwd = np.lexsort((edge_col, edge_row))
    order_bwd = np.lexsort((edge_row, edge_col))
    perm = np.empty(e, dtype=np.int64)
    perm[order_fwd] = order_bwd
    fr, fc = edge_row[perm], edge_col[perm]
    if not (np.array_equal(fr, edge_col) and np.array_equal(fc, edge_row)):
        raise ValueError("sparsity pattern is not structurally symmetric")
    return perm.astype(np.int32)


def host_ell_planes(
    edge_row: np.ndarray,
    edge_col: np.ndarray,
    n_nodes: int,
    n_valid: Optional[int] = None,
    width: Optional[int] = None,
    mask_dtype=np.float32,
):
    """numpy core of `build_ell`: (ell_edge, ell_col, ell_mask) host arrays.

    Kept host-side so the data pipeline can cache per-sample planes and
    assemble batch planes by concatenation (data/batching.py) — the
    argsort here is the expensive part and is per-topology, not per-step.
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
    ell_edge = np.zeros((k, n_nodes), dtype=np.int32)
    ell_col = np.zeros((k, n_nodes), dtype=np.int32)
    ell_mask = np.zeros((k, n_nodes), dtype=mask_dtype)
    ell_edge[slot, rows[order]] = order
    ell_col[slot, rows[order]] = cols[order]
    ell_mask[slot, rows[order]] = 1
    return ell_edge, ell_col, ell_mask


def build_ell(
    edge_row: np.ndarray,
    edge_col: np.ndarray,
    n_nodes: int,
    n_valid: Optional[int] = None,
    width: Optional[int] = None,
    mask_dtype=np.float32,
) -> EllView:
    """Build transposed padded-row index planes for
    ``y[i] = sum_j A[i,j] x[j]``.

    Args:
      edge_row/edge_col: block-level COO indices, possibly padded at the end.
      n_valid: number of real edges (padding beyond is ignored).
      width: pad rows to at least this many slots (bucketing across samples).
    """
    ell_edge, ell_col, ell_mask = host_ell_planes(
        edge_row, edge_col, n_nodes, n_valid, width, mask_dtype
    )
    return EllView(
        ell_edge=jnp.asarray(ell_edge),
        ell_col=jnp.asarray(ell_col),
        ell_mask=jnp.asarray(ell_mask),
    )


def attach_ell(
    graph: BlockGraph,
    n_valid: Optional[int] = None,
    width: Optional[int] = None,
    freeze: bool = False,
) -> BlockGraph:
    """Attach forward + transpose ELL views and the transpose permutation."""
    rows = np.asarray(graph.edge_row)
    cols = np.asarray(graph.edge_col)
    ell = build_ell(rows, cols, graph.n_nodes, n_valid, width)
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
    out = dataclasses.replace(
        graph, ell=ell, ell_t=ell_t, transpose_perm=perm_arr
    )
    if freeze:
        out = out.freeze_values()
    return out
