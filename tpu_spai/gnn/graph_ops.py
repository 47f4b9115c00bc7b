"""Graph structure ops: lower-triangular restriction, drop-tol, two-hop.

Static-shape re-design of the reference's edge-filtering modules
(basic_layers.py:278-342 `ToLowerTriangular`,
`ToLowerTriangularAndConsistSparse`, :297-323 `TwoHop`):

  * On device, "removing" edges would change shapes; instead we return an
    **edge weight mask** that zeroes the excluded edges' blocks. Zero blocks
    contribute nothing to SpMV/LLT, so masking ≡ filtering for all linear
    algebra, at fixed shape.
  * Two-hop sparsity expansion changes the topology itself, so it runs
    host-side at data-prep time (`two_hop_host`), like the reference applies
    it once per sample before the GNN (nif.py:266,278).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def lower_triangular_mask(edge_index: jax.Array) -> jax.Array:
    """1.0 where col <= row (block-level lower triangle), else 0.0.

    Apply to predicted blocks as ``blocks * mask[:, None, None]`` — the
    static-shape equivalent of the reference's edge filtering
    (basic_layers.py:278-294).
    """
    row, col = edge_index[0], edge_index[1]
    return (col <= row).astype(jnp.float32)


def drop_small_mask(
    blocks: jax.Array, edge_index: jax.Array, drop_tol: float
) -> jax.Array:
    """Lower-triangular AND |entry| >= drop_tol mask (NIF's drop tolerance,
    basic_layers.py:325-342). For block_size>1 the magnitude test uses the
    block's max-abs entry."""
    tri = lower_triangular_mask(edge_index)
    mag = jnp.max(jnp.abs(blocks.reshape(blocks.shape[0], -1)), axis=-1)
    return tri * (mag >= drop_tol).astype(tri.dtype)


def apply_edge_mask(blocks: jax.Array, mask: jax.Array) -> jax.Array:
    return blocks * mask[:, None, None]


def two_hop_host(
    edge_index: np.ndarray,
    n_nodes: int,
    edge_attr: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Host-side two-hop sparsity expansion (pattern of A + A², no self
    loops added beyond existing), new edges get zero features.

    Returns the new (sorted) edge_index and expanded edge_attr.
    """
    row, col = edge_index[0], edge_index[1]
    adj = sp.csr_matrix(
        (np.ones(len(row)), (row, col)), shape=(n_nodes, n_nodes)
    )
    adj2 = adj @ adj
    adj2.setdiag(0)
    adj2.eliminate_zeros()
    combined = ((adj + adj2) > 0).tocoo()
    order = np.lexsort((combined.col, combined.row))
    new_row, new_col = combined.row[order], combined.col[order]
    new_ei = np.stack([new_row, new_col]).astype(np.int64)
    if edge_attr is None:
        return new_ei, None
    # map old edges into the new edge list; others zero
    nb = n_nodes
    old_key = row.astype(np.int64) * nb + col
    new_key = new_row.astype(np.int64) * nb + new_col
    pos = np.searchsorted(new_key, old_key)
    attr = np.zeros((len(new_row),) + edge_attr.shape[1:], dtype=edge_attr.dtype)
    attr[pos] = edge_attr
    return new_ei, attr
