"""Host-side converters between graph (block-COO) form and scipy sparse.

Parity with the reference:
  * ``blocks_from_coo``    ~ neural_cg/data.py:15-65 ``to_bcoo_components``
    (vectorized here instead of the reference's python-dict accumulation).
  * ``graph_to_csr``       ~ neural_cg/utils/validate.py:22-51 ``to_csr_cpu``.
  * ``apply_dbc_masking``  ~ neural_cg/data.py:159-170 (zero masked rows and
    columns, then put 1 on the masked diagonal so the matrix stays SPD after
    Dirichlet elimination).

These run on the host (numpy/scipy) at data-load / benchmark boundaries,
never inside the jitted compute path.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import scipy.sparse as sp

from .bcoo import BlockGraph, attach_ell

ArrayLike = Union[np.ndarray, "object"]


def _np(x) -> np.ndarray:
    """Coerce jax/np arrays to host numpy."""
    return np.asarray(x)


def blocks_from_coo(
    coo: sp.coo_matrix, block_size: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO matrix -> (block_values [nB,b,b], block_row [nB], block_col [nB]).

    Scalar entries sharing a block are accumulated into dense b×b blocks;
    blocks are emitted in (row, col) sorted order.
    """
    if block_size <= 0:
        raise ValueError("block size must be positive")
    coo = coo.tocoo()
    b = block_size
    br, bc = coo.row // b, coo.col // b
    ir, ic = coo.row % b, coo.col % b
    nb_cols = coo.shape[1] // b
    key = br.astype(np.int64) * nb_cols + bc
    uniq, inv = np.unique(key, return_inverse=True)
    values = np.zeros((len(uniq), b, b), dtype=coo.data.dtype)
    np.add.at(values, (inv, ir, ic), coo.data)
    return values, (uniq // nb_cols).astype(np.int64), (uniq % nb_cols).astype(np.int64)


def apply_dbc_masking(
    mat: Union[sp.spmatrix, sp.sparray], mask: np.ndarray
) -> sp.csr_matrix:
    """Zero masked rows/cols and set unit diagonal on masked DOFs.

    ``mask`` is 1 for free DOFs, 0 for Dirichlet-constrained ones; the
    result is SPD whenever the free-free sub-block is.
    """
    coo = sp.coo_matrix(mat)
    m = _np(mask).reshape(-1)
    keep = (m[coo.row] != 0) & (m[coo.col] != 0)
    data = np.where(keep, coo.data, 0.0)
    out = sp.coo_matrix((data, (coo.row, coo.col)), shape=coo.shape)
    return sp.csr_matrix(out + sp.diags(1.0 - m, 0, shape=coo.shape))


def graph_to_csr(
    edge_index: ArrayLike,
    edge_attr: ArrayLike,
    n: int,
    mask: Optional[ArrayLike] = None,
    dtype=np.float64,
    n_valid_edges: Optional[int] = None,
) -> sp.csr_matrix:
    """Rebuild a scipy CSR/BSR from graph form, applying Dirichlet masking.

    ``edge_attr`` is [E] / [E,1,1] scalar values or [E,b,b] blocks; ``n`` is
    the DOF (not block) dimension. Padding edges beyond ``n_valid_edges``
    are dropped (they carry zero blocks on device, but dropping keeps the
    host pattern tight for factorizations).
    """
    ei = _np(edge_index)
    vals = _np(edge_attr).astype(dtype)
    if vals.ndim == 1:
        vals = vals.reshape(-1, 1, 1)
    if n_valid_edges is not None:
        ei = ei[:, :n_valid_edges]
        vals = vals[:n_valid_edges]
    row, col = ei[0].astype(np.int64), ei[1].astype(np.int64)
    b = vals.shape[-1]
    nb = n // b
    if b == 1:
        mat = sp.csr_matrix((vals.reshape(-1), (row, col)), shape=(n, n), dtype=dtype)
    else:
        # Order blocks CSR-style, then wrap as BSR without re-bucketing.
        pattern = sp.csr_matrix(
            (np.arange(1, len(row) + 1), (row, col)), shape=(nb, nb)
        )
        pattern.sort_indices()
        order = pattern.data.astype(np.int64) - 1
        mat = sp.bsr_matrix(
            (vals[order], pattern.indices, pattern.indptr),
            blocksize=(b, b),
            shape=(n, n),
        )
    if mask is not None:
        mat = apply_dbc_masking(mat, _np(mask).astype(dtype))
    out = sp.csr_matrix(mat)
    out.sort_indices()
    return out


def csr_to_graph(
    mat: Union[sp.spmatrix, sp.sparray],
    block_size: int = 1,
    dtype=np.float64,
    pad_edges_to: Optional[int] = None,
    with_ell: bool = True,
    ell_width: Optional[int] = None,
    freeze: bool = True,
) -> BlockGraph:
    """scipy sparse -> device `BlockGraph` (optionally edge-padded + ELL).

    Padding edges are appended as zero blocks at (0, 0); they contribute
    nothing to SpMV and are excluded from the ELL planes.
    """
    import jax.numpy as jnp

    coo = sp.coo_matrix(mat)
    n = coo.shape[0]
    if n % block_size:
        raise ValueError("matrix dim not divisible by block size")
    if block_size == 1:
        order = np.lexsort((coo.col, coo.row))
        values = coo.data[order].reshape(-1, 1, 1).astype(dtype)
        brow, bcol = coo.row[order], coo.col[order]
    else:
        values, brow, bcol = blocks_from_coo(coo, block_size)
        values = values.astype(dtype)
    n_valid = len(brow)
    e_pad = n_valid if pad_edges_to is None else pad_edges_to
    if e_pad < n_valid:
        raise ValueError("pad_edges_to smaller than edge count")
    if e_pad > n_valid:
        pad = e_pad - n_valid
        values = np.concatenate(
            [values, np.zeros((pad, block_size, block_size), dtype=dtype)]
        )
        brow = np.concatenate([brow, np.zeros(pad, dtype=brow.dtype)])
        bcol = np.concatenate([bcol, np.zeros(pad, dtype=bcol.dtype)])
    graph = BlockGraph(
        edge_row=jnp.asarray(brow, dtype=jnp.int32),
        edge_col=jnp.asarray(bcol, dtype=jnp.int32),
        blocks=jnp.asarray(values),
        n_nodes=n // block_size,
        block_size=block_size,
    )
    if with_ell:
        graph = attach_ell(graph, n_valid=n_valid, width=ell_width, freeze=freeze)
    return graph


def random_spd_graph(
    n: int,
    density: float = 0.01,
    block_size: int = 1,
    seed: int = 0,
    alpha: float = 1.0,
    dtype=np.float64,
) -> Tuple[BlockGraph, sp.csr_matrix]:
    """Small random SPD test matrix: ``A = M M^T + alpha*I`` (host helper)."""
    rng = np.random.default_rng(seed)
    m = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = sp.csr_matrix(m @ m.T + alpha * sp.eye(n))
    a.sort_indices()
    return csr_to_graph(a, block_size=block_size, dtype=dtype), a
