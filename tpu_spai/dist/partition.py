"""Host-side partitioner: RCM reorder -> contiguous row shards -> halo sets.

Strategy (SURVEY §2.10 / BASELINE north star): reverse-Cuthill-McKee
reduces the matrix bandwidth so that after partitioning block rows into
``n_shards`` equal contiguous chunks, every off-shard column reference
falls within ``halo`` rows of the shard boundary — one left + one right
neighbor exchange per SpMV, no all-to-all.

Per shard, the local SpMV is the same scatter-free ELL formulation as the
single-chip kernel, with column ids rebased into the extended vector
``[left_halo | local | right_halo]``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..sparse.convert import blocks_from_coo


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedSystem:
    """Row-partitioned block matrix in per-shard ELL form.

    Leading axis of every array is the shard axis (length P); shard_map
    splits it. Column ids index the extended local vector of length
    ``halo + chunk + halo``.
    """

    # TPU layout: node dim minor ([K, chunk] planes), block components
    # leading; values frozen in ELL order (solver-side matrices are static
    # across CG iterations).
    ell_vals: jax.Array  # [P, b, b, K, chunk] masked values
    ell_col: jax.Array  # int32 [P, K, chunk] -> extended-vector index
    diag: jax.Array  # [P, chunk, b] diagonal (for jacobi / scaled SPAI)
    row_valid: jax.Array  # [P, chunk] 1/0 (padding rows at the global end)
    n_shards: int = _static(default=1)
    chunk: int = _static(default=0)  # block rows per shard
    halo: int = _static(default=0)  # block rows exchanged with each neighbor
    block_size: int = _static(default=1)

    @property
    def n_rows_padded(self) -> int:
        return self.n_shards * self.chunk


def rcm_permutation(a: sp.spmatrix) -> np.ndarray:
    """Bandwidth-reducing row permutation: reverse Cuthill-McKee, kept only
    when it actually reduces the bandwidth. scipy's RCM can WORSEN an
    already-banded ordering (structured res=24 tet box: natural bw 650 ->
    RCM 1518, inflating the gsel slot count 2x) — the identity is the
    correct fallback for meshes generated in a banded node order."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = sp.csr_matrix(a)
    perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
    coo = a.tocoo()
    bw_nat = int(np.abs(coo.row - coo.col).max()) if coo.nnz else 0
    pos = np.empty_like(perm)
    pos[perm] = np.arange(len(perm))
    bw_rcm = int(np.abs(pos[coo.row] - pos[coo.col]).max()) if coo.nnz else 0
    if bw_rcm >= bw_nat:
        return np.arange(a.shape[0])
    return perm


def partition_system(
    a: sp.spmatrix,
    n_shards: int,
    block_size: int = 1,
    reorder: bool = True,
    halo: Optional[int] = None,
    dtype=np.float64,
) -> Tuple[PartitionedSystem, np.ndarray]:
    """Partition a DOF-level sparse matrix into `PartitionedSystem`.

    Returns (system, perm) where ``perm`` is the block-row permutation
    applied (solution vectors need ``x_orig[perm] = x_part`` to undo).
    """
    a = sp.csr_matrix(a, dtype=dtype)
    n_dofs = a.shape[0]
    assert n_dofs % block_size == 0
    nb = n_dofs // block_size

    # block-level pattern for reordering/bandwidth
    if block_size > 1:
        pat = sp.csr_matrix(
            (np.ones(a.nnz), a.indices // block_size,
             np.concatenate([a.indptr[::block_size]]))
        ) if False else None
        # build block pattern robustly via COO
        coo = a.tocoo()
        pat = sp.csr_matrix(
            (np.ones(len(coo.row)), (coo.row // block_size, coo.col // block_size)),
            shape=(nb, nb),
        )
    else:
        pat = a

    perm = rcm_permutation(pat) if reorder else np.arange(nb)
    # apply block permutation to the DOF matrix
    dof_perm = (perm[:, None] * block_size + np.arange(block_size)).reshape(-1)
    ap = a[dof_perm][:, dof_perm].tocoo()

    vals, brow, bcol = blocks_from_coo(ap, block_size)
    bandwidth = int(np.max(np.abs(brow - bcol))) if len(brow) else 0

    chunk = -(-nb // n_shards)  # ceil
    if halo is None:
        halo = min(bandwidth, chunk)
    if bandwidth > chunk:
        raise ValueError(
            f"bandwidth {bandwidth} exceeds shard chunk {chunk}; "
            f"use fewer shards or a better ordering"
        )
    n_pad = chunk * n_shards

    b = block_size
    shard_of = brow // chunk
    local_row = brow % chunk

    k_max = 1
    per_shard = []
    for s in range(n_shards):
        sel = shard_of == s
        r = local_row[sel]
        c = bcol[sel]
        v = vals[sel]
        start = s * chunk
        # extended-vector index: halo + (c - start); halo region covers
        # [start-halo, start+chunk+halo)
        ce = halo + (c - start)
        assert (ce >= 0).all() and (ce < chunk + 2 * halo).all()
        counts = np.bincount(r, minlength=chunk)
        k_max = max(k_max, int(counts.max()) if len(r) else 1)
        per_shard.append((r, ce, v, counts, start))

    vals_l, ell_col_l, diag_l, rv_l = [], [], [], []
    gdiag = ap.tocsr().diagonal()
    for r, ce, v, counts, start in per_shard:
        e_loc = len(r)
        order = np.argsort(r, kind="stable")
        slot = np.arange(e_loc) - np.concatenate(([0], np.cumsum(counts)))[r[order]]
        ec = np.zeros((k_max, chunk), dtype=np.int32)
        ev = np.zeros((b, b, k_max, chunk), dtype=dtype)
        ec[slot, r[order]] = ce[order]
        ev[:, :, slot, r[order]] = v[order].transpose(1, 2, 0)
        vals_l.append(ev)
        ell_col_l.append(ec)
        d = np.zeros((chunk, b), dtype=dtype)
        lo, hi = start * b, min((start + chunk) * b, n_dofs)
        d.reshape(-1)[: hi - lo] = gdiag[lo:hi]
        diag_l.append(d)
        rv = np.zeros(chunk, dtype=dtype)
        rv[: max(0, min(chunk, nb - start))] = 1
        rv_l.append(rv)

    return (
        PartitionedSystem(
            ell_vals=jnp.asarray(np.stack(vals_l)),
            ell_col=jnp.asarray(np.stack(ell_col_l)),
            diag=jnp.asarray(np.stack(diag_l)),
            row_valid=jnp.asarray(np.stack(rv_l)),
            n_shards=n_shards,
            chunk=chunk,
            halo=halo,
            block_size=b,
        ),
        perm,
    )


def scatter_vector(x: np.ndarray, perm: np.ndarray, sys: PartitionedSystem) -> jnp.ndarray:
    """Global DOF vector -> padded sharded [P, chunk, b] layout."""
    b = sys.block_size
    nb = len(perm)
    xp = np.asarray(x).reshape(nb, b)[np.argsort(np.argsort(perm))] if False else None
    # x is in original ordering; permuted row i holds original row perm[i]
    xr = np.asarray(x).reshape(nb, b)[perm]
    pad = sys.n_rows_padded - nb
    if pad:
        xr = np.concatenate([xr, np.zeros((pad, b), dtype=xr.dtype)])
    return jnp.asarray(xr.reshape(sys.n_shards, sys.chunk, b))


def gather_vector(xs: jnp.ndarray, perm: np.ndarray, sys: PartitionedSystem) -> np.ndarray:
    """Sharded [P, chunk, b] -> global DOF vector in original ordering."""
    nb = len(perm)
    flat = np.asarray(xs).reshape(sys.n_rows_padded, sys.block_size)[:nb]
    out = np.empty_like(flat)
    out[perm] = flat
    return out.reshape(-1)
