"""Padded graph batching with segment ids (the TPU answer to PyG's ptr).

The reference collates PyG graphs by concatenation and slices per-sample
quantities with ``batch.ptr`` in Python loops (loss.py:131-141,
workspace.py:114-143). Under XLA, dynamic per-sample slicing is hostile, so
a `GraphBatch` instead carries
  * ``node_seg`` / ``edge_seg`` — graph id per node/edge (padding rows get
    id ``n_graphs``, an extra segment that reductions drop), and
  * ``node_valid`` — 1/0 float mask over padded nodes,
and every per-sample reduction becomes one `segment_sum`.

Shapes are padded to buckets (next power-of-two style) so mixed-topology
training reuses compiled programs.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.bcoo import (
    BlockGraph,
    EllView,
    host_ell_planes,
    transpose_permutation,
)


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


# Per-sample host ELL planes + transpose permutation, keyed by topology.
# The argsorts/lexsorts behind them cost ~0.4 s/sample at reference scale
# (E~270k) and are pure per-topology quantities; re-deriving them per
# training step made collate the dominant step cost. Batch planes are
# assembled from the cached per-sample planes by offset concatenation,
# which is EXACTLY what build_ell produces on the block-diagonal batch
# graph (disjoint node ranges; stable row sort groups per sample).
_SAMPLE_ELL_CACHE: dict = {}
_SAMPLE_ELL_BYTES = [0]
# byte cap (host RAM): entries are ~6 [K, n] planes, tens of MB at
# reference scale; FIFO eviction keeps multi-topology datasets bounded
_SAMPLE_ELL_CACHE_CAP = int(
    os.environ.get("TPU_SPAI_ELL_CACHE_BYTES", 4 * 1024**3)
)


def _ell_entry_nbytes(hit) -> int:
    fwd, bwd, perm = hit
    return (
        sum(p.nbytes for p in fwd)
        + sum(p.nbytes for p in bwd)
        + (perm.nbytes if perm is not None else 0)
    )


def _sample_host_ell(s):
    ei = np.asarray(s.edge_index)
    rows = np.ascontiguousarray(ei[0])
    cols = np.ascontiguousarray(ei[1])
    key = (
        int(s.num_nodes),
        rows.shape[0],
        hash(rows.tobytes()),
        hash(cols.tobytes()),
    )
    hit = _SAMPLE_ELL_CACHE.get(key)
    if hit is None:
        fwd = host_ell_planes(rows, cols, s.num_nodes)
        bwd = host_ell_planes(cols, rows, s.num_nodes)
        try:
            perm = transpose_permutation(rows, cols)
        except ValueError:
            perm = None
        hit = (fwd, bwd, perm)
        nb = _ell_entry_nbytes(hit)
        while _SAMPLE_ELL_CACHE and _SAMPLE_ELL_BYTES[0] + nb > _SAMPLE_ELL_CACHE_CAP:
            oldest = next(iter(_SAMPLE_ELL_CACHE))  # FIFO
            _SAMPLE_ELL_BYTES[0] -= _ell_entry_nbytes(
                _SAMPLE_ELL_CACHE.pop(oldest)
            )
        if nb <= _SAMPLE_ELL_CACHE_CAP:
            _SAMPLE_ELL_CACHE[key] = hit
            _SAMPLE_ELL_BYTES[0] += nb
    return hit


def _assemble_ell(parts, n_offs, e_offs, sizes, n_pad, width):
    """Concatenate per-sample [K_s, n_s] ELL planes into batch [K, n_pad].

    `width` is a bucketing hint: planes pad up to it so mixed batches share
    one compiled program; a batch exceeding it just compiles a wider one.
    """
    k = max(p[0].shape[0] for p in parts)
    k = max(k, width or 0)
    ell_edge = np.zeros((k, n_pad), np.int32)
    ell_col = np.zeros((k, n_pad), np.int32)
    ell_mask = np.zeros((k, n_pad), np.float32)
    for (pe, pc, pm), noff, eoff, n_s in zip(parts, n_offs, e_offs, sizes):
        ks = pe.shape[0]
        valid = pm.astype(bool)
        ell_edge[:ks, noff : noff + n_s] = np.where(valid, pe + eoff, 0)
        ell_col[:ks, noff : noff + n_s] = np.where(valid, pc + noff, 0)
        ell_mask[:ks, noff : noff + n_s] = pm
    return EllView(
        ell_edge=jnp.asarray(ell_edge),
        ell_col=jnp.asarray(ell_col),
        ell_mask=jnp.asarray(ell_mask),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A batch of sparsity graphs, block-diagonally concatenated + padded."""

    graph: BlockGraph  # matrix values A as blocks (with ELL views)
    x: jax.Array  # [N, Fn] node features
    edge_attr: jax.Array  # [E, Fe] edge features
    mask: jax.Array  # [N, b] Dirichlet mask (0 on constrained dofs & padding)
    residual: jax.Array  # [N, b] rhs r
    node_seg: jax.Array  # int32 [N]; padding -> n_graphs
    edge_seg: jax.Array  # int32 [E]; padding -> n_graphs
    node_valid: jax.Array  # [N] float 1/0
    n_graphs: int = _static(default=1)
    diagonal: Optional[jax.Array] = None  # [N, b]
    inv_diag: Optional[jax.Array] = None  # [N, b]
    rsqrt_diag: Optional[jax.Array] = None  # [N, b]
    gt: Optional[jax.Array] = None  # [N, b]

    @property
    def n_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def block_size(self) -> int:
        return self.graph.block_size

    @property
    def edge_index(self) -> jax.Array:
        return jnp.stack([self.graph.edge_row, self.graph.edge_col])

    @property
    def edge_valid(self) -> jax.Array:
        """1/0 mask over padded edges. Padding edges are wired to node 0
        (static shapes) — GNN message passing MUST weight messages by this
        mask or node 0 aggregates `pad_e` spurious MLP-bias messages."""
        return (self.edge_seg < self.n_graphs).astype(jnp.float32)


def _bucket(n: int, granularity: int = 256) -> int:
    """Round up to a bucket boundary to bound the number of compilations."""
    if n <= granularity:
        return max(granularity, 1)
    p = 1 << (int(np.ceil(np.log2(n))))
    # use half-power-of-two steps (1.0x..1.5x overhead max)
    half = 3 * (p // 4)
    return half if n <= half else p


def collate(
    samples: Sequence["GraphSample"],
    node_bucket: Optional[int] = None,
    edge_bucket: Optional[int] = None,
    dtype=jnp.float32,
    with_ell: bool = True,
    ell_width: Optional[int] = None,
) -> GraphBatch:
    """Concatenate `GraphSample`s (numpy, from the data pipeline) into one
    padded `GraphBatch` on device."""
    from .sample import GraphSample  # circular-safe

    b = samples[0].block_size
    n_graphs = len(samples)
    n_total = sum(s.num_nodes for s in samples)
    e_total = sum(s.edge_index.shape[1] for s in samples)
    n_pad = node_bucket or _bucket(n_total)
    e_pad = edge_bucket or _bucket(e_total)
    if n_pad < n_total or e_pad < e_total:
        raise ValueError(
            f"bucket too small: nodes {n_total}>{n_pad} or edges {e_total}>{e_pad}"
        )

    def cat_pad(arrs, pad_rows, fill=0.0):
        out = np.concatenate(arrs, axis=0)
        if pad_rows:
            pad = np.full((pad_rows,) + out.shape[1:], fill, dtype=out.dtype)
            out = np.concatenate([out, pad], axis=0)
        return out

    rows, cols, node_seg, edge_seg = [], [], [], []
    off = 0
    for gid, s in enumerate(samples):
        rows.append(s.edge_index[0] + off)
        cols.append(s.edge_index[1] + off)
        node_seg.append(np.full(s.num_nodes, gid, dtype=np.int32))
        edge_seg.append(np.full(s.edge_index.shape[1], gid, dtype=np.int32))
        off += s.num_nodes
    pad_n = n_pad - n_total
    pad_e = e_pad - e_total
    row = np.concatenate(rows + [np.zeros(pad_e, dtype=np.int64)])
    col = np.concatenate(cols + [np.zeros(pad_e, dtype=np.int64)])
    node_seg = np.concatenate(node_seg + [np.full(pad_n, n_graphs, np.int32)])
    edge_seg = np.concatenate(edge_seg + [np.full(pad_e, n_graphs, np.int32)])

    blocks = cat_pad([s.matrix_values for s in samples], pad_e).astype(dtype)
    graph = BlockGraph(
        edge_row=jnp.asarray(row, dtype=jnp.int32),
        edge_col=jnp.asarray(col, dtype=jnp.int32),
        blocks=jnp.asarray(blocks),
        n_nodes=n_pad,
        block_size=b,
    )
    if with_ell:
        # batch ELL views from cached per-sample planes (identical to
        # attach_ell on the concatenated graph, without its per-step
        # argsort/lexsort cost); freeze A's ELL value planes (reused by
        # every loss-side spmv) — the GNN factor goes through
        # with_blocks() which drops them
        parts = [_sample_host_ell(s) for s in samples]
        n_offs = np.cumsum([0] + [s.num_nodes for s in samples])[:-1]
        e_offs = np.cumsum([0] + [s.edge_index.shape[1] for s in samples])[:-1]
        sizes = [s.num_nodes for s in samples]
        ell = _assemble_ell(
            [p[0] for p in parts], n_offs, e_offs, sizes, n_pad, ell_width
        )
        ell_t = _assemble_ell(
            [p[1] for p in parts], n_offs, e_offs, sizes, n_pad, ell_width
        )
        perm_arr = None
        if all(p[2] is not None for p in parts):
            perm = np.arange(e_pad, dtype=np.int32)
            for p, eoff in zip(parts, e_offs):
                perm[eoff : eoff + len(p[2])] = p[2] + eoff
            perm_arr = jnp.asarray(perm)
        graph = dataclasses.replace(
            graph, ell=ell, ell_t=ell_t, transpose_perm=perm_arr
        ).freeze_values()

    def opt(namefn):
        vals = [namefn(s) for s in samples]
        if any(v is None for v in vals):
            return None
        return jnp.asarray(cat_pad(vals, pad_n).astype(dtype))

    node_valid = np.zeros(n_pad, dtype=np.float32)
    node_valid[:n_total] = 1.0

    return GraphBatch(
        graph=graph,
        x=jnp.asarray(cat_pad([s.x for s in samples], pad_n).astype(dtype)),
        edge_attr=jnp.asarray(
            cat_pad([s.edge_attr for s in samples], pad_e).astype(dtype)
        ),
        mask=jnp.asarray(cat_pad([s.mask for s in samples], pad_n).astype(dtype)),
        residual=jnp.asarray(
            cat_pad([s.residual for s in samples], pad_n).astype(dtype)
        ),
        node_seg=jnp.asarray(node_seg),
        edge_seg=jnp.asarray(edge_seg),
        node_valid=jnp.asarray(node_valid),
        n_graphs=n_graphs,
        diagonal=opt(lambda s: s.diagonal),
        inv_diag=opt(lambda s: s.inv_diag),
        rsqrt_diag=opt(lambda s: s.rsqrt_diag),
        gt=opt(lambda s: s.gt),
    )
