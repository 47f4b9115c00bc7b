"""Pure-XLA block SpMV / SPAI kernels (gather + einsum + segment-sum).

Semantics parity with the reference's message-passing ops
(neural_cg/nn/basic_layers.py):
  * ``spmv``       ~ GraphSpmv (:112-142):          y_i = sum_j A_ij x_j
  * ``spmv_t``     ~ GraphSpmv(use_transpose=True): y_j = sum_i A_ij^T x_i
  * ``spai_apply`` ~ AATPE (:228-261):  y = eps*x + A (A^T x), optionally
    Jacobi-scaled  y = eps*diag*x + A (diag * (A^T x)).
  * ``llt_apply``  ~ LLT (:264-275):    y = L (L^T x).

Two formulations:
  * ELL (default when the graph carries ELL views): scatter-free
    ``gather → block matmul → masked row-sum``. This is the TPU-native hot
    path — XLA lowers the gathers to dynamic-gather and the contraction to
    VPU/MXU work with no serialization hazards.
  * COO fallback: gather + ``jax.ops.segment_sum`` (sorted scatter-add);
    used when no ELL view is attached (e.g. ad-hoc graphs in tests).

All functions take ``x`` of shape [N, b] (block layout) and are
differentiable end-to-end — the VJP of a gather is a scatter-add, which XLA
generates; the SPAI apply therefore backprops through both SpMVs exactly as
the reference's training loss requires (workspace.py:96-112).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..sparse.bcoo import BlockGraph, EllView


def _check_x(graph: BlockGraph, x: jax.Array) -> jax.Array:
    if x.ndim == 1:
        x = x.reshape(graph.n_nodes, graph.block_size)
    assert x.shape == (graph.n_nodes, graph.block_size), (
        f"x shape {x.shape} != {(graph.n_nodes, graph.block_size)}"
    )
    return x


def spmv_coo(
    graph: BlockGraph,
    x: jax.Array,
    transpose: bool = False,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Segment-sum SpMV over COO edges. Padding edges carry zero blocks."""
    x = _check_x(graph, x)
    src = graph.edge_row if transpose else graph.edge_col
    dst = graph.edge_col if transpose else graph.edge_row
    blocks = graph.blocks
    xg = x[src]  # [E, b]
    if transpose:
        prod = jnp.einsum("ecb,ec->eb", blocks, xg)
    else:
        prod = jnp.einsum("ebc,ec->eb", blocks, xg)
    y = jax.ops.segment_sum(prod, dst, num_segments=graph.n_nodes)
    if mask is not None:
        y = y * mask.reshape(y.shape)
    return y


def _ell_matvec(
    ell: EllView, blocks: jax.Array, x: jax.Array, transpose_blocks: bool
) -> jax.Array:
    """y[i] = sum_k mask[i,k] * B[ell_edge[i,k]] (@ or ^T@) x[ell_col[i,k]]."""
    be = blocks[ell.ell_edge]  # [N, K, b, b]
    xg = x[ell.ell_col]  # [N, K, b]
    if transpose_blocks:
        prod = jnp.einsum("nkcb,nkc->nkb", be, xg)
    else:
        prod = jnp.einsum("nkbc,nkc->nkb", be, xg)
    m = ell.ell_mask.astype(prod.dtype)
    return jnp.einsum("nkb,nk->nb", prod, m)


def spmv_ell(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    x = _check_x(graph, x)
    assert graph.ell is not None, "graph has no ELL view; call attach_ell"
    y = _ell_matvec(graph.ell, graph.blocks, x, transpose_blocks=False)
    if mask is not None:
        y = y * mask.reshape(y.shape)
    return y


def spmv_t_ell(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    x = _check_x(graph, x)
    assert graph.ell_t is not None, "graph has no transpose ELL view"
    y = _ell_matvec(graph.ell_t, graph.blocks, x, transpose_blocks=True)
    if mask is not None:
        y = y * mask.reshape(y.shape)
    return y


def spmv(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """y = A x. Uses the ELL view when attached, COO segment-sum otherwise."""
    if graph.ell is not None:
        return spmv_ell(graph, x, mask)
    return spmv_coo(graph, x, transpose=False, mask=mask)


def spmv_t(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """y = A^T x."""
    if graph.ell_t is not None:
        return spmv_t_ell(graph, x, mask)
    return spmv_coo(graph, x, transpose=True, mask=mask)


def spai_apply(
    graph: BlockGraph,
    x: jax.Array,
    epsilon: float,
    mask: Optional[jax.Array] = None,
    diag: Optional[jax.Array] = None,
) -> jax.Array:
    """SPAI preconditioner apply: the M^{-1} of the paper's method.

      diag is None:  y = eps * x       + A (A^T x)
      else:          y = eps * diag*x  + A (diag * (A^T x))

    (reference AATPE, basic_layers.py:243-261; the scaled form is the
    Jacobi-scaled variant of scaled_workspace.py:98-101.)
    """
    x = _check_x(graph, x)
    at_x = spmv_t(graph, x, mask)
    eps_x = epsilon * x
    if diag is not None:
        d = diag.reshape(x.shape)
        at_x = at_x * d
        eps_x = eps_x * d
    y = spmv(graph, at_x, mask)
    return eps_x + y


def llt_apply(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """y = L (L^T x) — product-form IC apply (reference LLT)."""
    x = _check_x(graph, x)
    return spmv(graph, spmv_t(graph, x, mask), mask)
