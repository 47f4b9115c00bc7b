"""Pure-XLA block SpMV / SPAI kernels (layout-tuned gather formulations).

Semantics parity with the reference's message-passing ops
(neural_cg/nn/basic_layers.py):
  * ``spmv``       ~ GraphSpmv (:112-142):          y_i = sum_j A_ij x_j
  * ``spmv_t``     ~ GraphSpmv(use_transpose=True): y_j = sum_i A_ij^T x_i
  * ``spai_apply`` ~ AATPE (:228-261):  y = eps*x + A (A^T x), optionally
    Jacobi-scaled  y = eps*diag*x + A (diag * (A^T x)).
  * ``llt_apply``  ~ LLT (:264-275):    y = L (L^T x).

TPU performance notes (measured, v5e):
  * All hot arrays keep the large node dimension minor: ELL planes are
    ``[K, N]``, block-component value planes ``[b, b, K, N]``, and the
    vector is handled component-major ``[b, N]`` internally. ``[N, K]`` or
    trailing ``[..., b, b]`` layouts waste up to ~40x bandwidth on lane
    padding.
  * XLA's dynamic gather on v5e sustains ~15-20 G elements/s for fp32 —
    the formulation below does b gathers of x planes plus (training path
    only) b^2 value-plane gathers; solver-side matrices `freeze_values()`
    once so the per-iteration SpMV reads values directly.
  * Never close over a BlockGraph under jit — pass it as an argument
    (closure constants are inlined into the HLO).

All functions take ``x`` of shape [N, b] and are differentiable; the VJP
of gather is scatter-add, so the SPAI apply backprops through both SpMVs
exactly as the reference's training loss requires (workspace.py:96-112).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..sparse.bcoo import BlockGraph, EllView, _ell_values


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
    """Segment-sum SpMV over COO edges (fallback path; padding edges must
    carry zero blocks)."""
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
    ell: EllView,
    graph: BlockGraph,
    x: jax.Array,
    vals: Optional[jax.Array],
    transpose_blocks: bool,
) -> jax.Array:
    """Core [K,N]-layout ELL matvec. x: [N, b] -> y: [N, b].

    vals: frozen [b, b, K, N] planes, or None to gather from edge-ordered
    blocks (training path).
    """
    b = graph.block_size
    if vals is None:
        vals = _ell_values(ell, graph.blocks, transpose_blocks)
    xt = x.T  # [b, N]
    xg = xt[:, ell.ell_col]  # [b, K, N] — b gathers of [K, N]
    # y[p, i] = sum_q sum_k vals[p, q, k, i] * xg[q, k, i]
    yt = jnp.einsum("pqkn,qkn->pn", vals, xg)
    return yt.T


def spmv_ell(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    x = _check_x(graph, x)
    assert graph.ell is not None, "graph has no ELL view; call attach_ell"
    y = _ell_matvec(graph.ell, graph, x, graph.ell_vals, transpose_blocks=False)
    if mask is not None:
        y = y * mask.reshape(y.shape)
    return y


def spmv_t_ell(
    graph: BlockGraph, x: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    x = _check_x(graph, x)
    assert graph.ell_t is not None, "graph has no transpose ELL view"
    y = _ell_matvec(graph.ell_t, graph, x, graph.ell_vals_t, transpose_blocks=True)
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
