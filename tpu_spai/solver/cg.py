"""Preconditioned Conjugate Gradient as a `jax.lax.while_loop`.

This is the production solve loop — the TPU-native counterpart of the
native CG inside pymathprim that the reference benchmarks through
(neural_cg/utils/validate.py:54-121). Per iteration:

    q      = A d                  (1 SpMV)
    alpha  = delta / <d, q>       (1 dot)
    x     += alpha d
    r     -= alpha q
    s      = M^{-1} r             (preconditioner apply; for SPAI: 2 SpMVs)
    delta' = <r, s>               (1 dot)
    beta   = delta' / delta
    d      = s + beta d

Convergence test: ||r||_2 / ||b||_2 <= rtol (the reference's stopping rule,
validate.py:57). `rtol` and `max_iter` are traced scalars, so tolerance
sweeps (misc/infer_all_precision.sh) reuse one compiled program.

Precision policy (mirrors infer_all_precision's fp64/fp32/mixed sweep):
the dtype of `b`/graph drives storage; `dot_dtype` optionally upcasts the
scalar reductions (mixed precision: fp32 SpMV + fp64 dots) — on TPU this
keeps the bandwidth-bound SpMV at full speed while stabilizing the
recurrence (fp64 is emulated and ~an order of magnitude slower).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..kernels.spmv_xla import spmv
from ..sparse.bcoo import BlockGraph
from .preconditioners import Preconditioner


class CGResult(NamedTuple):
    x: jax.Array  # solution, same shape as b
    iters: jax.Array  # int32 iteration count
    relres: jax.Array  # final ||r|| / ||b||
    converged: jax.Array  # bool
    # rr-tier diagnostics (VERDICT r4 item 4): anchor groups where the
    # TRUE residual increased (bad-branch signature), and whether the
    # solve was re-run on the ds-A tier to recover
    rebounds: int = 0
    escalated: bool = False


def _dot(a: jax.Array, b: jax.Array, dtype) -> jax.Array:
    if dtype == "chunk64":
        # compensated mixed-precision dot: f32 products, f32 sums within
        # 128-lane chunks (error bounded by the chunk length, not n), exact
        # f64 accumulation of the n/128 partials. ~f32 cost, ~f64 robustness
        # — avoids the ~10x emulated-f64 multiply on TPU.
        p = (a.astype(jnp.float32) * b.astype(jnp.float32)).ravel()
        pad = (-p.shape[0]) % 128
        if pad:
            p = jnp.pad(p, (0, pad))
        partial = jnp.sum(p.reshape(-1, 128), axis=1)
        return jnp.sum(partial.astype(jnp.float64))
    return jnp.vdot(a.astype(dtype).ravel(), b.astype(dtype).ravel())


@partial(jax.jit, static_argnames=("dot_dtype", "matvec", "_shape_override"))
def pcg(
    graph: BlockGraph,
    b: jax.Array,
    prec: Optional[Preconditioner] = None,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    x0: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    dot_dtype=None,
    matvec: Optional[Callable[[BlockGraph, jax.Array], jax.Array]] = None,
    _shape_override: Optional[tuple] = None,
) -> CGResult:
    """Solve ``A x = b`` with PCG. ``b`` is [N, blk] or flat [N*blk].

    Args:
      prec: pytree `Preconditioner` (identity when None). Must be SPD.
      mask: optional [N, blk] Dirichlet mask applied to matvec outputs.
      dot_dtype: dtype for the scalar reductions (default: b.dtype).
      matvec: override for A·x (defaults to the ELL/COO spmv on `graph`);
        distributed callers pass a halo-exchanging matvec here.
    """
    orig_shape = b.shape
    n_nodes, nb = (
        _shape_override if _shape_override else (graph.n_nodes, graph.block_size)
    )
    bvec = b.reshape(n_nodes, nb)
    dd = dot_dtype or bvec.dtype
    dds = jnp.float64 if dd == "chunk64" else dd  # scalar dtype for rtol etc.
    mv = matvec if matvec is not None else (lambda g, v: spmv(g, v, mask))
    mapply = prec if prec is not None else (lambda r: r)
    rtol = jnp.asarray(rtol, dtype=dds)
    max_iter = jnp.asarray(max_iter, dtype=jnp.int32)

    x = jnp.zeros_like(bvec) if x0 is None else x0.reshape(bvec.shape)
    r = bvec - mv(graph, x)
    s = mapply(r)
    delta = _dot(r, s, dd)
    bnorm2 = _dot(bvec, bvec, dd)
    tol2 = (rtol * rtol) * jnp.maximum(bnorm2, jnp.finfo(dds).tiny)
    rnorm2 = _dot(r, r, dd)

    def cond(state):
        _, _, _, _, rnorm2, it = state
        return jnp.logical_and(rnorm2 > tol2, it < max_iter)

    def body(state):
        x, r, d, delta, _, it = state
        q = mv(graph, d)
        dq = _dot(d, q, dd)
        alpha = (delta / dq).astype(bvec.dtype)
        x = x + alpha * d
        r = r - alpha * q
        s = mapply(r)
        delta_new = _dot(r, s, dd)
        beta = (delta_new / delta).astype(bvec.dtype)
        d = s + beta * d
        rnorm2 = _dot(r, r, dd)
        return x, r, d, delta_new, rnorm2, it + 1

    state = (x, r, s, delta, rnorm2, jnp.int32(0))
    x, r, _, _, rnorm2, iters = jax.lax.while_loop(cond, body, state)
    relres = jnp.sqrt(rnorm2 / jnp.maximum(bnorm2, jnp.finfo(dds).tiny))
    return CGResult(
        x=x.reshape(orig_shape),
        iters=iters,
        relres=relres,
        converged=rnorm2 <= tol2,
    )


@partial(jax.jit, static_argnames=("n_iter", "dot_dtype"))
def pcg_trace(
    graph: BlockGraph,
    b: jax.Array,
    prec: Optional[Preconditioner] = None,
    n_iter: int = 50,
    mask: Optional[jax.Array] = None,
    dot_dtype=None,
):
    """Run exactly ``n_iter`` PCG steps, returning the residual-norm history.

    Parity/debug harness (SURVEY §7 stage 2): compare iterate-for-iterate
    against `scipy.sparse.linalg.cg` in fp64 — iteration counts are
    sensitive to reduction order, so this localizes any divergence to a
    specific iteration.
    """
    nb = graph.block_size
    bvec = b.reshape(graph.n_nodes, nb)
    dd = dot_dtype or bvec.dtype
    mapply = prec if prec is not None else (lambda r: r)

    x = jnp.zeros_like(bvec)
    r = bvec
    s = mapply(r)
    delta = _dot(r, s, dd)

    def step(state, _):
        x, r, d, delta = state
        q = spmv(graph, d, mask)
        alpha = (delta / _dot(d, q, dd)).astype(bvec.dtype)
        x = x + alpha * d
        r = r - alpha * q
        s = mapply(r)
        delta_new = _dot(r, s, dd)
        beta = (delta_new / delta).astype(bvec.dtype)
        d = s + beta * d
        rnorm = jnp.sqrt(_dot(r, r, dd))
        return (x, r, d, delta_new), rnorm

    (x, *_), history = jax.lax.scan(step, (x, r, s, delta), None, length=n_iter)
    return x, history
