"""Windowed (gather-free) operators wired into the PCG solver.

Builds `WindowedEll` planes from a `BlockGraph` (forward + transpose — SPD
system matrices reuse the forward planes since A = A^T in values, while
factors L share A's symmetric *pattern* but not values), and exposes:

  * `windowed_matvec`       — impl='pallas' (TPU) or 'xla' (CPU/tests)
  * `WindowedSpaiPrec`      — pytree preconditioner  eps x + L (L^T x)
  * `pcg_windowed`          — PCG whose matvec and preconditioner both run
    the gather-free kernels (the whole solve is one while_loop dispatch)

Caller contract: the matrix must be RCM-reordered (dist.partition.
rcm_permutation) before graph construction so the bandwidth is bounded —
`build_windowed_graph` returns None when the window would be too wide
(the synthetic random family), and callers fall back to the gather path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.window import WindowedEll, build_windowed, windowed_spmv_xla
from ..kernels.spmv_pallas import windowed_spmv_pallas
from ..sparse.bcoo import BlockGraph
from .cg import CGResult


def build_windowed_graph(
    graph: BlockGraph,
    tile: int = 128,
    max_q: int = 64,
    transpose_too: bool = False,
) -> Optional[Tuple[WindowedEll, Optional[WindowedEll]]]:
    """BlockGraph -> (forward, transpose?) windowed planes, or None if the
    pattern is not bandable within `max_q` chunks."""
    g = graph if graph.ell_vals is not None else graph.freeze_values()
    fwd = build_windowed(
        np.asarray(g.ell.ell_col),
        np.asarray(g.ell.ell_mask),
        np.asarray(g.ell_vals),
        tile=tile,
        max_q=max_q,
    )
    if fwd is None:
        return None
    if not transpose_too:
        return fwd, None
    bwd = build_windowed(
        np.asarray(g.ell_t.ell_col),
        np.asarray(g.ell_t.ell_mask),
        np.asarray(g.ell_vals_t),
        tile=tile,
        max_q=max_q,
    )
    if bwd is None:
        return None
    return fwd, bwd


def windowed_matvec(w: WindowedEll, x: jax.Array, impl: str = "pallas") -> jax.Array:
    if impl == "pallas":
        return windowed_spmv_pallas(w, x)
    return windowed_spmv_xla(w, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedSpaiPrec:
    """SPAI preconditioner over windowed factor planes:
    y = eps x + L (L^T x), optionally Jacobi-scaled with `inv_diag`."""

    w_fwd: WindowedEll
    w_t: WindowedEll
    epsilon: jax.Array
    inv_diag: Optional[jax.Array] = None  # [N, b]
    impl: str = field(metadata=dict(static=True), default="pallas")

    def __call__(self, r: jax.Array) -> jax.Array:
        lt_r = windowed_matvec(self.w_t, r, self.impl)
        eps_r = self.epsilon * r
        if self.inv_diag is not None:
            d = self.inv_diag.reshape(r.shape)
            lt_r = lt_r * d
            eps_r = eps_r * d
        return windowed_matvec(self.w_fwd, lt_r, self.impl) + eps_r


@dataclasses.dataclass(frozen=True)
class _MatvecWrapper:
    """Hashable matvec for pcg's static `matvec` argument.

    With ``carrier64`` the CG vectors stay fp64 while the SpMV runs fp32
    (mixed-precision refinement style): the fp32 product is upcast so the
    residual recurrence accumulates in fp64 — removes the fp32 noise-floor
    iteration inflation near tight tolerances at fp32-SpMV speed.
    """

    impl: str
    carrier64: bool = False

    def __call__(self, w, v):
        if self.carrier64:
            y = windowed_matvec(w, v.astype(jnp.float32), self.impl)
            return y.astype(jnp.float64)
        return windowed_matvec(w, v, self.impl)


def pcg_windowed(
    w_a: WindowedEll,
    b: jax.Array,
    prec: Optional[WindowedSpaiPrec] = None,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    dot_dtype=None,
    impl: str = "pallas",
    mixed: bool = False,
) -> CGResult:
    """PCG where A and the preconditioner are windowed operators.

    Reuses solver.cg.pcg by passing the windowed planes as the "graph" and
    a windowed matvec — the full solve compiles to a single while_loop
    program (dispatch-latency amortized, the honest benchmark object)."""
    from .cg import pcg

    n = w_a.n_nodes
    bvec = b.reshape(n, -1)
    if mixed:
        # fp64 carrier vectors, fp32 SpMV/preconditioner (see _MatvecWrapper)
        bvec = bvec.astype(jnp.float64)
        dot_dtype = jnp.float64
        if prec is not None:
            prec = _Mixed64Prec(prec)
    return pcg(
        w_a,
        bvec,
        prec=prec,
        rtol=rtol,
        max_iter=max_iter,
        dot_dtype=dot_dtype,
        matvec=_MatvecWrapper(impl, carrier64=mixed),
        _shape_override=(n, bvec.shape[1]),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Mixed64Prec:
    """fp64-carrier wrapper around a windowed preconditioner."""

    inner: WindowedSpaiPrec

    def __call__(self, r: jax.Array) -> jax.Array:
        return self.inner(r.astype(jnp.float32)).astype(jnp.float64)
