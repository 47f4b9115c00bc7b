"""gsel (hardware dynamic-gather) operators wired into the PCG solver.

Third-generation production solve path (supersedes `solver/windowed.py`,
which is kept as fallback/reference — see docs/PERF.md for the kernel
study). Builds `GselPlanes` for the system matrix and the learned factor
(forward + transpose — the SPAI apply needs L and L^T), and exposes:

  * `build_gsel_csr`     — scipy CSR -> planes (device) with VMEM-aware
    group sizing; block matrices expand to scalar CSR (one pass, not b^2)
  * `GselSpaiPrec`       — pytree preconditioner  eps x + L (L^T x),
    optionally Jacobi-scaled (the reference's ext_spai / ext_spai_scaled,
    neural_cg/utils/validate.py:89-160)
  * `pcg_gsel`           — PCG whose matvec and preconditioner both run
    the gsel kernels; the full solve is one while_loop dispatch

Unlike the windowed path, gsel covers the synthetic random family too
(any n <= ~16k fits the chunk window without RCM)."""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.gsel import GselPlanes, build_gsel, gsel_spmv_xla
from ..kernels.gsel_pallas import gsel_spmv_pallas
from .cg import CGResult

# scoped-VMEM budget for one grid step's input blocks. The v5e scoped
# limit is 16 MB and the kernel's intermediates (one-hot f32, op, gather
# result, product) plus double buffering cost ~3.3x the input blocks
# (measured), so keep inputs <= 2.5 MB.
_VMEM_STEP_BYTES = int(2.5 * 2**20)


def build_gsel_csr(
    a,
    tile: int = 128,
    max_q: int = 128,
    group: int = 64,
) -> Optional[GselPlanes]:
    """CSR -> gsel planes, shrinking `group` until a grid step's blocks fit
    the scoped-VMEM budget. Returns None if unbandable within max_q."""
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    while group >= 1:
        g = build_gsel(a, tile=tile, group=group, max_q=max_q)
        if g is None:
            # group window exceeded max_q chunks: fewer tiles per group
            # narrow the union window; at group == 1 the pattern is truly
            # unbandable within max_q
            if group == 1:
                return None
            group //= 2
            continue
        gk = g.group * g.k_width
        step_bytes = gk * g.q_chunks + 2 * gk * g.tile * 4 + g.group * g.tile * 4
        if step_bytes <= _VMEM_STEP_BYTES or group == 1:
            return g
        group = max(1, group // 2)
    return None


def gsel_matvec(g: GselPlanes, x: jax.Array, impl: str = "pallas") -> jax.Array:
    if impl == "pallas":
        return gsel_spmv_pallas(g, x)
    return gsel_spmv_xla(g, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GselSpaiPrec:
    """SPAI preconditioner over gsel factor planes:
    y = eps x + L (L^T x), optionally Jacobi-scaled with `inv_diag` [n]:
    y = eps D^-1 x + L (D^-1 (L^T x))."""

    l_fwd: GselPlanes
    l_t: GselPlanes
    epsilon: jax.Array
    inv_diag: Optional[jax.Array] = None
    impl: str = field(metadata=dict(static=True), default="pallas")

    def __call__(self, r: jax.Array) -> jax.Array:
        rf = r.reshape(-1)
        lt_r = gsel_matvec(self.l_t, rf, self.impl)
        eps_r = self.epsilon * rf
        if self.inv_diag is not None:
            lt_r = lt_r * self.inv_diag
            eps_r = eps_r * self.inv_diag
        y = gsel_matvec(self.l_fwd, lt_r, self.impl) + eps_r
        return y.reshape(r.shape)


@dataclasses.dataclass(frozen=True)
class _GselMatvec:
    """Hashable matvec for pcg's static `matvec` argument. ``carrier64``
    keeps CG vectors fp64 while the SpMV runs f32 (mixed-precision
    refinement; see solver/windowed.py docstring)."""

    impl: str
    carrier64: bool = False

    def __call__(self, g, v):
        if self.carrier64:
            y = gsel_matvec(g, v.astype(jnp.float32).reshape(-1), self.impl)
            return y.astype(jnp.float64).reshape(v.shape)
        return gsel_matvec(g, v.reshape(-1), self.impl).reshape(v.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Mixed64Prec:
    inner: GselSpaiPrec

    def __call__(self, r: jax.Array) -> jax.Array:
        return self.inner(r.astype(jnp.float32)).astype(jnp.float64)


def pcg_gsel(
    g_a: GselPlanes,
    b: jax.Array,
    prec: Optional[GselSpaiPrec] = None,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    dot_dtype=None,
    impl: str = "pallas",
    mixed: bool = False,
) -> CGResult:
    """PCG where A and the preconditioner are gsel operators; the whole
    solve compiles to a single while_loop program."""
    from .cg import pcg

    n = g_a.n_rows
    bvec = b.reshape(n, -1)
    if isinstance(prec, GselSpaiPrec) and prec.impl != impl:
        prec = dataclasses.replace(prec, impl=impl)
    if mixed:
        bvec = bvec.astype(jnp.float64)
        dot_dtype = jnp.float64
        if prec is not None:
            prec = _Mixed64Prec(prec)
    return pcg(
        g_a,
        bvec,
        prec=prec,
        rtol=rtol,
        max_iter=max_iter,
        dot_dtype=dot_dtype,
        matvec=_GselMatvec(impl, carrier64=mixed),
        _shape_override=(n, bvec.shape[1]),
    )
