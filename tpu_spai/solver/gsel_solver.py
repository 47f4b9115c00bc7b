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

from ..kernels.gsel import (
    GselPlanes,
    build_gsel,
    gsel_spmv_ds_xla,
    gsel_spmv_xla,
)
from ..kernels.gsel_pallas import gsel_spmv_ds_pallas, gsel_spmv_pallas
from .cg import CGResult

# scoped-VMEM budget for one grid step's input blocks. The v5e scoped
# limit is 16 MB and the kernel's intermediates (one-hot f32, op, gather
# result, product) plus double buffering cost ~3.3x the input blocks
# (measured), so keep inputs <= 2.5 MB.
_VMEM_STEP_BYTES = int(2.5 * 2**20)

# Group/window cost model, refitted to the round-2 v5e in-process sweep
# (docs/PERF.md round-2a; 16 points across res 24/48 x G 8-64 x w 1-2,
# mean error ~8%):
#   t [us] ~= STEP*steps + MAC*(Mslots*w*Qg) + BYTE*MB + RAMP*MB/steps
# STEP: per-grid-step pipeline overhead (the dominant term at G<=16 —
# empirically ~0.4 us/step, measured by the G sweep's slope).
# MAC: the one-hot chunk-select MXU work (per slot row x window chunks).
# BYTE: the HBM plane stream. RAMP: the un-overlapped first/last step of
# the pipeline — penalizes very small step counts (measured non-monotone
# G at res=24). Bigger groups than round-1's G=16 win at every size;
# window=2 wins at large n where plane bytes dominate (G48w2 at n=117k:
# 24.9 vs the old default's 40.3 us/SpMV).
_STEP_US = 0.4255
_MAC_US_PER_MSLOT_Q = 0.04521
_BYTE_US_PER_MB = 0.4827
_RAMP_US_PER_MB = 2.856


def _step_bytes(g: GselPlanes, lane_groups: int) -> int:
    # input blocks per grid step: onehot i8 [GK', W*NG*Qg], lidx i8
    # [GK', T], vals f32 [GK', T], out f32 [G, T]
    gk = g.group * g.k_width
    return (
        gk * g.q_chunks * lane_groups * g.window
        + gk * g.tile
        + gk * g.tile * 4
        + g.group * g.tile * 4
    )


def build_gsel_csr(
    a,
    tile: int = 128,
    max_q: int = 128,
    group: Optional[int] = None,
    double_single: bool = False,
    lane_groups: int = 1,
    dtype=np.float32,
    window: int = 1,
) -> Optional[GselPlanes]:
    """CSR -> gsel planes. With `group=None` (production default) the tile
    group G is chosen by the fitted cost model above among VMEM-feasible
    candidates; pass an explicit `group` to pin it (shrunk only if it
    violates the VMEM budget). Returns None if unbandable within max_q.

    lane_groups=1 is the SOLVER default: in-process A/B (docs/PERF.md
    round-1g) shows the NG-times-wider one-hot outweighs the K' slot
    shrink for bare SpMV (heat n=117k: 132 vs 291 us/CG-iteration;
    synthetic n=12k: 121 vs 537). ng=8 still pays off for the slotted GNN
    forward, whose plane traffic scales with K' times the feature count
    (gnn/slotted.py keeps lane_groups=8)."""
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    budget = _VMEM_STEP_BYTES // (2 if double_single else 1)
    candidates = (64, 48, 32, 16, 8, 4, 2, 1) if group is None else None
    # below G=8 the [G*K', NG*Qg] one-hot matmul is too small for the MXU;
    # only fall through when larger groups are VMEM/window-infeasible
    if group is not None:
        while group >= 1:
            g = build_gsel(a, tile=tile, group=group, max_q=max_q,
                           double_single=double_single,
                           lane_groups=lane_groups, dtype=dtype,
                           window=window)
            if g is None:
                # group window exceeded max_q chunks: fewer tiles per group
                # narrow the union window; at group == 1 the pattern is
                # truly unbandable within max_q
                if group == 1:
                    return None
                group //= 2
                continue
            if _step_bytes(g, lane_groups) <= budget or group == 1:
                return g
            group = max(1, group // 2)
        return None

    def model_cost(g):
        mb = (
            g.onehot.size + g.lidx.size + g.vals.size * 4
            + (g.vals_lo.size * 4 if g.vals_lo is not None else 0)
            + g.n_steps * g.group * g.tile * 4
        ) / 1e6
        macs = g.slots / 1e6 * g.window * g.q_chunks
        return (
            _STEP_US * g.n_steps
            + _MAC_US_PER_MSLOT_Q * macs
            + _BYTE_US_PER_MB * mb
            + _RAMP_US_PER_MB * mb / g.n_steps
        )

    best, best_cost = None, None
    windows = (window,)
    if window == 1 and lane_groups == 1 and a.nnz > 3e5:
        # w=2 halves the slot grid (K' -> ~max degree) at 2x MACs/slot —
        # wins where plane bytes dominate (round-2a: G48w2 24.9 vs G16w1
        # 40.3 us at n=117k); small matrices keep w=1 (second gather
        # costs more than the byte cut)
        windows = (1, 2)
    for w_cand in windows:
        for cand in candidates:
            if cand < 8 and best is not None:
                break  # sub-8 groups starve the MXU (measured regression)
            g = build_gsel(a, tile=tile, group=cand, max_q=max_q,
                           double_single=double_single,
                           lane_groups=lane_groups, dtype=dtype,
                           window=w_cand)
            if g is None or _step_bytes(g, lane_groups) > budget:
                continue
            cost = model_cost(g)
            if best_cost is None or cost < best_cost:
                best, best_cost = g, cost
    return best


def gsel_matvec(g: GselPlanes, x: jax.Array, impl: str = "pallas") -> jax.Array:
    if impl == "pallas":
        return gsel_spmv_pallas(g, x)
    return gsel_spmv_xla(g, x)


def gsel_matvec_ds(g: GselPlanes, x64: jax.Array, impl: str = "pallas"):
    """fp64-grade matvec: split the f64 carrier into an f32 (hi, lo) pair,
    run the double-single kernel, recombine in f64. ~2^-48 relative error
    at ~3x f32 kernel cost (real emulated f64 costs 10-30x on TPU)."""
    xf = x64.reshape(-1)
    x_hi = xf.astype(jnp.float32)
    x_lo = (xf - x_hi.astype(jnp.float64)).astype(jnp.float32)
    fn = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla
    y_hi, y_lo = fn(g, x_hi, x_lo)
    return y_hi.astype(jnp.float64) + y_lo.astype(jnp.float64)


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
    """Hashable matvec for pcg's static `matvec` argument.

    mode 'f32': storage-precision SpMV. 'carrier64': f64 CG vectors, f32
    SpMV (mixed-precision refinement). 'ds': f64 CG vectors, double-single
    SpMV — full fp64-grade solves for the rtol<=1e-8 sweeps at ~3x f32
    kernel cost (the reference runs these in CUDA fp64, validate.py:27)."""

    impl: str
    mode: str = "f32"

    def __call__(self, g, v):
        if self.mode == "ds":
            return gsel_matvec_ds(g, v.astype(jnp.float64), self.impl).reshape(
                v.shape
            )
        if self.mode == "carrier64":
            y = gsel_matvec(g, v.astype(jnp.float32).reshape(-1), self.impl)
            return y.astype(jnp.float64).reshape(v.shape)
        return gsel_matvec(g, v.reshape(-1), self.impl).reshape(v.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Mixed64Prec:
    inner: GselSpaiPrec

    def __call__(self, r: jax.Array) -> jax.Array:
        return self.inner(r.astype(jnp.float32)).astype(jnp.float64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GselSpaiPrecDS:
    """fp64-grade SPAI apply over double-single factor planes."""

    l_fwd: GselPlanes
    l_t: GselPlanes
    epsilon: jax.Array
    inv_diag: Optional[jax.Array] = None
    impl: str = field(metadata=dict(static=True), default="pallas")

    def __call__(self, r: jax.Array) -> jax.Array:
        rf = r.astype(jnp.float64).reshape(-1)
        lt_r = gsel_matvec_ds(self.l_t, rf, self.impl)
        eps_r = self.epsilon.astype(jnp.float64) * rf
        if self.inv_diag is not None:
            d = self.inv_diag.astype(jnp.float64)
            lt_r = lt_r * d
            eps_r = eps_r * d
        y = gsel_matvec_ds(self.l_fwd, lt_r, self.impl) + eps_r
        return y.reshape(r.shape)


def pcg_gsel(
    g_a: GselPlanes,
    b: jax.Array,
    prec: Optional[GselSpaiPrec] = None,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    dot_dtype=None,
    impl: str = "pallas",
    mixed: bool = False,
    precision: str = "f32",
) -> CGResult:
    """PCG where A and the preconditioner are gsel operators; the whole
    solve compiles to a single while_loop program.

    precision='ds' runs the fp64-grade double-single path (f64 carrier
    vectors + TwoProd/Kahan SpMV); requires double_single planes."""
    from .cg import pcg

    n = g_a.n_rows
    bvec = b.reshape(n, -1)
    if isinstance(prec, (GselSpaiPrec, GselSpaiPrecDS)) and prec.impl != impl:
        prec = dataclasses.replace(prec, impl=impl)
    mode = "f32"
    if precision == "ds":
        assert g_a.vals_lo is not None, "build with double_single=True"
        bvec = bvec.astype(jnp.float64)
        dot_dtype = jnp.float64
        mode = "ds"
        if isinstance(prec, GselSpaiPrec):
            prec = _Mixed64Prec(prec)
    elif mixed:
        bvec = bvec.astype(jnp.float64)
        dot_dtype = jnp.float64
        mode = "carrier64"
        if prec is not None:
            prec = _Mixed64Prec(prec)
    return pcg(
        g_a,
        bvec,
        prec=prec,
        rtol=rtol,
        max_iter=max_iter,
        dot_dtype=dot_dtype,
        matvec=_GselMatvec(impl, mode=mode),
        _shape_override=(n, bvec.shape[1]),
    )


def gsel_matvec_multi(g: GselPlanes, xs: jax.Array, impl: str = "pallas"):
    """Multi-RHS matvec: xs [k, n_cols] -> [k, n_rows], one plane pass."""
    from ..kernels.gsel import gsel_spmv_multi_xla
    from ..kernels.gsel_pallas import gsel_spmv_multi_pallas

    if impl == "pallas":
        return gsel_spmv_multi_pallas(g, xs)
    return gsel_spmv_multi_xla(g, xs)


def _dot_multi(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-column chunk64 dot: [k, n] x [k, n] -> [k] f64. Same scheme as
    cg._dot('chunk64') applied row-wise — f32 products, f32 sums within
    128-lane chunks, f64 combine of the n/128 partials — so each column's
    scalars match the single-RHS solver bit-for-bit."""
    p = a.astype(jnp.float32) * b.astype(jnp.float32)
    pad = (-p.shape[1]) % 128
    if pad:
        p = jnp.pad(p, ((0, 0), (0, pad)))
    partial = jnp.sum(p.reshape(p.shape[0], -1, 128), axis=2)
    return jnp.sum(partial.astype(jnp.float64), axis=1)


def _papply_multi(prec, r: jax.Array, impl: str) -> jax.Array:
    """SPAI apply on [k, n] residual blocks (prec=None -> identity)."""
    if prec is None:
        return r
    lt = gsel_matvec_multi(prec.l_t, r, impl)
    eps_r = jnp.float32(prec.epsilon) * r
    if prec.inv_diag is not None:
        d = prec.inv_diag.astype(jnp.float32)[None, :]
        lt = lt * d
        eps_r = eps_r * d
    return gsel_matvec_multi(prec.l_fwd, lt, impl) + eps_r


def _multi_run(g_a, prec, b_rows, rtol_s, max_it, impl):
    """Jittable k-column PCG (module-level so traces cache across calls).

    One while_loop advances ALL columns; per-column (alpha, beta) keep the
    Krylov spaces independent, converged columns freeze via masks, and the
    loop exits when every column is converged (or max_it). Per-column
    scalar sequences are identical to k separate pcg_gsel solves, so the
    per-column iteration counts match the single-RHS path exactly."""
    k = b_rows.shape[0]
    x = jnp.zeros_like(b_rows)
    r = b_rows
    s = _papply_multi(prec, r, impl)
    delta = _dot_multi(r, s)  # [k]
    bnorm2 = _dot_multi(b_rows, b_rows)
    tiny = jnp.finfo(jnp.float64).tiny
    tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, tiny)
    rnorm2 = bnorm2
    iters = jnp.zeros((k,), jnp.int32)

    def cond(st):
        rn2, it = st[5], st[6]
        return jnp.logical_and(jnp.any(rn2 > tol2), it < max_it)

    def body(st):
        x, r, d, delta, iters, rnorm2, it = st
        active = rnorm2 > tol2  # [k]
        q = gsel_matvec_multi(g_a, d, impl)
        dq = _dot_multi(d, q)
        # alpha=0 freezes a converged column's x and r; its d keeps
        # evolving as d <- s + d (beta = 1 since r is frozen), which only
        # grows linearly — no [k, n]-sized masks needed in the hot body
        alpha = jnp.where(active, delta / jnp.where(dq != 0, dq, 1.0), 0.0)
        a32 = alpha.astype(jnp.float32)[:, None]
        x = x + a32 * d
        r = r - a32 * q
        s = _papply_multi(prec, r, impl)
        delta_new = _dot_multi(r, s)
        beta = (delta_new / jnp.where(delta != 0, delta, 1.0)).astype(
            jnp.float32
        )
        d = s + beta[:, None] * d
        rnorm2 = _dot_multi(r, r)
        iters = iters + active.astype(jnp.int32)
        return x, r, d, delta_new, iters, rnorm2, it + 1

    st = (x, r, s, delta, iters, rnorm2, jnp.int32(0))
    x, r, _, _, iters, rnorm2, _ = jax.lax.while_loop(cond, body, st)
    relres = jnp.sqrt(rnorm2 / jnp.maximum(bnorm2, tiny))
    return x, iters, relres, rnorm2 <= tol2


_multi_run_jit = jax.jit(_multi_run, static_argnames=("impl",))


def pcg_gsel_multi(
    g_a: GselPlanes,
    b: jax.Array,  # [n, k] rhs columns (FolderDataset layout) or [n]
    prec: Optional[GselSpaiPrec] = None,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    impl: str = "pallas",
) -> CGResult:
    """Batched multi-RHS PCG: solves A x_j = b_j for all k columns in one
    while_loop dispatch whose SpMVs are the multi-RHS gsel kernels — the
    matrix/factor planes (the HBM bound) are read ONCE per iteration and
    amortized over the k columns. The reference solves its multi-RHS
    samples one column at a time (neural_cg/data.py:392-397 expands rhs
    columns into separate samples; one pymathprim CG each,
    validate.py:54-121) — this path is a TPU-native improvement, not a
    translation. Per-column iteration counts match `pcg_gsel` exactly
    (same chunk64 scalar sequences); converged columns freeze while the
    rest run on.

    Returns CGResult with x [n, k], iters [k], relres [k], converged [k].
    """
    if isinstance(prec, (GselSpaiPrec, GselSpaiPrecDS)) and prec.impl != impl:
        prec = dataclasses.replace(prec, impl=impl)
    n = g_a.n_rows
    b_rows = b.reshape(n, -1).T.astype(jnp.float32)  # [k, n]
    x, iters, relres, conv = _multi_run_jit(
        g_a, prec, b_rows, jnp.float64(rtol), jnp.int32(max_iter), impl
    )
    return CGResult(
        x=x.T.astype(b.dtype).reshape(n, -1), iters=iters, relres=relres,
        converged=conv,
    )


def _fused_run(g_a, l_fwd, l_t, eps, inv_diag, b32, rtol_s, max_it,
               interpret=False):
    """Fused SPAI-PCG iteration: the three scalar reductions and the
    eps-axpy of each iteration ride the SpMV Pallas kernels
    (gsel_spmv_dots_pallas) instead of separate XLA passes, and ||r||^2
    advances by the exact CG recurrence
        <r',r'> = <r,r> - 2a<r,q> + a^2<q,q>
    from kernel-accumulated partials. ~30% per-iteration win at n=15.6k
    (docs/PERF.md round-1p). f32 vectors, f64 scalars."""
    from ..kernels.gsel_pallas import gsel_spmv_dots_pallas, gsel_spmv_pallas

    n = g_a.n_rows
    b = b32.reshape(-1).astype(jnp.float32)

    def papply_delta(r):
        # s = L (D (L^T r)) + eps D r ; delta = <r, s>
        u = gsel_spmv_pallas(l_t, r, interpret=interpret)
        if inv_diag is not None:
            u = u * inv_diag
            rf = r * inv_diag
            s, dots = gsel_spmv_dots_pallas(
                l_fwd, u, (r, rf), has_fold=True, fold_coef=eps,
                interpret=interpret,
            )
            return s, dots[0]
        s, dots = gsel_spmv_dots_pallas(
            l_fwd, u, (r,), has_fold=True, fold_coef=eps,
            interpret=interpret,
        )
        return s, dots[0]

    from .cg import _dot

    x = jnp.zeros_like(b)
    r = b
    s, delta = papply_delta(r)
    bnorm2 = _dot(b, b, "chunk64")
    rnorm2 = bnorm2
    tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)

    def cond(st):
        return jnp.logical_and(st[4] > tol2, st[5] < max_it)

    def body(st):
        x, r, d, delta, rnorm2, it = st
        q, k1 = gsel_spmv_dots_pallas(
            g_a, d, (d, r), self_dot=True, interpret=interpret
        )
        dq, rq, qq = k1[0], k1[1], k1[2]
        alpha32 = (delta / dq).astype(jnp.float32)
        a64 = alpha32.astype(jnp.float64)
        x = x + alpha32 * d
        r = r - alpha32 * q
        rnorm2 = rnorm2 - 2.0 * a64 * rq + a64 * a64 * qq
        # the scalar recurrence drifts from the stored f32 r over long
        # solves; re-measure <r, r> directly at any candidate convergence
        # (the loop can then only exit on a real norm — same measured
        # quantity as pcg_gsel) and periodically as drift control
        rnorm2 = jax.lax.cond(
            (rnorm2 <= tol2) | ((it + 1) % 16 == 0),
            lambda rr: _dot(r, r, "chunk64"),
            lambda rr: rr,
            rnorm2,
        )
        s, delta_new = papply_delta(r)
        beta = (delta_new / delta).astype(jnp.float32)
        d = s + beta * d
        return x, r, d, delta_new, rnorm2, it + 1

    st = (x, r, s, delta, rnorm2, jnp.int32(0))
    x, r, _, _, rnorm2, iters = jax.lax.while_loop(cond, body, st)
    relres = jnp.sqrt(
        rnorm2 / jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)
    )
    return x[:n], iters, relres, rnorm2 <= tol2


_fused_run_jit = jax.jit(_fused_run, static_argnames=("interpret",))


def pcg_gsel_fused(
    g_a: GselPlanes,
    b: jax.Array,
    prec: GselSpaiPrec,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    interpret: bool = False,
) -> CGResult:
    """SPAI-preconditioned CG with fused-kernel scalar reductions (see
    _fused_run). Production fast path for the f32 + chunk64-grade
    configuration; semantics match `pcg_gsel(..., dot_dtype="chunk64")`
    up to rounding (iteration counts typically within +-1)."""
    b32 = b.reshape(-1)
    inv_d = None if prec.inv_diag is None else jnp.asarray(
        prec.inv_diag, jnp.float32
    )
    x, iters, relres, conv = _fused_run_jit(
        g_a, prec.l_fwd, prec.l_t, jnp.float32(prec.epsilon), inv_d,
        b32, jnp.float64(rtol), jnp.int32(max_iter), interpret=interpret,
    )
    return CGResult(x=x.astype(b.dtype), iters=iters, relres=relres,
                    converged=conv)


def _ds_papply(prec, r, mv):
    """Shared SPAI apply on DS pair state (prec=None -> identity)."""
    from ..kernels.ds import DS, ds_add, ds_from_f64, ds_scale

    if prec is None:
        return r
    lt = mv(prec.l_t, r)
    eps = ds_from_f64(jnp.asarray(prec.epsilon, jnp.float64))
    eps_r = ds_scale(eps, r)
    if prec.inv_diag is not None:
        dg = prec.inv_diag.astype(jnp.float32)
        lt = DS(lt.hi * dg, lt.lo * dg)  # dg is f32-exact
        eps_r = DS(eps_r.hi * dg, eps_r.lo * dg)
    return ds_add(mv(prec.l_fwd, lt), eps_r)


def _ds_run(g_a, prec, b64, rtol_s, max_it, impl):
    """Jittable pair-state PCG (module-level so jit traces are cached
    across calls — a per-call closure retraced the whole while_loop every
    solve, ~1.3 s of host time per dispatch)."""
    from ..kernels.ds import DS, ds_add, ds_axpy, ds_dot, ds_from_f64, ds_scale, ds_sub
    from ..kernels.gsel import gsel_spmv_ds_xla
    from ..kernels.gsel_pallas import gsel_spmv_ds_pallas

    spmv = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla

    def mv(gp, v):
        yh, yl = spmv(gp, v.hi, v.lo)
        return DS(yh, yl)

    bds = ds_from_f64(b64)
    n = b64.shape[0]
    x = DS(jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    r = bds
    s = _ds_papply(prec, r, mv)
    delta = ds_dot(r, s)
    bnorm2 = ds_dot(bds, bds)
    tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)
    rnorm2 = ds_dot(r, r)

    def cond(st):
        *_, rn2, it = st
        return jnp.logical_and(rn2 > tol2, it < max_it)

    def body(st):
        x, r, d, delta, _, it = st
        q = mv(g_a, d)
        dq = ds_dot(d, q)
        alpha = ds_from_f64(delta / dq)
        nalpha = DS(-alpha.hi, -alpha.lo)
        x = ds_axpy(alpha, d, x)
        r = ds_axpy(nalpha, q, r)
        s = _ds_papply(prec, r, mv)
        delta_new = ds_dot(r, s)
        beta = ds_from_f64(delta_new / delta)
        d = ds_add(s, ds_scale(beta, d))
        rn2 = ds_dot(r, r)
        return x, r, d, delta_new, rn2, it + 1

    st = (x, r, s, delta, rnorm2, jnp.int32(0))
    x, r, _, _, rn2, iters = jax.lax.while_loop(cond, body, st)
    # honest exit report (round 4): the UNANCHORED ds recurrence can
    # drift from the true residual on systems with ||b|| << ||A|| ||x*||
    # (heat: the Laplacian annihilates the mask vector, so reaching
    # rel 1e-6 sits at ~1e-14 * ||A|| ||x|| absolute — at the edge of
    # the 2^-48 pair state). One extra ds SpMV re-measures the TRUE
    # residual so relres/converged cannot over-claim; the production
    # honest tier remains pcg_gsel_rr (re-anchored DURING the solve).
    r_true = ds_sub(bds, mv(g_a, x))
    rn2_t = ds_dot(r_true, r_true)
    relres = jnp.sqrt(
        rn2_t / jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)
    )
    x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
    return x64, iters, relres, rn2_t <= tol2


_ds_run_jit = jax.jit(_ds_run, static_argnames=("impl",))


def pcg_gsel_ds(
    g_a: GselPlanes,
    b: jax.Array,  # [n] f64 (or any dtype, upcast)
    prec=None,  # GselSpaiPrecDS or None
    rtol: float = 1e-10,
    max_iter: int = 1000,
    impl: str = "pallas",
) -> CGResult:
    """fp64-grade PCG with double-single PAIR state: vectors are (hi, lo)
    f32 pairs, updates use error-free-transform arithmetic (kernels/ds.py),
    the SpMV is the ds gsel kernel, and dots combine f32 chunk partials in
    f64. Everything per iteration runs native f32 VPU/MXU ops — no
    emulated-f64 vector arithmetic (10-30x slower on TPU). Replaces the
    reference's fp64 CUDA solves (validate.py:27) for rtol <= 1e-8 sweeps.
    """
    if isinstance(prec, (GselSpaiPrec, GselSpaiPrecDS)) and prec.impl != impl:
        prec = dataclasses.replace(prec, impl=impl)
    b64 = b.reshape(-1).astype(jnp.float64)
    x64, iters, relres, conv = _ds_run_jit(
        g_a, prec, b64, jnp.float64(rtol), jnp.int32(max_iter), impl
    )
    return CGResult(x=x64, iters=iters, relres=relres, converged=conv)


def _rr_run(g_a, prec, b64, rtol_s, max_it, impl, k_rep, a_ds=False,
            prec_ds=False):
    """Jittable residual-replacement PCG (module-level: see _ds_run).

    a_ds=True runs the per-iteration A-matvec in double-single while the
    preconditioner stays f32 — the Krylov direction quality is set by the
    accuracy of A*d, not of M (M-error only perturbs the preconditioner),
    so this restores near-fp64 iteration counts on ill-conditioned
    operators at ~1.6x the f32 iteration cost (the 'rds' tier; VERDICT
    round-2 item 6)."""
    from ..kernels.ds import DS, ds_add, ds_axpy, ds_dot, ds_from_f64, ds_scale, ds_sub
    from ..kernels.gsel import gsel_spmv_ds_xla
    from ..kernels.gsel_pallas import gsel_spmv_ds_pallas

    spmv_ds = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla

    def mv_fast(gp, v):
        yh = gsel_matvec(gp, v.hi, impl)
        return DS(yh, jnp.zeros_like(yh))

    def mv_ds(gp, v):
        yh, yl = spmv_ds(gp, v.hi, v.lo)
        return DS(yh, yl)

    def papply(r):
        if prec is None:
            return r
        if not hasattr(prec, "l_t"):
            # generic pytree preconditioner (e.g. jacobi): f32 apply on the
            # hi component; re-anchoring keeps the stopping honest
            return DS(prec(r.hi).astype(jnp.float32), jnp.zeros_like(r.hi))
        if prec_ds:
            # full double-single SPAI apply (needs ds factor planes)
            lt = mv_ds(prec.l_t, r)
            eps = ds_from_f64(jnp.asarray(prec.epsilon, jnp.float64))
            eps_r = ds_scale(eps, r)
            if prec.inv_diag is not None:
                dg = prec.inv_diag.astype(jnp.float32)
                lt = DS(lt.hi * dg, lt.lo * dg)
                eps_r = DS(eps_r.hi * dg, eps_r.lo * dg)
            return ds_add(mv_ds(prec.l_fwd, lt), eps_r)
        lt = mv_fast(prec.l_t, r)
        eps32 = jnp.float32(prec.epsilon)
        if prec.inv_diag is not None:
            dg = prec.inv_diag.astype(jnp.float32)
            return DS(
                gsel_matvec(prec.l_fwd, lt.hi * dg, impl) + eps32 * r.hi * dg,
                jnp.zeros_like(r.hi),
            )
        return DS(
            gsel_matvec(prec.l_fwd, lt.hi, impl) + eps32 * r.hi,
            jnp.zeros_like(r.hi),
        )

    bds = ds_from_f64(b64)
    x = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
    r = bds
    s = papply(r)
    delta = ds_dot(r, s)
    bnorm2 = ds_dot(bds, bds)
    tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)
    rnorm2 = ds_dot(r, r)

    def cond(st):
        rn2, it = st[4], st[5]
        return jnp.logical_and(rn2 > tol2, it < max_it)

    def body(st):
        x, r, d, delta, _, it, rn2_anchor = st
        q = mv_ds(g_a, d) if a_ds else mv_fast(g_a, d)
        dq = ds_dot(d, q)
        alpha = ds_from_f64(delta / dq)
        nalpha = DS(-alpha.hi, -alpha.lo)
        x = ds_axpy(alpha, d, x)
        r = ds_axpy(nalpha, q, r)
        # re-anchor (van der Vorst-Ye): whenever the recurrence residual
        # drops well below the last anchored one (the drift accumulated
        # since that anchor would otherwise swamp it), periodically as a
        # stagnation fallback, and at any candidate convergence — the
        # exit test below then sees the TRUE residual
        rn2_rec = ds_dot(r, r)
        do_rep = (
            (rn2_rec <= 0.0625 * rn2_anchor)
            | ((it + 1) % k_rep == 0)
            | (rn2_rec <= tol2)
        )
        r = jax.lax.cond(
            do_rep,
            lambda xr: ds_sub(bds, mv_ds(g_a, xr[0])),
            lambda xr: xr[1],
            (x, r),
        )
        s = papply(r)
        delta_new = ds_dot(r, s)
        beta = ds_from_f64(delta_new / delta)
        d = ds_add(s, ds_scale(beta, d))
        rn2 = ds_dot(r, r)
        rn2_anchor = jnp.where(do_rep, rn2, rn2_anchor)
        return x, r, d, delta_new, rn2, it + 1, rn2_anchor

    st = (x, r, s, delta, rnorm2, jnp.int32(0), rnorm2)
    x, r, _, _, rn2, iters, _ = jax.lax.while_loop(cond, body, st)
    relres = jnp.sqrt(rn2 / jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny))
    x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
    return x64, iters, relres, rn2 <= tol2


_rr_run_jit = jax.jit(
    _rr_run, static_argnames=("impl", "k_rep", "a_ds", "prec_ds")
)


def _rr_run_grouped(g_a, prec, b64, rtol_s, max_it, impl, k_inner,
                    a_ds=False, prec_ds=False):
    """Group-anchored residual-replacement PCG (round-3 default).

    The per-iteration `lax.cond` re-anchor of _rr_run costs ~21 us/iter
    on-chip EVEN WHEN NOT TAKEN (the branch's ds SpMV is scheduled every
    iteration inside the while_loop — output/r3_prec_profile.json
    abl_no_anchor_cond). Restructure: an inner while_loop runs up to
    ``k_inner`` CHEAP iterations (recurrence residual only, no branch),
    then the outer loop re-anchors r = b - A x with the double-single
    SpMV and tests the TRUE residual. The inner loop also exits early
    when the recurrence residual drops 16x below the anchor (van der
    Vorst-Ye drift bound) or crosses tol, so anchors still happen at
    the accuracy-critical moments; the loop can only exit on a truly
    converged residual, as before."""
    from ..kernels.ds import (
        DS,
        ds_add,
        ds_axpy,
        ds_dot,
        ds_dot_fast,
        ds_from_f64,
        ds_scale,
        ds_sub,
    )
    from ..kernels.gsel import gsel_spmv_ds_xla
    from ..kernels.gsel_pallas import gsel_spmv_ds_pallas

    spmv_ds = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla

    def mv_fast(gp, v):
        yh = gsel_matvec(gp, v.hi, impl)
        return DS(yh, jnp.zeros_like(yh))

    def mv_ds(gp, v):
        yh, yl = spmv_ds(gp, v.hi, v.lo)
        return DS(yh, yl)

    def papply(r):
        if prec is None:
            return r
        if not hasattr(prec, "l_t"):
            return DS(prec(r.hi).astype(jnp.float32), jnp.zeros_like(r.hi))
        if prec_ds:
            lt = mv_ds(prec.l_t, r)
            eps = ds_from_f64(jnp.asarray(prec.epsilon, jnp.float64))
            eps_r = ds_scale(eps, r)
            if prec.inv_diag is not None:
                dg = prec.inv_diag.astype(jnp.float32)
                lt = DS(lt.hi * dg, lt.lo * dg)
                eps_r = DS(eps_r.hi * dg, eps_r.lo * dg)
            return ds_add(mv_ds(prec.l_fwd, lt), eps_r)
        lt = mv_fast(prec.l_t, r)
        eps32 = jnp.float32(prec.epsilon)
        if prec.inv_diag is not None:
            dg = prec.inv_diag.astype(jnp.float32)
            return DS(
                gsel_matvec(prec.l_fwd, lt.hi * dg, impl) + eps32 * r.hi * dg,
                jnp.zeros_like(r.hi),
            )
        return DS(
            gsel_matvec(prec.l_fwd, lt.hi, impl) + eps32 * r.hi,
            jnp.zeros_like(r.hi),
        )

    bds = ds_from_f64(b64)
    bnorm2 = ds_dot(bds, bds)
    tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny)

    x0 = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
    r0 = bds
    d0 = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
    rn0 = ds_dot(r0, r0)

    # "rotated" PCG body: the (s, delta, beta, d) tail of the classical
    # iteration runs at the START of the next one (d0 = 0, delta0 = 1
    # reproduces d1 = s0 exactly). The group boundary then falls between
    # the (x, r) update and the next s = M r — precisely where the
    # percycle variant slots its residual replacement, so anchoring
    # changes no other state and conjugacy chains through unchanged.
    # INNER dots stay on the COMPENSATED ds_dot: the chunk64 tier
    # (ds_dot_fast) was tried and REVERTED — on the pallas path it
    # degrades the Krylov quality to 143-147 iterations vs the
    # compensated tier's host-parity 98-100 on every flagship sample
    # (output/r4_dots_ab.json; the CPU/xla path is insensitive because
    # its own matvec rounding already dominates). f32-grade alpha/beta
    # are NOT safe at this conditioning even though stopping honesty
    # lives in the anchored exit.
    def inner_body(st):
        x, r, d, delta, rn2, it = st
        s = papply(r)
        delta_new = ds_dot(r, s)
        beta = ds_from_f64(delta_new / delta)
        d = ds_add(s, ds_scale(beta, d))
        q = mv_ds(g_a, d) if a_ds else mv_fast(g_a, d)
        dq = ds_dot(d, q)
        alpha = ds_from_f64(delta_new / dq)
        nalpha = DS(-alpha.hi, -alpha.lo)
        x = ds_axpy(alpha, d, x)
        r = ds_axpy(nalpha, q, r)
        rn2 = ds_dot(r, r)
        return x, r, d, delta_new, rn2, it + 1

    def outer_body(st):
        x, r, d, delta, rn2_true, it, _conv, n_reb = st
        anchor = rn2_true
        it0 = it

        def inner_cond(s2):
            rn2, j = s2[4], s2[5]
            return (
                (j < it0 + k_inner)
                & (j < max_it)
                & (rn2 > 0.0625 * anchor)
                & (rn2 > tol2)
            )

        x, r, d, delta, _rn2_rec, it = jax.lax.while_loop(
            inner_cond, inner_body, (x, r, d, delta, rn2_true, it)
        )
        # re-anchor: TRUE residual via the double-single SpMV (the next
        # group's first body recomputes s/delta/d from this replaced r)
        r = ds_sub(bds, mv_ds(g_a, x))
        rn2_true = ds_dot(r, r)
        # rebound detection (VERDICT r4 item 4): an unconverged TRUE
        # residual INCREASING across an anchor group is the bad-branch
        # signature of the near-floor mask-rhs pathology (109<->149
        # bistability, docs/PERF.md round-4a) — anchor-replacement
        # noise re-perturbing the Krylov chain. Counted here; the
        # caller escalates the solve to the ds-A tier when it fires.
        n_reb = n_reb + jnp.where(
            (rn2_true > anchor) & (rn2_true > tol2), 1, 0
        ).astype(jnp.int32)
        return x, r, d, delta, rn2_true, it, rn2_true <= tol2, n_reb

    def outer_cond(st):
        rn2_true, it, conv = st[4], st[5], st[6]
        return jnp.logical_and(~conv, it < max_it)

    st = (x0, r0, d0, jnp.float64(1.0), rn0, jnp.int32(0), rn0 <= tol2,
          jnp.int32(0))
    x, r, _, _, rn2, iters, conv, n_reb = jax.lax.while_loop(
        outer_cond, outer_body, st
    )
    relres = jnp.sqrt(rn2 / jnp.maximum(bnorm2, jnp.finfo(jnp.float64).tiny))
    x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
    return x64, iters, relres, conv, n_reb


# escalate the f32-A rr tier to ds-A when >= this many anchor groups
# showed a TRUE-residual increase (bad-branch signature, docs/PERF.md
# round-4a). Live on-chip calibration (round-5b, output/r5_queue8.log +
# r5_w48_fwd_ab): a HEALTHY pallas flagship solve (iters 100 = host
# oracle, zero factor drift) shows 2 benign rebounds, so threshold 1
# escalated a clean solve and paid a spurious double-solve (+1.6 ms
# device + one extra compile). Threshold 3 keeps the flagship clean and
# still catches the n≈50k excursion case (6 rebounds; the 615-iteration
# excursion band of rounds 3-4). The CPU/xla path's own matvec rounding
# produces 1-3 benign rebounds on healthy solves, so callers on that
# path should treat the counter as diagnostic only.
REBOUND_ESCALATE_THRESHOLD = 3


def prec_with_ds_planes(prec: GselSpaiPrec) -> GselSpaiPrec:
    """Upgrade an f32-plane SPAI preconditioner for the prec_ds tier.

    The factor values ARE f32 (the GNN emits f32), so their double-single
    representation is exactly (vals, 0) — the lo planes are zeros and the
    upgrade is value-free. Used by the rds->ds rebound escalation."""

    def up(g: GselPlanes) -> GselPlanes:
        if g.vals_lo is not None:
            return g
        return dataclasses.replace(g, vals_lo=jnp.zeros_like(g.vals))

    return dataclasses.replace(prec, l_fwd=up(prec.l_fwd), l_t=up(prec.l_t))

_rr_grouped_jit = jax.jit(
    _rr_run_grouped, static_argnames=("impl", "k_inner", "a_ds", "prec_ds")
)


def pcg_gsel_rr(
    g_a: GselPlanes,
    b: jax.Array,
    prec=None,  # GselSpaiPrec / GselSpaiPrecDS (hi planes used) or None
    rtol: float = 1e-6,
    max_iter: int = 1000,
    replace_every: int = 64,
    impl: str = "pallas",
    spmv_precision: str = "f32",
    anchor: str = "grouped",  # 'grouped' (round-3) | 'percycle' (legacy)
    escalate_on_rebound=True,  # True (auto: pallas only) | False | "force"
) -> CGResult:
    """Residual-replacement mixed-precision PCG: f32 iteration cost with
    HONEST fp64-grade stopping.

    ``spmv_precision='ds'`` (the 'rds' tier) additionally runs the
    per-iteration A-matvec double-single: on ill-conditioned operators
    (heat_r20: kappa ~1e5+) the f32 A-products degrade the Krylov
    directions and inflate iterations ~2.3x over the fp64 oracle; ds A
    restores near-oracle counts while the preconditioner (2 more SpMVs)
    stays f32 — measured net ~1.6x per-iteration cost for ~2.3x fewer
    iterations on that family.

    Plain f32 CG's recurrence residual keeps shrinking while the TRUE
    residual stagnates at ~eps_f32*kappa — on ill-conditioned FEM heat
    operators the solver claims rtol=1e-6 with true relres ~1e-2. Here the
    state is a double-single (hi, lo) pair like pcg_gsel_ds, but the
    per-iteration SpMV and preconditioner run the plain f32 kernels (the
    Krylov direction quality only affects the convergence RATE); the
    residual is re-anchored to r = b - A x with the double-single SpMV
    adaptively (van der Vorst-Ye), so the loop can only exit on a truly
    converged residual. Requires ds-built planes
    (build_gsel_csr(double_single=True)). Measured on v5e at heat
    n=15,625: 51 us/iteration vs 23 f32 / 90 ds.

    Rebound recovery (VERDICT r4 item 4): on mask-rhs problems the f32-A
    tier's iteration count is trajectory-bistable near the ds noise
    floor (109<->149 under 1e-12 rhs perturbations; docs/PERF.md
    round-4a). The grouped loop counts anchor groups where the TRUE
    residual INCREASED (``CGResult.rebounds``); with
    ``escalate_on_rebound`` (default: auto, pallas only — the xla/CPU
    counter is noisy on healthy solves) a rebounding f32-A solve is
    re-run on the ds-A tier, whose fp64-grade Krylov directions do not
    exhibit the bistability (``CGResult.escalated=True``; wall-clock
    honestly includes both attempts). Pass ``"force"`` to escalate
    regardless of impl (tests), False to disable (timing studies).
    """
    assert g_a.vals_lo is not None, "build with double_single=True"
    if isinstance(prec, (GselSpaiPrec, GselSpaiPrecDS)) and prec.impl != impl:
        prec = dataclasses.replace(prec, impl=impl)
    b64 = b.reshape(-1).astype(jnp.float64)
    a_ds = spmv_precision in ("ds", "ds_a")
    prec_ds = spmv_precision in ("ds", "ds_prec")
    if anchor == "grouped":
        # round-3 default: group-anchored loop — no per-iteration branch
        # (the legacy percycle cond cost ~21 us/iter on-chip even when
        # the anchor was not taken; output/r3_prec_profile.json)
        x64, iters, relres, conv, n_reb = _rr_grouped_jit(
            g_a, prec, b64, jnp.float64(rtol), jnp.int32(max_iter), impl,
            16, a_ds=a_ds, prec_ds=prec_ds,
        )
        want_esc = (
            escalate_on_rebound == "force"
            or (bool(escalate_on_rebound) and impl == "pallas")
        )
        escalated = False
        if (want_esc and not a_ds
                and int(n_reb) >= REBOUND_ESCALATE_THRESHOLD):
            # bad-branch recovery (VERDICT r4 item 4): the f32-A rr
            # trajectory rebounded across >=1 anchor — re-run with the
            # double-single A-matvec (rds), whose Krylov directions are
            # fp64-grade and do not exhibit the bistability. The caller's
            # wall-clock honestly includes both attempts; the reported
            # iteration count is the recovered solve's.
            a_ds = True
            escalated = True
            x64, iters, relres, conv, n_reb = _rr_grouped_jit(
                g_a, prec, b64, jnp.float64(rtol), jnp.int32(max_iter),
                impl, 16, a_ds=True, prec_ds=prec_ds,
            )
        if (want_esc and a_ds and not prec_ds
                and isinstance(prec, GselSpaiPrec)
                and int(n_reb) >= REBOUND_ESCALATE_THRESHOLD):
            # second level (round 5): an rds trajectory that STILL
            # rebounds (armadillo-scale Hessians: committed device rows
            # 8,940 vs host 6,569) has f32 preconditioner-apply noise as
            # the remaining perturbation source — run the full-ds tier
            # (ds A-matvec AND ds factor applies; the factor's lo planes
            # are exact zeros since the GNN emits f32 values).
            escalated = True
            x64, iters, relres, conv, n_reb = _rr_grouped_jit(
                g_a, prec_with_ds_planes(prec), b64, jnp.float64(rtol),
                jnp.int32(max_iter), impl, 16, a_ds=True, prec_ds=True,
            )
        if escalated:
            return CGResult(
                x=x64, iters=iters, relres=relres, converged=conv,
                rebounds=n_reb, escalated=True,
            )
    else:
        x64, iters, relres, conv = _rr_run_jit(
            g_a, prec, b64, jnp.float64(rtol), jnp.int32(max_iter), impl,
            int(replace_every), a_ds=a_ds, prec_ds=prec_ds,
        )
        n_reb = jnp.int32(0)
    return CGResult(
        x=x64, iters=iters, relres=relres, converged=conv, rebounds=n_reb
    )
