"""Distributed PCG with gsel local SpMV kernels (production multi-chip path).

Same communication structure as dist/cg.py — `ppermute` ring halo
exchange for the search direction, `psum` for the CG dots (SURVEY §2.10's
new-design mandate) — but each shard's local SpMV runs the gsel
hardware-dynamic-gather kernel (kernels/gsel_pallas.py) instead of the
XLA ELL gather, which is scalar-core-bound on TPU (docs/PERF.md).

Host side, `partition_gsel` row-partitions a DOF-level CSR with the same
RCM + chunk/halo geometry as `partition.partition_system`, then builds
per-shard gsel planes over the extended local column space
[chunk - halo, chunk + chunk + halo) and pads them to a common
(S, K', Qg) so they stack on a leading shard axis for shard_map.

The SPAI preconditioner partitions the factor L and L^T the same way
(both are plain row-partitioned SpMVs), so the distributed neural solve
is: 3 halo exchanges + 3 local gsel SpMVs + 2 psum dots per iteration.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..kernels.gsel import GselPlanes, build_gsel, gsel_spmv_xla
from ..kernels.gsel_pallas import gsel_spmv_pallas
from .cg import AXIS, DistCGResult, _halo_exchange
from .partition import rcm_permutation


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGsel:
    """Per-shard gsel planes, stacked on a leading shard axis."""

    onehot: jax.Array  # int8 [P, S, GK', Qg]
    lidx: jax.Array  # int8 [P, S, GK', T]
    vals: jax.Array  # f32  [P, S, GK', T]
    group_base: jax.Array  # int32 [P, S]
    n_shards: int = _static(default=1)
    chunk: int = _static(default=0)  # DOF rows per shard
    halo: int = _static(default=0)  # DOF rows exchanged with each neighbor
    tile: int = _static(default=128)
    group: int = _static(default=16)
    q_chunks: int = _static(default=8)
    k_width: int = _static(default=1)
    # Interior step range [s_int0, s_int1): tile groups whose column
    # window lies entirely inside the local chunk — their SpMV needs no
    # halo values, so it runs concurrently with the ppermute exchange
    # (overlap mandate, BASELINE.json north star / SURVEY §7 hard parts).
    # Uniform across shards (intersection) so shard_map stays SPMD.
    s_int0: int = _static(default=0)
    s_int1: int = _static(default=0)
    # f32 tail planes of the f64 values (double-single storage for the
    # fp64-grade distributed SpMV — the rr tier's re-anchor / ds_a
    # A-matvec). Built with partition_gsel*(double_single=True).
    vals_lo: Optional[jax.Array] = None  # f32 [P, S, GK', T]

    def local_planes(self, oh, li, va, gb, va_lo=None) -> GselPlanes:
        """Rewrap one shard's (leading-axis-sliced) arrays as GselPlanes."""
        return GselPlanes(
            onehot=oh,
            lidx=li,
            vals=va,
            group_base=gb,
            n_rows=self.chunk,
            n_cols=self.chunk + 2 * self.halo,
            tile=self.tile,
            group=self.group,
            q_chunks=self.q_chunks,
            k_width=self.k_width,
            vals_lo=va_lo,
        )


def partition_gsel(
    a: sp.spmatrix,
    n_shards: int,
    reorder: bool = True,
    halo: Optional[int] = None,
    group: int = 16,
    double_single: bool = False,
) -> Tuple[PartitionedGsel, np.ndarray]:
    """Row-partition a DOF-level CSR into stacked per-shard gsel planes.

    Returns (system, perm); solution vectors undo the ordering with
    ``x_orig[perm] = x_part``. Raises if the (reordered) bandwidth
    exceeds the shard chunk (same contract as partition_system).
    ``double_single=True`` adds the f32 tail planes (`vals_lo`) needed
    by the rr tier's fp64-grade distributed SpMV."""
    a = sp.csr_matrix(a, dtype=np.float64)
    n = a.shape[0]
    perm = rcm_permutation(a) if reorder else np.arange(n)
    return partition_gsel_permuted(
        a[perm][:, perm].tocsr(), n_shards, halo=halo, group=group,
        double_single=double_single,
    ), perm


def partition_gsel_permuted(
    ap: sp.spmatrix,
    n_shards: int,
    halo: Optional[int] = None,
    group: int = 16,
    chunk_multiple: int = 128,
    double_single: bool = False,
) -> PartitionedGsel:
    """`partition_gsel` core on an ALREADY-ordered matrix (no reordering).

    Shared by dist/gnn.py, which must build several operators (A, the
    factor slot maps) over one common ordering/chunk/halo geometry.
    ``chunk_multiple``: extra divisibility constraint on chunk and halo
    beyond the 128-lane alignment (dist/gnn.py block factors need
    chunk % block_size == 0 so block rows never straddle shards)."""
    ap = sp.csr_matrix(ap, dtype=np.float64).tocoo()
    n = ap.shape[0]
    bandwidth = int(np.max(np.abs(ap.row - ap.col))) if ap.nnz else 0
    # chunk and halo rounded to whole 128-lane chunks: the extended and
    # local vector frames then share chunk boundaries, which lets interior
    # tile groups run off the LOCAL vector (pre-exchange) — see s_int0/1
    m = int(np.lcm(128, max(1, int(chunk_multiple))))
    chunk = -(-(-(-n // n_shards)) // m) * m
    if halo is None:
        halo = min(bandwidth, chunk)
    halo = min(-(-halo // m) * m, chunk)
    if bandwidth > chunk:
        raise ValueError(
            f"bandwidth {bandwidth} exceeds shard chunk {chunk}; "
            f"use fewer shards or a better ordering"
        )

    shard_of = ap.row // chunk
    ext = chunk + 2 * halo
    locals_ = []
    for s in range(n_shards):
        sel = shard_of == s
        r = ap.row[sel] - s * chunk
        ce = ap.col[sel] - s * chunk + halo
        assert (ce >= 0).all() and (ce < ext).all()
        locals_.append(
            sp.csr_matrix((ap.data[sel], (r, ce)), shape=(chunk, ext))
        )

    # lane_groups=1 throughout: the overlap range kernels below hardcode
    # the ng=1 select (see _range_spmv_*); revisit together if that changes
    planes = [
        build_gsel(m, group=group, double_single=double_single)
        for m in locals_
    ]
    if any(p is None for p in planes):
        raise ValueError("local window exceeded max_q; reduce group")
    kp = max(p.k_width for p in planes)
    qg = max(p.q_chunks for p in planes)
    n_steps = planes[0].n_steps
    t = planes[0].tile
    grp = planes[0].group

    def pad(p: GselPlanes):
        gk_new = grp * kp
        oh = np.zeros((n_steps, gk_new, qg), np.int8)
        li = np.zeros((n_steps, gk_new, t), np.int8)
        va = np.zeros((n_steps, gk_new, t), np.float32)
        gk_old = grp * p.k_width
        # k-major rows: old row k*G+g maps to the same index (k < old K')
        oh[:, :gk_old, : p.q_chunks] = np.asarray(p.onehot)
        li[:, :gk_old] = np.asarray(p.lidx)
        va[:, :gk_old] = np.asarray(p.vals)
        vl = None
        if p.vals_lo is not None:
            vl = np.zeros((n_steps, gk_new, t), np.float32)
            vl[:, :gk_old] = np.asarray(p.vals_lo)
        return oh, li, va, np.asarray(p.group_base), vl

    padded = [pad(p) for p in planes]

    # interior step range: groups whose real column extent lies inside
    # [halo, halo + chunk) need no halo values — and whose (8-aligned)
    # group_base stays >= halo so the local-frame window slice start is
    # in-bounds. With RCM banding the boundary groups sit at both ends of
    # each shard's step range, so the interior is one contiguous [a, b);
    # shards intersect to stay SPMD.
    halo_c, chunk_c = halo // 128, chunk // 128
    s0, s1 = 0, n_steps
    for (_, _, _, gb, _vl), m in zip(padded, locals_):
        coo_l = m.tocoo()
        ghi = np.zeros(n_steps, np.int64)
        if coo_l.nnz:
            gid_l = (coo_l.row // t) // grp
            np.maximum.at(ghi, gid_l, coo_l.col // 128)
        interior = (gb >= halo_c) & (ghi < halo_c + chunk_c)
        idx = np.flatnonzero(interior)
        if len(idx) == 0:
            s0, s1 = 0, 0
            break
        a_s, b_s = int(idx[0]), int(idx[-1]) + 1
        if not interior[a_s:b_s].all():  # non-contiguous: be conservative
            runs = np.split(idx, np.flatnonzero(np.diff(idx) > 1) + 1)
            best = max(runs, key=len)
            a_s, b_s = int(best[0]), int(best[-1]) + 1
        s0, s1 = max(s0, a_s), min(s1, b_s)
    if s0 >= s1:
        s0 = s1 = 0

    return PartitionedGsel(
        onehot=jnp.asarray(np.stack([x[0] for x in padded])),
        lidx=jnp.asarray(np.stack([x[1] for x in padded])),
        vals=jnp.asarray(np.stack([x[2] for x in padded])),
        group_base=jnp.asarray(np.stack([x[3] for x in padded])),
        vals_lo=(
            jnp.asarray(np.stack([x[4] for x in padded]))
            if double_single
            else None
        ),
        n_shards=n_shards,
        chunk=chunk,
        halo=halo,
        tile=t,
        group=grp,
        q_chunks=qg,
        k_width=kp,
        s_int0=s0,
        s_int1=s1,
    )


def _shard_gsel_spmv(pg, oh, li, va, gb, x_l, impl, axis=AXIS):
    """halo exchange + local gsel SpMV. x_l [chunk] -> y_l [chunk]."""
    x_ext = _halo_exchange(x_l[:, None], pg.halo, axis)[:, 0]
    g = pg.local_planes(oh, li, va, gb)
    fn = gsel_spmv_pallas if impl == "pallas" else gsel_spmv_xla
    return fn(g, x_ext)


def _chunk_pad(x: jax.Array, qg: int) -> jax.Array:
    """[rows] (rows % 128 == 0) -> [rows/128 + Qg, 128] with window slack."""
    nc = x.shape[0] // 128
    xc = jnp.zeros((nc + qg, 128), x.dtype)
    return xc.at[:nc].set(x.reshape(nc, 128))


def _range_spmv_xla(pg, oh, li, va, gb, xc, s_lo, s_hi, shift):
    """SpMV over tile groups [s_lo, s_hi) against a chunked x frame whose
    chunk 0 corresponds to extended-frame chunk `shift`. -> [range, G, T]

    ng=1 only (partition_gsel builds lane_groups=1 planes)."""
    qg, grp, kp, t = pg.q_chunks, pg.group, pg.k_width, pg.tile

    def step(carry, inp):
        oh_s, li_s, va_s, b = inp
        xw = jax.lax.dynamic_slice(xc, (b - shift, jnp.int32(0)), (qg, 128))
        op = jnp.dot(
            oh_s.astype(jnp.float32), xw, precision=jax.lax.Precision.HIGHEST
        )
        gv = jnp.take_along_axis(op, li_s.astype(jnp.int32), axis=1)
        return carry, jnp.sum((va_s * gv).reshape(kp, grp, t), axis=0)

    _, ys = jax.lax.scan(
        step, None,
        (oh[s_lo:s_hi], li[s_lo:s_hi], va[s_lo:s_hi], gb[s_lo:s_hi]),
    )
    return ys


def _range_spmv_pallas(pg, oh, li, va, gb, xc, s_lo, s_hi, shift):
    from jax.experimental import pallas as pl2
    from jax.experimental.pallas import tpu as pltpu

    from ..kernels.gsel_pallas import _chunk_select_gather

    qg, grp, kp, t = pg.q_chunks, pg.group, pg.k_width, pg.tile
    gk = grp * kp
    steps = s_hi - s_lo

    def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
        s = pl2.program_id(0)
        oh_k = oh_ref[0].astype(jnp.float32)
        l_idx = l_ref[0].astype(jnp.int32)
        gv = _chunk_select_gather(
            base_ref[s + s_lo] - shift, oh_k, x_ref, l_idx, qg, 1
        )
        out_ref[0] = jnp.sum((v_ref[0] * gv).reshape(kp, grp, t), axis=0)

    def blk(c):
        nd = len(c)
        return pl2.BlockSpec(
            (1,) + c, lambda s, *_, _nd=nd: (s + s_lo,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            blk((gk, qg)),
            blk((gk, t)),
            blk((gk, t)),
            pl2.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl2.BlockSpec(
            (1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    with jax.enable_x64(False):
        out = pl2.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((steps, grp, t), jnp.float32),
        )(gb, oh, li, va, xc)
    return out


def _shard_gsel_spmv_overlap(pg, oh, li, va, gb, x_l, impl, axis=AXIS):
    """Halo-overlapped local SpMV: interior tile groups (column window
    inside the local chunk) compute from the PRE-exchange local vector,
    so XLA's scheduler can run the ppermute concurrently; the two
    boundary step ranges then consume the exchanged vector. Op-for-op
    identical to `_shard_gsel_spmv` (same windows, same select math)."""
    s0, s1 = pg.s_int0, pg.s_int1
    if s1 <= s0 or pg.halo == 0:
        return _shard_gsel_spmv(pg, oh, li, va, gb, x_l, impl, axis)
    n_steps = oh.shape[0]
    qg = pg.q_chunks
    halo_c = pg.halo // 128
    fn = _range_spmv_pallas if impl == "pallas" else _range_spmv_xla
    y_mid = fn(pg, oh, li, va, gb, _chunk_pad(x_l, qg), s0, s1, halo_c)
    x_ext = _halo_exchange(x_l[:, None], pg.halo, axis)[:, 0]
    xc_e = _chunk_pad(x_ext, qg)
    empty = jnp.zeros((0,), y_mid.dtype)
    y_lo = (
        fn(pg, oh, li, va, gb, xc_e, 0, s0, 0).reshape(-1) if s0 > 0 else empty
    )
    y_hi = (
        fn(pg, oh, li, va, gb, xc_e, s1, n_steps, 0).reshape(-1)
        if s1 < n_steps
        else empty
    )
    y = jnp.concatenate([y_lo, y_mid.reshape(-1), y_hi])
    return y[: pg.chunk]


def _get_shard_map():
    try:
        from jax import shard_map as _sm  # jax >= 0.8 (check_vma kwarg)

        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw)

        return shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

        return shard_map


def _shard_gsel_spmv_ds(pg, oh, li, va, va_lo, gb, x_hi, x_lo, impl,
                        axis=AXIS):
    """fp64-grade local SpMV: halo-exchange the (hi, lo) pair, then the
    double-single gsel kernel on the extended frame. Used only at the rr
    tier's anchor points / ds_a A-matvec — no interior overlap (the ds
    kernel dominates the exchange at anchor frequency)."""
    from ..kernels.gsel import gsel_spmv_ds_xla
    from ..kernels.gsel_pallas import gsel_spmv_ds_pallas

    xx = jnp.stack([x_hi, x_lo], axis=1)  # [chunk, 2]
    ext = _halo_exchange(xx, pg.halo, axis)
    g = pg.local_planes(oh, li, va, gb, va_lo=va_lo)
    fn = gsel_spmv_ds_pallas if impl == "pallas" else gsel_spmv_ds_xla
    return fn(g, ext[:, 0], ext[:, 1])


def dist_pcg_gsel_rr(
    pg: PartitionedGsel,
    b: jax.Array,  # [P, chunk] partitioned rhs (f64-representable)
    pl: Optional[PartitionedGsel] = None,  # factor L (hi planes used)
    plt: Optional[PartitionedGsel] = None,  # factor L^T
    epsilon: float = 3e-3,
    inv_diag: Optional[jax.Array] = None,  # [P, chunk]
    rtol: float = 1e-6,
    max_iter: int = 1000,
    impl: str = "pallas",
    k_inner: int = 16,
    a_ds: bool = True,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DistCGResult:
    """Distributed group-anchored residual-replacement PCG — the honest
    precision tier of `dist_pcg_gsel` (VERDICT r3 item 5: the f32 dist
    solve inflated iterations 1.65x over the host fp64 oracle on
    heat_r20; single-chip rds holds 103 = 103).

    Same structure as the single-chip `_rr_run_grouped`
    (solver/gsel_solver.py): double-single (hi, lo) state, an inner
    while_loop of cheap iterations (f32 preconditioner SpMVs with halo
    overlap; the A-matvec double-single when ``a_ds`` — the rds tier
    that restores near-oracle Krylov directions on ill-conditioned
    operators), then an outer re-anchor r = b - A x with the ds SpMV
    testing the TRUE residual. CG dots run compensated (ds_dot) and
    all-reduce as f64 psum scalars, so stopping is fp64-grade and the
    loop can only exit on a truly converged residual
    (`validate.py:27` semantics at multi-chip scale).

    Requires ``pg`` built with double_single=True (vals_lo planes)."""
    from jax.sharding import PartitionSpec as P

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

    assert pg.vals_lo is not None, "partition with double_single=True"
    shard_map = _get_shard_map()
    if mesh is None:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[: pg.n_shards]), (AXIS,)
        )
    spec = P(AXIS)
    eps = jnp.float32(epsilon)
    rtol_s = jnp.float64(rtol)
    max_it = jnp.int32(max_iter)

    def local_body(oh, li, va, vlo, gb, b_l, *prec_args):
        b_l = b_l[0]
        oh, li, va, vlo, gb = oh[0], li[0], va[0], vlo[0], gb[0]

        def pdot(u, v):
            return jax.lax.psum(ds_dot(u, v), AXIS)

        def pdot_fast(u, v):
            # REVERTED to the compensated tier (see _rr_run_grouped:
            # chunk64 inner dots cost 1.45x iterations on the pallas
            # path — output/r4_dots_ab.json)
            return jax.lax.psum(ds_dot(u, v), AXIS)

        def mv_fast(v):
            y = _shard_gsel_spmv_overlap(pg, oh, li, va, gb, v.hi, impl)
            return DS(y, jnp.zeros_like(y))

        def mv_ds(v):
            yh, yl = _shard_gsel_spmv_ds(
                pg, oh, li, va, vlo, gb, v.hi, v.lo, impl
            )
            return DS(yh, yl)

        if pl is not None:
            loh, lli, lva, lgb, toh, tli, tva, tgb = [
                q[0] for q in prec_args[:8]
            ]
            invd = prec_args[8][0] if inv_diag is not None else None

            def papply(r):
                lt_r = _shard_gsel_spmv_overlap(
                    plt, toh, tli, tva, tgb, r.hi, impl
                )
                eps_r = eps * r.hi
                if invd is not None:
                    lt_r = lt_r * invd
                    eps_r = eps_r * invd
                y = (
                    _shard_gsel_spmv_overlap(
                        pl, loh, lli, lva, lgb, lt_r, impl
                    )
                    + eps_r
                )
                return DS(y, jnp.zeros_like(y))

        elif inv_diag is not None:
            invd = prec_args[0][0]

            def papply(r):
                return DS(r.hi * invd, r.lo * invd)

        else:

            def papply(r):
                return r

        bds = ds_from_f64(b_l.astype(jnp.float64))
        bnorm2 = pdot(bds, bds)
        tiny = jnp.finfo(jnp.float64).tiny
        tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, tiny)
        x0 = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
        d0 = DS(jnp.zeros_like(bds.hi), jnp.zeros_like(bds.lo))
        rn0 = pdot(bds, bds)

        # rotated PCG body + group anchoring: see _rr_run_grouped
        def inner_body(st):
            x, r, d, delta, rn2, it = st
            s = papply(r)
            delta_new = pdot_fast(r, s)
            beta = ds_from_f64(delta_new / delta)
            d = ds_add(s, ds_scale(beta, d))
            q = mv_ds(d) if a_ds else mv_fast(d)
            dq = pdot_fast(d, q)
            alpha = ds_from_f64(delta_new / dq)
            nalpha = DS(-alpha.hi, -alpha.lo)
            x = ds_axpy(alpha, d, x)
            r = ds_axpy(nalpha, q, r)
            rn2 = pdot_fast(r, r)
            return x, r, d, delta_new, rn2, it + 1

        def outer_body(st):
            x, r, d, delta, rn2_true, it, _conv = st
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
            r = ds_sub(bds, mv_ds(x))
            rn2_true = pdot(r, r)
            return x, r, d, delta, rn2_true, it, rn2_true <= tol2

        def outer_cond(st):
            rn2_true, it, conv = st[4], st[5], st[6]
            return jnp.logical_and(~conv, it < max_it)

        st = (x0, bds, d0, jnp.float64(1.0), rn0, jnp.int32(0), rn0 <= tol2)
        x, r, _, _, rn2, iters, conv = jax.lax.while_loop(
            outer_cond, outer_body, st
        )
        relres = jnp.sqrt(rn2 / jnp.maximum(bnorm2, tiny))
        x64 = x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)
        return DistCGResult(x64[None], iters, relres, conv)

    args = [pg.onehot, pg.lidx, pg.vals, pg.vals_lo, pg.group_base, b]
    if pl is not None:
        args += [pl.onehot, pl.lidx, pl.vals, pl.group_base,
                 plt.onehot, plt.lidx, plt.vals, plt.group_base]
        if inv_diag is not None:
            args += [inv_diag]
    elif inv_diag is not None:
        args += [inv_diag]

    out_specs = DistCGResult(spec, P(), P(), P())
    fn = shard_map(
        local_body,
        mesh=mesh,
        in_specs=tuple(spec for _ in args),
        out_specs=out_specs,
        check_rep=False,
    )
    return fn(*args)


def _shard_gsel_spmv_f64(pg, oh, li, va, gb, x64, va_lo=None, axis=AXIS):
    """True-f64 local SpMV: halo-exchange the f64 vector, then the
    native-f64 gsel kernel on the extended frame (no pair split)."""
    from ..kernels.gsel import gsel_spmv_f64_xla

    ext = _halo_exchange(x64[:, None], pg.halo, axis)[:, 0]
    g = pg.local_planes(oh, li, va, gb, va_lo=va_lo)
    return gsel_spmv_f64_xla(g, ext)


def dist_pcg_gsel_f64(
    pg: PartitionedGsel,
    b: jax.Array,  # [P, chunk] partitioned rhs
    pl: Optional[PartitionedGsel] = None,  # factor L (f32 values)
    plt: Optional[PartitionedGsel] = None,  # factor L^T
    epsilon: float = 3e-3,
    inv_diag: Optional[jax.Array] = None,  # [P, chunk]
    rtol: float = 1e-6,
    max_iter: int = 1000,
    k_inner: int = 64,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DistCGResult:
    """Native-f64 distributed PCG — the honest tier for HOST-simulated
    meshes (and a DCN/CPU fallback). On XLA:CPU the ds pair transforms
    silently collapse under fused-loop FP contraction (kernels/ds.py
    caveat), which makes `dist_pcg_gsel_rr`'s anchored trajectory
    bistable there: the committed heat_r20 NeuralDist row measured 103
    iters in one session and 151 in another against a host fp64 oracle
    of 101 (output/heat_r20_dist history). f64 is NATIVE on CPU, so
    this tier runs plain f64 state, f64 A-matvecs (A reconstructed
    f64-exactly from its double-single planes, hi + lo), and f64
    factor applies — deterministically reproducing the host oracle's
    trajectory. True-residual re-anchoring every ``k_inner`` iterations
    keeps stopping exact (the loop cannot exit unconverged). On real
    TPU meshes f64 is 10-30x software-emulated — use
    `dist_pcg_gsel_rr` there (reference fp64 semantics: validate.py:27).

    Requires ``pg`` built with double_single=True (vals_lo planes)."""
    from jax.sharding import PartitionSpec as P

    assert pg.vals_lo is not None, "partition with double_single=True"
    shard_map = _get_shard_map()
    if mesh is None:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[: pg.n_shards]), (AXIS,)
        )
    spec = P(AXIS)
    eps = jnp.float64(epsilon)
    rtol_s = jnp.float64(rtol)
    max_it = jnp.int32(max_iter)

    def local_body(oh, li, va, vlo, gb, b_l, *prec_args):
        b_l = b_l[0].astype(jnp.float64)
        oh, li, va, vlo, gb = oh[0], li[0], va[0], vlo[0], gb[0]

        def pdot(u, v):
            return jax.lax.psum(jnp.dot(u, v), AXIS)

        def mv(v):
            return _shard_gsel_spmv_f64(pg, oh, li, va, gb, v, va_lo=vlo)

        if pl is not None:
            loh, lli, lva, lgb, toh, tli, tva, tgb = [
                q[0] for q in prec_args[:8]
            ]
            invd = (
                prec_args[8][0].astype(jnp.float64)
                if inv_diag is not None
                else None
            )

            def papply(r):
                lt_r = _shard_gsel_spmv_f64(plt, toh, tli, tva, tgb, r)
                eps_r = eps * r
                if invd is not None:
                    lt_r = lt_r * invd
                    eps_r = eps_r * invd
                return _shard_gsel_spmv_f64(pl, loh, lli, lva, lgb, lt_r) + eps_r

        elif inv_diag is not None:
            invd = prec_args[0][0].astype(jnp.float64)

            def papply(r):
                return r * invd

        else:

            def papply(r):
                return r

        bnorm2 = pdot(b_l, b_l)
        tiny = jnp.finfo(jnp.float64).tiny
        tol2 = (rtol_s * rtol_s) * jnp.maximum(bnorm2, tiny)
        x0 = jnp.zeros_like(b_l)
        d0 = jnp.zeros_like(b_l)
        rn0 = bnorm2

        # rotated PCG body + group anchoring: see _rr_run_grouped
        def inner_body(st):
            x, r, d, delta, rn2, it = st
            s = papply(r)
            delta_new = pdot(r, s)
            beta = delta_new / delta
            d = s + beta * d
            q = mv(d)
            alpha = delta_new / pdot(d, q)
            x = x + alpha * d
            r = r - alpha * q
            return x, r, d, delta_new, pdot(r, r), it + 1

        def outer_body(st):
            x, r, d, delta, rn2_true, it, _conv = st
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
            r = b_l - mv(x)
            rn2_true = pdot(r, r)
            return x, r, d, delta, rn2_true, it, rn2_true <= tol2

        def outer_cond(st):
            rn2_true, it, conv = st[4], st[5], st[6]
            return jnp.logical_and(~conv, it < max_it)

        st = (x0, b_l, d0, jnp.float64(1.0), rn0, jnp.int32(0), rn0 <= tol2)
        x, r, _, _, rn2, iters, conv = jax.lax.while_loop(
            outer_cond, outer_body, st
        )
        relres = jnp.sqrt(rn2 / jnp.maximum(bnorm2, tiny))
        return DistCGResult(x[None], iters, relres, conv)

    args = [pg.onehot, pg.lidx, pg.vals, pg.vals_lo, pg.group_base, b]
    if pl is not None:
        args += [pl.onehot, pl.lidx, pl.vals, pl.group_base,
                 plt.onehot, plt.lidx, plt.vals, plt.group_base]
        if inv_diag is not None:
            args += [inv_diag]
    elif inv_diag is not None:
        args += [inv_diag]

    out_specs = DistCGResult(spec, P(), P(), P())
    fn = shard_map(
        local_body,
        mesh=mesh,
        in_specs=tuple(spec for _ in args),
        out_specs=out_specs,
        check_rep=False,
    )
    return fn(*args)


def dist_pcg_gsel(
    pg: PartitionedGsel,
    b: jax.Array,  # [P, chunk] partitioned rhs (scatter_vector-style)
    pl: Optional[PartitionedGsel] = None,  # factor L
    plt: Optional[PartitionedGsel] = None,  # factor L^T
    epsilon: float = 3e-3,
    inv_diag: Optional[jax.Array] = None,  # [P, chunk]
    rtol: float = 1e-6,
    max_iter: int = 1000,
    impl: str = "pallas",
    dot_dtype=jnp.float64,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DistCGResult:
    """Distributed PCG over a device mesh with gsel local SpMVs.

    All-reduce traffic: 4 psum scalars per iteration; neighbor traffic:
    halo segments per SpMV via ppermute. `b` (and the result) live
    shard-partitioned on the leading axis.

    Runs at the RHS dtype (f32 planes): iteration counts on
    ill-conditioned operators inflate vs the fp64 oracle — use
    `dist_pcg_gsel_rr` for fp64-grade stopping and near-oracle counts."""
    from jax.sharding import PartitionSpec as P

    shard_map = _get_shard_map()

    if mesh is None:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()[: pg.n_shards]), (AXIS,)
        )
    spec = P(AXIS)

    def psum_dot(a, c):
        p = (a.astype(dot_dtype) * c.astype(dot_dtype)).sum()
        return jax.lax.psum(p, AXIS)

    eps = jnp.float32(epsilon)

    def local_body(oh, li, va, gb, b_l, *prec_args):
        b_l = b_l[0]
        oh, li, va = oh[0], li[0], va[0]
        gb = gb[0]

        def matvec(v):
            return _shard_gsel_spmv_overlap(pg, oh, li, va, gb, v, impl)

        if pl is not None:
            loh, lli, lva, lgb, toh, tli, tva, tgb = [q[0] for q in prec_args[:8]]
            invd = prec_args[8][0] if inv_diag is not None else None

            def mapply(r):
                lt_r = _shard_gsel_spmv_overlap(plt, toh, tli, tva, tgb, r, impl)
                eps_r = eps * r
                if invd is not None:
                    lt_r = lt_r * invd
                    eps_r = eps_r * invd
                return (
                    _shard_gsel_spmv_overlap(pl, loh, lli, lva, lgb, lt_r, impl)
                    + eps_r
                )

        elif inv_diag is not None:
            invd = prec_args[0][0]

            def mapply(r):
                return r * invd

        else:

            def mapply(r):
                return r

        x = jnp.zeros_like(b_l)
        r = b_l
        s = mapply(r)
        delta = psum_dot(r, s)
        bnorm2 = psum_dot(b_l, b_l)
        tiny = jnp.finfo(dot_dtype).tiny
        tol2 = (rtol * rtol) * jnp.maximum(bnorm2, tiny)
        rnorm2 = psum_dot(r, r)

        def cond(st):
            *_, rn2, it = st
            return jnp.logical_and(rn2 > tol2, it < max_iter)

        def body(st):
            x, r, d, delta, _, it = st
            q = matvec(d)
            alpha = (delta / psum_dot(d, q)).astype(b_l.dtype)
            x = x + alpha * d
            r = r - alpha * q
            s = mapply(r)
            delta_new = psum_dot(r, s)
            beta = (delta_new / delta).astype(b_l.dtype)
            d = s + beta * d
            return x, r, d, delta_new, psum_dot(r, r), it + 1

        x, r, _, _, rnorm2, iters = jax.lax.while_loop(
            cond, body, (x, r, s, delta, rnorm2, jnp.int32(0))
        )
        relres = jnp.sqrt(rnorm2 / jnp.maximum(bnorm2, tiny))
        return DistCGResult(x[None], iters, relres, rnorm2 <= tol2)

    args = [pg.onehot, pg.lidx, pg.vals, pg.group_base, b]
    if pl is not None:
        args += [pl.onehot, pl.lidx, pl.vals, pl.group_base,
                 plt.onehot, plt.lidx, plt.vals, plt.group_base]
        if inv_diag is not None:
            args += [inv_diag]
    elif inv_diag is not None:
        args += [inv_diag]

    out_specs = DistCGResult(spec, P(), P(), P())
    fn = shard_map(
        local_body,
        mesh=mesh,
        in_specs=tuple(spec for _ in args),
        out_specs=out_specs,
        check_rep=False,
    )
    return fn(*args)
