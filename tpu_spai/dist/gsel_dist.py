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

    def local_planes(self, oh, li, va, gb) -> GselPlanes:
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
        )


def partition_gsel(
    a: sp.spmatrix,
    n_shards: int,
    reorder: bool = True,
    halo: Optional[int] = None,
    group: int = 16,
) -> Tuple[PartitionedGsel, np.ndarray]:
    """Row-partition a DOF-level CSR into stacked per-shard gsel planes.

    Returns (system, perm); solution vectors undo the ordering with
    ``x_orig[perm] = x_part``. Raises if the (reordered) bandwidth
    exceeds the shard chunk (same contract as partition_system)."""
    a = sp.csr_matrix(a, dtype=np.float64)
    n = a.shape[0]
    perm = rcm_permutation(a) if reorder else np.arange(n)
    ap = a[perm][:, perm].tocoo()
    bandwidth = int(np.max(np.abs(ap.row - ap.col))) if ap.nnz else 0
    chunk = -(-n // n_shards)
    if halo is None:
        halo = min(bandwidth, chunk)
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

    planes = [build_gsel(m, group=group) for m in locals_]
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
        return oh, li, va, np.asarray(p.group_base)

    padded = [pad(p) for p in planes]
    return (
        PartitionedGsel(
            onehot=jnp.asarray(np.stack([x[0] for x in padded])),
            lidx=jnp.asarray(np.stack([x[1] for x in padded])),
            vals=jnp.asarray(np.stack([x[2] for x in padded])),
            group_base=jnp.asarray(np.stack([x[3] for x in padded])),
            n_shards=n_shards,
            chunk=chunk,
            halo=halo,
            tile=t,
            group=grp,
            q_chunks=qg,
            k_width=kp,
        ),
        perm,
    )


def _shard_gsel_spmv(pg, oh, li, va, gb, x_l, impl, axis=AXIS):
    """halo exchange + local gsel SpMV. x_l [chunk] -> y_l [chunk]."""
    x_ext = _halo_exchange(x_l[:, None], pg.halo, axis)[:, 0]
    g = pg.local_planes(oh, li, va, gb)
    fn = gsel_spmv_pallas if impl == "pallas" else gsel_spmv_xla
    return fn(g, x_ext)


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
    shard-partitioned on the leading axis."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _sm  # jax >= 0.8 (check_vma kwarg)

        def shard_map(f, **kw):
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

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
            return _shard_gsel_spmv(pg, oh, li, va, gb, v, impl)

        if pl is not None:
            loh, lli, lva, lgb, toh, tli, tva, tgb = [q[0] for q in prec_args[:8]]
            invd = prec_args[8][0] if inv_diag is not None else None

            def mapply(r):
                lt_r = _shard_gsel_spmv(plt, toh, tli, tva, tgb, r, impl)
                eps_r = eps * r
                if invd is not None:
                    lt_r = lt_r * invd
                    eps_r = eps_r * invd
                return (
                    _shard_gsel_spmv(pl, loh, lli, lva, lgb, lt_r, impl)
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
