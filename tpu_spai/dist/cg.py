"""Distributed PCG under `jax.shard_map`: halo-exchange SpMV + psum dots.

Per CG iteration on each shard:
  1. exchange `halo` boundary block-rows of the search direction with the
     left/right neighbor (`jax.lax.ppermute` over the ICI ring) — XLA
     overlaps the permute with the independent local ELL gather work,
  2. local scatter-free block SpMV over the extended vector,
  3. `jax.lax.psum` for the two dot products (the only all-reduce).

SPAI preconditioning in the distributed solver uses the same machinery:
the factor shares A's partition, so `eps x + L (L^T x)` is two halo
exchanges + two local SpMVs (transpose handled by a second PartitionedSystem
built from L^T — both are produced by `partition_system` on host).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .partition import PartitionedSystem

AXIS = "shards"


def _halo_exchange(x_l: jax.Array, halo: int, axis: str = AXIS) -> jax.Array:
    """[chunk, b] -> [halo + chunk + halo, b] with neighbor boundary rows.

    Ring ppermute; the wrap-around values at the outer boundary shards are
    never referenced (the partitioner guarantees no edges point there).
    """
    if halo == 0:
        return x_l
    p = jax.lax.axis_size(axis)
    if p == 1:
        z = jnp.zeros((halo,) + x_l.shape[1:], x_l.dtype)
        return jnp.concatenate([z, x_l, z], axis=0)
    send_right = [(i, (i + 1) % p) for i in range(p)]
    send_left = [(i, (i - 1) % p) for i in range(p)]
    left_halo = jax.lax.ppermute(x_l[-halo:], axis, perm=send_right)
    right_halo = jax.lax.ppermute(x_l[:halo], axis, perm=send_left)
    return jnp.concatenate([left_halo, x_l, right_halo], axis=0)


def _local_spmv(sys_l, x_ext: jax.Array) -> jax.Array:
    """Scatter-free ELL block SpMV on one shard's extended vector.

    [K, chunk]-layout with frozen masked value planes (see
    tpu_spai/sparse/bcoo.py layout rationale): x_ext [halo+chunk+halo, b].
    """
    xt = x_ext.T  # [b, ext]
    xg = xt[:, sys_l.ell_col]  # [b, K, chunk]
    yt = jnp.einsum("pqkn,qkn->pn", sys_l.ell_vals, xg)
    return yt.T  # [chunk, b]


def shard_spmv(sys_l: PartitionedSystem, x_l: jax.Array, axis: str = AXIS) -> jax.Array:
    """y_l = (A x)_l with halo exchange; call inside shard_map."""
    x_ext = _halo_exchange(x_l, sys_l.halo, axis)
    return _local_spmv(sys_l, x_ext) * sys_l.row_valid[:, None]


class DistCGResult(NamedTuple):
    x: jax.Array  # [P, chunk, b] sharded solution
    iters: jax.Array
    relres: jax.Array
    converged: jax.Array


def _dist_pcg_local(
    sys_l,
    b_l,
    prec_sys_l,
    prec_sys_t_l,
    inv_diag_l,
    epsilon,
    rtol,
    max_iter,
    axis=AXIS,
):
    """Shard-local PCG body (runs under shard_map; collectives inside)."""

    def psum_dot(a, c):
        return jax.lax.psum(jnp.vdot(a.ravel(), c.ravel()), axis)

    def matvec(v):
        return shard_spmv(sys_l, v, axis)

    if prec_sys_l is not None:

        def mapply(r):
            lt_r = shard_spmv(prec_sys_t_l, r, axis)
            if inv_diag_l is not None:
                lt_r = lt_r * inv_diag_l
            y = shard_spmv(prec_sys_l, lt_r, axis)
            eps_r = epsilon * r
            if inv_diag_l is not None:
                eps_r = eps_r * inv_diag_l
            return y + eps_r

    elif inv_diag_l is not None:

        def mapply(r):
            return r * inv_diag_l

    else:

        def mapply(r):
            return r

    x = jnp.zeros_like(b_l)
    r = b_l
    s = mapply(r)
    delta = psum_dot(r, s)
    bnorm2 = psum_dot(b_l, b_l)
    tol2 = (rtol * rtol) * jnp.maximum(bnorm2, jnp.finfo(b_l.dtype).tiny)
    rnorm2 = psum_dot(r, r)

    def cond(state):
        *_, rn2, it = state
        return jnp.logical_and(rn2 > tol2, it < max_iter)

    def body(state):
        x, r, d, delta, _, it = state
        q = matvec(d)
        alpha = delta / psum_dot(d, q)
        x = x + alpha * d
        r = r - alpha * q
        s = mapply(r)
        delta_new = psum_dot(r, s)
        beta = delta_new / delta
        d = s + beta * d
        return x, r, d, delta_new, psum_dot(r, r), it + 1

    x, r, _, _, rnorm2, iters = jax.lax.while_loop(
        cond, body, (x, r, s, delta, rnorm2, jnp.int32(0))
    )
    relres = jnp.sqrt(rnorm2 / jnp.maximum(bnorm2, jnp.finfo(b_l.dtype).tiny))
    return DistCGResult(x, iters, relres, rnorm2 <= tol2)


def dist_pcg(
    system: PartitionedSystem,
    b_sharded: jax.Array,
    mesh: jax.sharding.Mesh,
    prec_system: Optional[PartitionedSystem] = None,
    prec_system_t: Optional[PartitionedSystem] = None,
    inv_diag: Optional[jax.Array] = None,
    epsilon: float = 0.0,
    rtol: float = 1e-6,
    max_iter: int = 1000,
    axis_name: str = AXIS,
) -> DistCGResult:
    """Row-partitioned PCG over `mesh` (1-D shard axis).

    ``b_sharded``: [P, chunk, blk]. Preconditioner: None (identity),
    jacobi (pass inv_diag [P, chunk, blk]), or SPAI (pass the factor L and
    its transpose as PartitionedSystems sharing A's partition).
    """
    from jax.sharding import PartitionSpec as P

    shard0 = P(axis_name)
    rtol_a = jnp.asarray(rtol, b_sharded.dtype)
    max_iter_a = jnp.asarray(max_iter, jnp.int32)

    def spec_like(tree):
        return jax.tree_util.tree_map(lambda _: shard0, tree)

    in_specs = (
        spec_like(system),
        shard0,
        spec_like(prec_system) if prec_system is not None else None,
        spec_like(prec_system_t) if prec_system_t is not None else None,
        shard0 if inv_diag is not None else None,
        P(),
        P(),
        P(),
    )
    out_specs = DistCGResult(shard0, P(), P(), P())

    def body(sys_l, b_l, prec_l, prec_t_l, invd_l, eps, rt, mi):
        # shard_map keeps the (now size-1) shard axis; strip it locally
        squeeze = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        res = _dist_pcg_local(
            squeeze(sys_l),
            b_l[0],
            squeeze(prec_l) if prec_l is not None else None,
            squeeze(prec_t_l) if prec_t_l is not None else None,
            invd_l[0] if invd_l is not None else None,
            eps,
            rt,
            mi,
            axis=axis_name,
        )
        return DistCGResult(res.x[None], res.iters, res.relres, res.converged)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return fn(
        system,
        b_sharded,
        prec_system,
        prec_system_t,
        inv_diag,
        jnp.asarray(epsilon, b_sharded.dtype),
        rtol_a,
        max_iter_a,
    )


def dist_spmv_reference(
    system: PartitionedSystem, x_sharded: jax.Array, mesh: jax.sharding.Mesh,
    axis_name: str = AXIS,
) -> jax.Array:
    """Sharded y = A x (for tests/benchmarks)."""
    from jax.sharding import PartitionSpec as P

    shard0 = P(axis_name)
    def body(s, x):
        s_l = jax.tree_util.tree_map(lambda a: a[0], s)
        return shard_spmv(s_l, x[0], axis_name)[None]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: shard0, system), shard0),
        out_specs=shard0,
        check_vma=False,
    )
    return fn(system, x_sharded)
