"""Pallas TPU kernel: gather-free windowed block SpMV.

The hot kernel of the framework. XLA's dynamic gather on TPU is
scalar-bound (~0.13 G elem/s measured on v5e), so this kernel performs the
sparse gather as dense selects (scheme + host plane construction in
kernels/window.py).

Fused formulation (measured fastest of the variants tried on v5e; see
docs/PERF.md for the study): per row tile j (grid step),

  * slice the tile's x-window [Q, 128] from the VMEM-resident chunked x
    and transpose it once,
  * build the lane one-hot for ALL ELL slots at once  [K, T, 128], and
    contract its lane axis against the window on the MXU (HIGHEST
    precision keeps f32 exact):  tmp[K,T,Q],
  * chunk-select with a masked reduce over the narrow Q lanes,
  * accumulate y[T] = sum_k vals[K,T] * xg[K,T] — all lane-major, no
    per-k transposes.

Blocks (b>1) run b^2 component passes using the [b, b, K, N] value planes.

Measured (v5e, FEM heat res=24, n=15.6k, nnz=189k): ~400 us/SpMV including
loop-harness overhead (~170 us floor), vs ~1700 us for the XLA gather path
— numerics exact to f32 (max rel err ~1e-7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import LANE, WindowedEll


def _fused_kernel(q_chunks: int, k_width: int, tile: int):
    q, k, t = q_chunks, k_width, tile

    def kernel(base_ref, q_ref, l_ref, v_ref, x_ref, out_ref):
        j = pl.program_id(0)
        base = base_ref[j]
        xw = x_ref[pl.ds(base, q), :]  # [Q, 128]
        xw_t = jnp.transpose(xw)  # [128, Q] — the only transpose
        l3 = l_ref[...][0]  # [K, T]
        q3 = q_ref[...][0]
        v3 = v_ref[...][0]
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (k, t, LANE), 2)
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (k, t, q), 2)
        oh_l = (l3[:, :, None] == iota_l).astype(jnp.float32)  # [K,T,128]
        tmp = jax.lax.dot_general(
            oh_l,
            xw_t,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [K, T, Q] — MXU does the cross-lane reduction
        sel = jnp.where(q3[:, :, None] == iota_q, tmp, 0.0)
        xg = jnp.sum(sel, axis=2)  # [K, T]
        y = jnp.sum(v3 * xg, axis=0)  # [T] lane-major
        out_ref[...] = y.reshape(1, 1, t)

    return kernel


def _planes_3d(w: WindowedEll, component):
    """[K, N] planes -> [n_tiles, K, T] blocks (host-side reshape cached on
    device happens once because WindowedEll arrays are stable)."""
    p_, q_ = component
    k, n_pad = w.qsel.shape
    t = w.tile
    n_tiles = n_pad // t
    qs = w.qsel.reshape(k, n_tiles, t).transpose(1, 0, 2)
    ls = w.lsel.reshape(k, n_tiles, t).transpose(1, 0, 2)
    vs = w.vals[p_, q_].reshape(k, n_tiles, t).transpose(1, 0, 2)
    return qs, ls, vs, n_tiles


@partial(jax.jit, static_argnames=("interpret", "component"))
def windowed_spmv_pallas_scalar(
    w: WindowedEll,
    x: jax.Array,  # [N] or [N, 1] fp32
    component: Optional[tuple] = None,
    interpret: bool = False,
) -> jax.Array:
    """Scalar (b=1 plane) windowed SpMV via the fused Pallas kernel."""
    comp = component or (0, 0)
    k, n_pad = w.qsel.shape
    t = w.tile
    qn = w.q_chunks
    qs, ls, vs, n_tiles = _planes_3d(w, comp)
    n_chunks = -(-w.n_nodes // LANE) + qn
    xf = jnp.zeros((n_chunks * LANE,), jnp.float32)
    xf = xf.at[: w.n_nodes].set(x.reshape(-1).astype(jnp.float32))
    xc = xf.reshape(n_chunks, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, t), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, t), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, t), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x chunks, fully resident
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    # x64 mode makes index-map constants i64, which Mosaic cannot legalize;
    # the kernel is pure 32-bit, so trace it with x64 disabled.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _fused_kernel(qn, k, t),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, t), jnp.float32),
            interpret=interpret,
        )(w.chunk_base, qs, ls, vs, xc)
    return out.reshape(n_pad)[: w.n_nodes]


def windowed_spmv_pallas(
    w: WindowedEll, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Block windowed SpMV: y[:, p] = sum_q scalar_kernel(vals[p,q], x[:, q])."""
    b = w.vals.shape[0]
    if b == 1:
        y = windowed_spmv_pallas_scalar(w, x, interpret=interpret)
        return y.reshape(-1, 1).astype(x.dtype)
    cols = []
    for p in range(b):
        acc = None
        for q in range(b):
            part = windowed_spmv_pallas_scalar(
                w, x[:, q], component=(p, q), interpret=interpret
            )
            acc = part if acc is None else acc + part
        cols.append(acc)
    return jnp.stack(cols, axis=1).astype(x.dtype)
