"""Pallas TPU kernel: gather-free windowed block SpMV.

The hot kernel of the framework (BASELINE: SpMV at speed-of-light). XLA's
dynamic gather on TPU is scalar-bound (~0.13 G elem/s measured on v5e), so
this kernel performs the sparse gather as dense selects (see
kernels/window.py for the scheme and host-side plane construction):

Per row tile (grid step j, T=128 rows, window of Q 128-lane chunks of x):
  * slice the tile's x-window from VMEM (x kept fully resident),
  * per ELL slot k (unrolled, schedulable in parallel):
      - chunk select on the MXU:  rows[T,128] = onehot_q[Q,T]^T @ xw[Q,128]
      - lane select on the VPU:   xg[T,1] = sum_c rows * onehot_l[T,128]
      - accumulate y += vals[:,k] * xg
  * one [K,T] transpose each for lsel/vals per tile (kept out of the k loop).

Block matrices (b>1) run b^2 component passes over the same kernel using
the [b, b, K, N] value planes — each pass is a scalar windowed SpMV.
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


def _windowed_kernel(q_chunks: int, k_width: int, tile: int):
    q, k, t = q_chunks, k_width, tile

    def kernel(base_ref, qsel_ref, lsel_ref, vals_ref, x_ref, out_ref):
        j = pl.program_id(0)
        base = base_ref[j]
        xw = x_ref[pl.ds(base, q), :]  # [Q, 128] window (VMEM slice)
        xw_t = jnp.transpose(xw)  # [128, Q] — once per tile
        qsel_t = jnp.transpose(qsel_ref[...])  # [T, K]
        lsel_t = jnp.transpose(lsel_ref[...])  # [T, K]
        vals_t = jnp.transpose(vals_ref[...])  # [T, K]
        iota_q = jax.lax.broadcasted_iota(jnp.int32, (t, q), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (t, LANE), 1)

        y = jnp.zeros((t, 1), jnp.float32)
        for kk in range(k):
            # lane select via the MXU (contraction over the 128 lanes does
            # the cross-lane reduction for free); HIGHEST keeps f32 exact
            oh_l = (lsel_t[:, kk : kk + 1] == iota_l).astype(jnp.float32)
            tmp = jax.lax.dot_general(
                oh_l,
                xw_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [T, Q]
            # chunk select: masked reduce over the (narrow) Q lanes
            oh_q = qsel_t[:, kk : kk + 1] == iota_q  # [T, Q] bool
            xg = jnp.sum(
                jnp.where(oh_q, tmp, 0.0), axis=1, keepdims=True
            )  # [T, 1]
            y = y + vals_t[:, kk : kk + 1] * xg
        # out block is [1, 8, T//8] (Mosaic-legal tiling of the row tile)
        out_ref[...] = y.reshape(1, 8, t // 8)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "component"))
def windowed_spmv_pallas_scalar(
    w: WindowedEll,
    x: jax.Array,  # [N] or [N, 1] fp32
    component: Optional[tuple] = None,
    interpret: bool = False,
) -> jax.Array:
    """Scalar (b=1 plane) windowed SpMV via the Pallas kernel.

    ``component``: (p, q) selecting a value plane for block matrices; the
    caller sums the b^2 component results (see `windowed_spmv_pallas`).
    """
    p_, q_ = component or (0, 0)
    vals = w.vals[p_, q_]  # [K, N]
    k, n_pad = vals.shape
    t = w.tile
    qn = w.q_chunks
    n_tiles = n_pad // t
    # x resident in VMEM, padded to whole chunks + window slack
    n_chunks = -(-w.n_nodes // LANE) + qn
    xf = jnp.zeros((n_chunks * LANE,), jnp.float32)
    xf = xf.at[: w.n_nodes].set(x.reshape(-1).astype(jnp.float32))
    xc = xf.reshape(n_chunks, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, t), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t), lambda j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x chunks, full
        ],
        out_specs=pl.BlockSpec(
            (1, 8, t // 8), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    # x64 mode makes index-map constants i64, which Mosaic cannot legalize;
    # the kernel is pure 32-bit, so trace it with x64 disabled.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _windowed_kernel(qn, k, t),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, t // 8), jnp.float32),
            interpret=interpret,
        )(w.chunk_base, w.qsel, w.lsel, vals, xc)
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
