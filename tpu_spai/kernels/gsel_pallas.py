"""Pallas TPU kernel for the gsel (hardware dynamic-gather) SpMV.

See `gsel.py` for the scheme. Each grid step processes one group of G row
tiles with exactly three dense ops — per-op overhead amortized over the
whole group:

    op = onehot @ x_window            # [GK',Qg]@[Qg,128] chunk select, MXU
                                      # (exact: one-hot rows copy f32 lanes)
    g  = take_along_axis(op, lidx, 1) # tpu.dynamic_gather, ~66 G elem/s
    y  = (vals*g).reshape(G,K',T).sum(1)   # VPU multiply + sublane reduce

x is fully VMEM-resident in chunked [n_chunks, 128] form (a 1 M-row
vector is ~0.5 MB — sparse-solver sizes never pressure VMEM); the
grouped-ELL planes stream through the grid pipeline.

Replaces the reference's CUDA SpMV inside pymathprim's CG
(neural_cg/utils/validate.py:54-121) as the production TPU matvec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gsel import LANE, GselPlanes, _chunked_x


def _kernel(group: int, qg: int, kp: int, tile: int):
    def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
        s = pl.program_id(0)
        base = base_ref[s]
        xw = x_ref[pl.ds(base, qg), :]  # [Qg, 128]
        oh = oh_ref[...].astype(jnp.float32)  # [GK', Qg]
        op = jax.lax.dot_general(
            oh,
            xw,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [GK', 128] — exact lane copies
        gv = jnp.take_along_axis(op, l_ref[...], axis=1)  # hw lane gather
        prod = (v_ref[...] * gv).reshape(group, kp, tile)
        out_ref[...] = jnp.sum(prod, axis=1)  # [G, T]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gsel_spmv_pallas(
    g: GselPlanes,
    x: jax.Array,  # [n_cols] or [n_cols, 1] — any float dtype, f32 compute
    interpret: bool = False,
) -> jax.Array:
    """y = A @ x via the gsel Pallas kernel. Returns [n_rows] in x.dtype."""
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    gk = grp * kp
    n_steps = g.n_steps
    xc = _chunked_x(g, x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, gk, qg), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x chunks, resident
        ],
        out_specs=pl.BlockSpec(
            (1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def squeeze_kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
        inner = _kernel(grp, qg, kp, t)
        inner(
            base_ref,
            oh_ref.at[0],
            l_ref.at[0],
            v_ref.at[0],
            x_ref,
            out_ref.at[0],
        )

    # the kernel is pure 32-bit; trace with x64 disabled so index-map
    # constants stay i32 (Mosaic cannot legalize i64)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            squeeze_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_steps, grp, t), jnp.float32),
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, g.vals, xc)
    return out.reshape(-1)[: g.n_rows].astype(x.dtype)
