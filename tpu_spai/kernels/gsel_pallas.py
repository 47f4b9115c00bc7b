"""Pallas TPU kernels for the gsel (hardware dynamic-gather) SpMV.

See `gsel.py` for the scheme. Each grid step processes one group of G row
tiles with three dense ops — per-op overhead amortized over the group:

    op = onehot @ x_window            # [GK',Qg]@[Qg,128] chunk select, MXU
                                      # (exact: one-hot rows copy f32 lanes)
    g  = take_along_axis(op, lidx, 1) # tpu.dynamic_gather, ~66 G elem/s
    y  = (vals*g).reshape(K',G,T).sum(0)   # VPU multiply + sublane reduce

x is fully VMEM-resident in chunked [n_chunks, 128] form (a 1 M-row
vector is ~0.5 MB — sparse-solver sizes never pressure VMEM); the
grouped-ELL planes stream through the grid pipeline. Slot rows are
k-major (row = k*G + g) so per-k [G, T] slices are addressable.

`gsel_spmv_ds_pallas` is the double-single (fp64-grade) variant: values
and x are (hi, lo) f32 pairs; per-slot products use a Veltkamp/Dekker
TwoProd and the K'-deep row reduction is a Kahan-compensated loop, so the
result carries ~2^-48 relative error at f32 kernel speed — TPUs emulate
real f64 at 10-30x cost, this costs ~3x. Replaces the reference's fp64
CUDA solves (neural_cg/utils/validate.py:27) for tight-tolerance sweeps.

Replaces the reference's CUDA SpMV inside pymathprim's CG
(neural_cg/utils/validate.py:54-121) as the production TPU matvec.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gsel import LANE, GselPlanes, _chunked_x, expand_window


def _plane_specs(gk: int, qg: int, t: int):
    return [
        pl.BlockSpec((1, gk, qg), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
    ]


def _dot_oh(oh, xw):
    return jax.lax.dot_general(
        oh,
        xw,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [GK', 128]


def _select_gather_window(xw, oh, l_raw, qg, ng=1, window=1):
    """op = onehot @ x_window (MXU, exact) ; g = lane-gather(op, lidx),
    on an ALREADY-SLICED [Qg, 128] window.

    window=2: two chunk-select dots against the SAME aligned x window
    (block 1 of the one-hot selects base_k+1 directly), two hw gathers,
    combined by the sub bit packed in bit 7 of the int8 lidx."""
    if window == 2:
        u = l_raw & 255  # undo int8 sign extension
        lane_i = u & 127
        sub = u >> 7
        g0 = jnp.take_along_axis(_dot_oh(oh[:, :qg], xw), lane_i, axis=1)
        g1 = jnp.take_along_axis(_dot_oh(oh[:, qg:], xw), lane_i, axis=1)
        return jnp.where(sub == 1, g1, g0)
    return jnp.take_along_axis(_dot_oh(oh, expand_window(xw, ng)), l_raw,
                               axis=1)


def _chunk_select_gather(base, oh, xc_ref, l_raw, qg, ng=1, window=1):
    """`_select_gather_window` with the window sliced from resident x."""
    return _select_gather_window(
        xc_ref[pl.ds(base, qg), :], oh, l_raw, qg, ng, window
    )


def batched_select_gather(xw, oh, li, nf, gk, ng=1, window=1, qg=None):
    """Feature-batched chunk-select + lane-gather for the slotted GNN
    kernels: xw [F, Qg, 128] (the group's x window, sliced or DMA'd by
    the caller), oh [GK', W*NG*Qg] f32, li [GK', T] i32 (raw int8 cast —
    bit 7 = sub when window=2). Returns gathered x_j [F, GK', T]."""
    qg = xw.shape[1] if qg is None else qg

    def one(ohp, xop):
        oh_b = jnp.broadcast_to(ohp[None], (nf,) + ohp.shape)
        op = jax.lax.dot_general(
            oh_b, xop, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [F, GK', 128]
        return op.reshape(nf * gk, LANE)

    if window == 2:
        u = li & 255
        lane2 = jnp.broadcast_to((u & 127)[None], (nf,) + li.shape).reshape(
            nf * gk, LANE
        )
        sub2 = jnp.broadcast_to((u >> 7)[None], (nf,) + li.shape).reshape(
            nf * gk, LANE
        )
        g0 = jnp.take_along_axis(one(oh[:, :qg], xw), lane2, axis=1)
        g1 = jnp.take_along_axis(one(oh[:, qg:], xw), lane2, axis=1)
        return jnp.where(sub2 == 1, g1, g0).reshape(nf, gk, LANE)
    xe = expand_window(xw, ng)
    li2 = jnp.broadcast_to(li[None], (nf,) + li.shape).reshape(nf * gk, LANE)
    gv = jnp.take_along_axis(one(oh, xe), li2, axis=1)
    return gv.reshape(nf, gk, LANE)


def window_or_stream(base, x_ref, qg, scratch):
    """Produce the group's x window [F, Qg, 128]: a VMEM slice when x is
    resident (scratch empty), or an inline DMA from HBM into scratch when
    streamed (scratch = (buf, dma_sem)). The window is ~0.5 MB vs tens of
    us of per-step compute, so an unoverlapped copy is free; streaming
    removes the resident-x VMEM footprint that capped the fused GNN at
    n ~ 250k (docs/PERF.md round-1n)."""
    if not scratch:
        return x_ref[:, pl.ds(base, qg), :]
    buf, sem = scratch
    cp = pltpu.make_async_copy(x_ref.at[:, pl.ds(base, qg), :], buf, sem)
    cp.start()
    cp.wait()
    return buf[...]


def _kernel(group: int, qg: int, kp: int, tile: int, ng: int = 1,
            window: int = 1):
    def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
        s = pl.program_id(0)
        oh = oh_ref[0].astype(jnp.float32)  # [GK', W*NG*Qg]
        l_idx = l_ref[0].astype(jnp.int32)  # lidx stored int8
        gv = _chunk_select_gather(base_ref[s], oh, x_ref, l_idx, qg, ng,
                                  window)
        prod = (v_ref[0] * gv).reshape(kp, group, tile)
        out_ref[0] = jnp.sum(prod, axis=0)  # [G, T]

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gsel_spmv_pallas(
    g: GselPlanes,
    x: jax.Array,  # [n_cols] or [n_cols, 1] — any float dtype, f32 compute
    interpret: bool = False,
) -> jax.Array:
    """y = A @ x via the gsel Pallas kernel. Returns [n_rows] in x.dtype."""
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    ng = g.lane_groups
    gk = grp * kp
    n_steps = g.n_steps
    xc = _chunked_x(g, x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=_plane_specs(gk, g.window * ng * qg, t)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],  # x chunks, resident
        out_specs=pl.BlockSpec(
            (1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    # the kernel is pure 32-bit; trace with x64 disabled so index-map
    # constants stay i32 (Mosaic cannot legalize i64)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel(grp, qg, kp, t, ng, g.window),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_steps, grp, t), jnp.float32),
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, g.vals, xc)
    return out.reshape(-1)[: g.n_rows].astype(x.dtype)


def _multi_kernel(group: int, qg: int, kp: int, tile: int, ng: int,
                  window: int, k: int, stream_x: bool):
    def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref, *scratch):
        s = pl.program_id(0)
        oh = oh_ref[0].astype(jnp.float32)  # [GK', W*NG*Qg]
        l_idx = l_ref[0].astype(jnp.int32)  # lidx stored int8
        v = v_ref[0]
        # the k columns UNROLL over the shared plane loads (onehot/lidx/
        # vals stay in VMEM registers across the loop — that's the
        # amortization); each column runs the proven plain 2-D select-dot.
        # A k-batched dot_general was measured 1.7x SLOWER per column at
        # n=117k (poor MXU mapping of the batch dim) — docs/PERF.md
        # round-1q.
        xw = window_or_stream(base_ref[s], x_ref, qg, scratch)  # [k, Qg, T]
        for j in range(k):
            gv = _select_gather_window(xw[j], oh, l_idx, qg, ng, window)
            out_ref[j, 0] = jnp.sum((v * gv).reshape(kp, group, tile), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gsel_spmv_multi_pallas(
    g: GselPlanes,
    xs: jax.Array,  # [k, n_cols] — k right-hand-side columns
    interpret: bool = False,
) -> jax.Array:
    """Multi-RHS SpMV: Y = A @ X^T for k column vectors in ONE plane pass.

    The grouped-ELL planes (onehot/lidx/vals — the HBM-bandwidth bound of
    the solve at production sizes) stream through the grid ONCE and are
    amortized over all k columns; the per-column extra work is one more
    chunk-select dot + lane gather + multiply-reduce against the already
    VMEM-resident planes. This is the capability the reference lacks: its
    multi-RHS datasets solve each rhs column as a separate sample
    (neural_cg/data.py:392-397, one pymathprim CG per column). Returns
    [k, n_rows] f32. x windows stream from HBM above STREAM bytes (same
    scheme as the fused GNN kernels)."""
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    ng = g.lane_groups
    gk = grp * kp
    n_steps = g.n_steps
    k = xs.shape[0]
    n_chunks = -(-g.n_cols // LANE) + qg
    xt = jnp.zeros((k, n_chunks * LANE), jnp.float32)
    xt = xt.at[:, : g.n_cols].set(xs.astype(jnp.float32))
    xc = xt.reshape(k, n_chunks, LANE)
    stream_x = xc.size * 4 > 2 * 2**20  # gnn/slotted.STREAM_X_BYTES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=_plane_specs(gk, g.window * ng * qg, t)
        + [pl.BlockSpec(memory_space=pl.ANY if stream_x else pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (k, 1, grp, t), lambda s, *_: (0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((k, qg, LANE), jnp.float32), pltpu.SemaphoreType.DMA]
            if stream_x
            else []
        ),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _multi_kernel(grp, qg, kp, t, ng, g.window, k, stream_x),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((k, n_steps, grp, t), jnp.float32),
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, g.vals, xc)
    return out.reshape(k, -1)[:, : g.n_rows].astype(xs.dtype)


def _row_blocks(g: GselPlanes, v: jax.Array) -> jax.Array:
    """[n] vector -> row-aligned [S, G, T] blocks (zero-padded)."""
    npad = g.n_steps * g.group * g.tile
    vp = jnp.zeros((npad,), jnp.float32).at[: g.n_rows].set(
        v.reshape(-1).astype(jnp.float32)
    )
    return vp.reshape(g.n_steps, g.group, g.tile)


def _dots_kernel(group, qg, kp, tile, ng, window, n_w, self_dot, fold,
                 n_steps):
    """SpMV + in-kernel dot partials (+ optional axpy fold).

    Computes y = A x per tile group; accumulates lane-wise Kahan partials
    of <w_j, y> for each streamed row array w_j (plus <y, y> when
    self_dot) in VMEM scratch across the sequential grid, emitting
    [2P, T] (sums then compensations) at the last step. With fold,
    y <- y + c * w_fold (the SPAI eps-axpy) before the dots — the scalar
    reductions of a CG iteration ride the SpMV kernels instead of
    separate XLA passes (docs/PERF.md round-1p)."""
    n_parts = n_w + (1 if self_dot else 0)

    def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, *rest):
        # rest: [c_ref if fold] [w_refs...] y_ref parts_ref acc comp
        i = 0
        c_ref = None
        if fold:
            c_ref = rest[0]
            i = 1
        w_refs = rest[i : i + n_w]
        y_ref, parts_ref, acc_ref, comp_ref = rest[i + n_w : i + n_w + 4]

        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        oh = oh_ref[0].astype(jnp.float32)
        l_idx = l_ref[0].astype(jnp.int32)
        gv = _chunk_select_gather(base_ref[s], oh, x_ref, l_idx, qg, ng,
                                  window)
        y = jnp.sum((v_ref[0] * gv).reshape(kp, group, tile), axis=0)
        ws = [w_refs[j][0] for j in range(n_w)]
        if fold:
            y = y + c_ref[0] * ws[-1]  # fold stream is the LAST w
        y_ref[0] = y

        ops = [(ws[j], y) for j in range(n_w)]
        if self_dot:
            ops.append((y, y))
        for j, (a, bb) in enumerate(ops):
            p = jnp.sum(a * bb, axis=0)  # [T] lane partial of this step
            acc = acc_ref[j]
            t_new = acc + p
            bv = t_new - acc
            comp_ref[j] = comp_ref[j] + ((acc - (t_new - bv)) + (p - bv))
            acc_ref[j] = t_new

        @pl.when(s == n_steps - 1)
        def _():
            parts_ref[0, :n_parts] = acc_ref[...]
            parts_ref[0, n_parts:] = comp_ref[...]

    return kernel


@partial(jax.jit, static_argnames=("self_dot", "has_fold", "interpret"))
def gsel_spmv_dots_pallas(
    g: GselPlanes,
    x: jax.Array,  # [n_cols] f32 (SpMV input)
    dot_rows: tuple,  # row vectors [n_rows] to dot against the output
    self_dot: bool = False,
    has_fold: bool = False,
    fold_coef=None,  # scalar; with has_fold, y += coef * dot_rows[-1]
    interpret: bool = False,
):
    """y = A x (+ coef*w_fold), plus f64-grade dot partials.

    Returns (y [n_rows], dots [P] f64) with P = len(dot_rows) +
    self_dot; dots[j] = <dot_rows[j], y> (after the fold), dots[-1] =
    <y, y> when self_dot. Partials are lane-Kahan f32 pairs combined in
    f64 — accuracy comparable to the chunk64 host dot."""
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    ng = g.lane_groups
    gk = grp * kp
    n_steps = g.n_steps
    xc = _chunked_x(g, x)
    n_w = len(dot_rows)
    n_parts = n_w + (1 if self_dot else 0)
    assert n_parts >= 1
    w_blocks = [_row_blocks(g, w) for w in dot_rows]

    blk = lambda: pl.BlockSpec(  # noqa: E731
        (1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM
    )
    # specs for: onehot, lidx, vals (plane stream) + resident x chunks
    in_specs = _plane_specs(gk, g.window * ng * qg, t) + [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x chunks
    ]
    args = [g.group_base, g.onehot, g.lidx, g.vals, xc]
    if has_fold:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.VMEM)  # coef [1] resident
        )
        args.append(jnp.asarray(fold_coef, jnp.float32).reshape(1))
    in_specs += [blk() for _ in range(n_w)]
    args += w_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=in_specs,  # group_base goes via scalar prefetch
        out_specs=[
            blk(),
            pl.BlockSpec((1, 2 * n_parts, t), lambda s, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_parts, t), jnp.float32),
            pltpu.VMEM((n_parts, t), jnp.float32),
        ],
    )
    with jax.enable_x64(False):
        y, parts = pl.pallas_call(
            _dots_kernel(grp, qg, kp, t, ng, g.window, n_w, self_dot,
                         has_fold, n_steps),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_steps, grp, t), jnp.float32),
                jax.ShapeDtypeStruct((1, 2 * n_parts, t), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
    sums = parts[0, :n_parts].astype(jnp.float64)
    comps = parts[0, n_parts:].astype(jnp.float64)
    dots = jnp.sum(sums, axis=1) + jnp.sum(comps, axis=1)  # [P] f64
    return y.reshape(-1)[: g.n_rows], dots


def _split(a):
    """Veltkamp split: a = ah + al with 12-bit halves (f32, exact)."""
    c = a * 4097.0
    ah = c - (c - a)
    return ah, a - ah


def _two_prod(a, b):
    """Dekker TwoProd: a*b = p + err exactly (f32)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _ds_kernel(group: int, qg: int, kp: int, tile: int, ng: int = 1,
               window: int = 1):
    def kernel(
        base_ref, oh_ref, l_ref, vh_ref, vl_ref, xh_ref, xl_ref,
        outh_ref, outl_ref, gh_ref, gl_ref,
    ):
        s = pl.program_id(0)
        base = base_ref[s]
        oh = oh_ref[0].astype(jnp.float32)
        l_idx = l_ref[0].astype(jnp.int32)
        # phase 1 (vectorized): gather hi/lo x per slot into VMEM scratch
        gh_ref[...] = _chunk_select_gather(
            base, oh, xh_ref, l_idx, qg, ng, window
        ).reshape(kp, group, tile)
        gl_ref[...] = _chunk_select_gather(
            base, oh, xl_ref, l_idx, qg, ng, window
        ).reshape(kp, group, tile)

        # phase 2: Kahan-compensated reduction over K' with TwoProd terms
        zeros = jnp.zeros((group, tile), jnp.float32)

        def body(k, carry):
            s_acc, c_acc, lo_acc = carry
            # slot rows are k-major (row = k*G + g): slice the k-th [G, T]
            vh = vh_ref[0, pl.ds(k * group, group)]
            vl = vl_ref[0, pl.ds(k * group, group)]
            gh = gh_ref[k]
            gl = gl_ref[k]
            p, err = _two_prod(vh, gh)
            lo_t = err + vh * gl + vl * gh
            # TwoSum(s_acc, p)
            t_new = s_acc + p
            bv = t_new - s_acc
            c_acc = c_acc + ((s_acc - (t_new - bv)) + (p - bv))
            return t_new, c_acc, lo_acc + lo_t

        s_acc, c_acc, lo_acc = jax.lax.fori_loop(
            0, kp, body, (zeros, zeros, zeros)
        )
        lo = c_acc + lo_acc
        hi = s_acc + lo  # renormalize the pair
        outh_ref[0] = hi
        outl_ref[0] = lo - (hi - s_acc)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gsel_spmv_ds_pallas(
    g: GselPlanes,
    x_hi: jax.Array,  # [n_cols] f32
    x_lo: jax.Array,  # [n_cols] f32
    interpret: bool = False,
):
    """Double-single SpMV: (A_hi+A_lo)(x_hi+x_lo) -> (y_hi, y_lo) with
    ~2^-48 relative error. Requires planes built with double_single=True."""
    assert g.vals_lo is not None, "build planes with double_single=True"
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    ng = g.lane_groups
    gk = grp * kp
    n_steps = g.n_steps
    xch = _chunked_x(g, x_hi)
    xcl = _chunked_x(g, x_lo)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=_plane_specs(gk, g.window * ng * qg, t)
        + [
            pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x hi chunks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x lo chunks
        ],
        out_specs=[
            pl.BlockSpec((1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, t), lambda s, *_: (s, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kp, grp, t), jnp.float32),
            pltpu.VMEM((kp, grp, t), jnp.float32),
        ],
    )
    with jax.enable_x64(False):
        yh, yl = pl.pallas_call(
            _ds_kernel(grp, qg, kp, t, ng, g.window),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_steps, grp, t), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, grp, t), jnp.float32),
            ],
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, g.vals, g.vals_lo, xch, xcl)
    nr = g.n_rows
    return yh.reshape(-1)[:nr], yl.reshape(-1)[:nr]
