"""Gather-select ("gsel") SpMV scheme: hardware dynamic-gather formulation.

Second-generation gather-free SpMV (supersedes the one-hot `window.py`
scheme on TPU; that path is kept as a fallback/reference). Motivation, as
measured on v5e: XLA's dynamic gather runs at ~0.13 G elem/s (scalar-unit
bound), the one-hot lane-select costs ~128 VPU elements of traffic per
nonzero, but Mosaic's `tpu.dynamic_gather` (reachable from Pallas via
``jnp.take_along_axis(op, idx, axis=1)``) gathers *within 128 lanes* at
~66 G elem/s — effectively vector-unit speed.

Scheme (replaces the reference's torch_scatter gather/scatter message
passing, neural_cg/nn/basic_layers.py:112-142, with a TPU-native design):

  1. Rows are tiled by T=128 and tiles batched in groups of G; a group's
     columns fall inside a window of ``Qg <= 128`` aligned 128-lane chunks
     of x starting at ``group_base[s]`` (RCM reordering bounds the
     bandwidth for FEM matrices; any matrix with n <= ~16k fits the window
     trivially, so the synthetic random family is covered too).
  2. Within a tile, edges are grouped by x-chunk: slot row k of a
     grouped-ELL grid [K', T] serves exactly one chunk; row t's neighbors
     in that chunk occupy consecutive k's. K' = max over tiles of
     sum_q max_t (count of row t's neighbors in chunk q) — measured
     2-6x nnz/row on FEM, ~2-20x on random; still far cheaper than the
     128-element one-hot per nonzero of the previous scheme.
  3. The whole group runs as THREE dense TPU-native ops per grid step
     (per-op overhead amortized over G*K' slot rows):
       op = onehot @ x_window           # [GK',Qg]@[Qg,128] MXU chunk select
       g  = take_along_axis(op, lidx, axis=1)    # hardware lane gather
       y  = (vals * g).reshape(G,K',T).sum(1)    # VPU multiply-reduce

Block matrices (BSR, block_size b>1) are handled by expanding to scalar
CSR on the host — one scalar pass instead of b^2 component passes.

This file: host-side plane construction + pure-XLA reference impl (CPU &
tests). The Pallas TPU kernel lives in `gsel_pallas.py`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GselPlanes:
    """Grouped-ELL planes for one sparse operator (see module docstring).

    onehot: int8 [S, G*K', NG*Qg] window-chunk one-hot per slot row
    lidx:   int8 [S, G*K', T]    lane index (< 128) of each slot's column
    vals:   f32  [S, G*K', T]    slot values (0 in padding)
    group_base: int32 [S]        first x-chunk of each group's window

    lidx is int8 deliberately: the plane stream is the SpMV bound at
    large n and i32 lane indices were 3 of its ~8 bytes/slot — measured
    ~7-15% whole-kernel win at n=117k (docs/PERF.md round-1j; the same
    study rejected expanding the one-hot in-kernel from a chunk map,
    which costs a lane->sublane broadcast per grid step).
    """

    onehot: jax.Array
    lidx: jax.Array
    vals: jax.Array
    group_base: jax.Array
    vals_lo: Optional[jax.Array] = None  # f32 tail planes (double-single)
    n_rows: int = _static(default=0)  # valid rows (pre-padding)
    n_cols: int = _static(default=0)  # x length
    tile: int = _static(default=LANE)
    group: int = _static(default=16)  # tiles per grid step (G)
    q_chunks: int = _static(default=8)  # Qg (padded group-window chunks)
    k_width: int = _static(default=1)  # K'
    lane_groups: int = _static(default=1)  # NG: chunks assigned per 128/NG lanes
    window: int = _static(default=1)  # W: chunks per slot row (see build_gsel)

    @property
    def n_steps(self) -> int:
        return self.vals.shape[0]

    @property
    def slots(self) -> int:
        return self.vals.shape[0] * self.vals.shape[1] * self.vals.shape[2]


def build_gsel(
    a,
    tile: int = LANE,
    group: int = 16,
    max_q: int = LANE,
    dtype=np.float32,
    double_single: bool = False,
    lane_groups: int = 1,
    window: int = 1,
) -> Optional[GselPlanes]:
    """Build gsel planes from a scipy-sparse-convertible matrix.

    Returns None when some tile group's column window exceeds ``max_q``
    128-chunks (caller falls back to another path). The matrix should be
    RCM-reordered first unless n <= max_q*128.

    ``double_single=True`` adds f32 tail planes ``vals_lo`` (vals stays the
    f32 head): vals + vals_lo represent the f64 entries to ~2^-48 — the
    storage for the double-single fp64-grade SpMV (gsel_spmv_ds_*).

    ``lane_groups=NG`` assigns each slot row one chunk PER 128/NG-lane
    group instead of per full row (onehot becomes [*, K', NG*Qg]; the
    kernels select against an NG-replicated lane-masked window). The
    per-chunk max is then taken over 128/NG rows, cutting the K' padding
    ~2-3x on FEM patterns — every downstream plane shrinks with it.

    ``window=2`` (requires lane_groups=1) gives each slot row a 2-chunk
    window [base_k, base_k+2) with one base shared across the tile
    (tile-coordinated greedy first-fit, csrc/gsel_assign.cpp): a row's
    neighbor clusters straddling a 128-lane chunk boundary no longer
    split into two slot rows, so K' reaches the max row degree on
    RCM-ordered FEM patterns (25 -> 13 on heat tet boxes — docs/PERF.md
    round-1l/1n). The sub-chunk bit packs into bit 7 of the int8 lidx
    (lane < 128 needs only 7 bits), onehot stores both blocks
    [*, K', 2*Qg]; kernels run two chunk-select dots + two lane gathers
    and combine with a select on the sub bit.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    a.sort_indices()
    n_rows, n_cols = a.shape
    coo = a.tocoo()
    row, col = coo.row, coo.col
    if double_single:
        v64 = coo.data.astype(np.float64)
        val = v64.astype(np.float32)
        val_lo = (v64 - val.astype(np.float64)).astype(np.float32)
    else:
        val = coo.data.astype(dtype)
        val_lo = None
    n_tiles = max(1, -(-n_rows // tile))
    n_steps = -(-n_tiles // group)
    n_tiles_pad = n_steps * group

    tid = row // tile
    gid = tid // group
    chunk = col // LANE
    lane = col % LANE

    # window base per GROUP (aligned to 8 chunks for the in-kernel slice)
    gbase = np.full(n_steps, np.iinfo(np.int64).max)
    np.minimum.at(gbase, gid, chunk)
    ghi = np.zeros(n_steps, np.int64)
    np.maximum.at(ghi, gid, chunk)
    occupied = np.zeros(n_steps, bool)
    occupied[gid] = True
    gbase = np.where(occupied, gbase & ~7, 0)
    q_need = int(np.where(occupied, ghi - gbase, 0).max()) + 1 if len(row) else 1
    qg = -(-q_need // 8) * 8
    if qg > max_q:
        return None

    relq = (chunk - gbase[gid]).astype(np.int64)

    ng = lane_groups
    assert LANE % ng == 0
    assert window in (1, 2), "window > 2 has no spare lidx bits"
    assert window == 1 or ng == 1, "window excludes lane_groups"
    lg_w = LANE // ng
    rint = row % tile
    if window == 2:
        # w-window scheme: tile-coordinated greedy first-fit in C++;
        # edges sorted chunk-major within tiles so bases coordinate.
        from ..native import gsel_window_fit

        order = np.lexsort((rint, relq, tid))
        t_o, q_o, r_o = tid[order], relq[order], rint[order]
        per_row = np.bincount(row, minlength=n_rows).max() if len(row) else 1
        max_k = int(per_row) + 8
        res = None
        while res is None:
            res = gsel_window_fit(
                t_o, q_o.astype(np.int32), r_o.astype(np.int32),
                n_tiles, window, tile, max_k,
            )
            if res is None:
                max_k *= 2
        slot_k, basemap, kprime = res
        sub_o = q_o - basemap[t_o, slot_k]  # in {0, 1}
        # onehot blocks: [:, :, s*qg + q] selects chunk base_k + s
        bm = basemap[:, :kprime].astype(np.int64)  # [n_tiles, K']
        bm_pad = np.full((n_tiles_pad, kprime), -1, np.int64)
        bm_pad[:n_tiles] = bm
        cols = np.arange(qg)[None, None, None, :]
        tgt = bm_pad[:, :, None, None] + np.arange(window)[None, None, :, None]
        onehot = (
            (bm_pad[:, :, None, None] >= 0) & (tgt == cols) & (tgt < qg)
        ).astype(np.int8).reshape(n_tiles_pad, kprime, window * qg)
    elif ng == 1:
        # single-chunk-per-slot-row construction: lexsort edges by
        # (tile, chunk, row-in-tile, col); slot-row k of an edge = its rank
        # within the (tile, chunk, row) group, offset by the tile's
        # running sum of per-chunk widths K_q.
        order = np.lexsort((col, rint, relq, tid))
        t_o, q_o, r_o = tid[order], relq[order], rint[order]
        grp = (t_o * (max_q + 1) + q_o) * tile + r_o
        new_grp = np.ones(len(grp), bool)
        new_grp[1:] = grp[1:] != grp[:-1]
        idx = np.arange(len(grp))
        start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        rank = idx - start
        tq = t_o * (max_q + 1) + q_o
        kq = np.zeros(n_tiles * (max_q + 1), np.int64)
        np.maximum.at(kq, tq, rank + 1)
        kq2 = kq.reshape(n_tiles, max_q + 1)
        koff = np.concatenate(
            [np.zeros((n_tiles, 1), np.int64), np.cumsum(kq2, axis=1)[:, :-1]],
            axis=1,
        )
        kprime = max(1, int(kq2.sum(axis=1).max()) if len(row) else 1)
        slot_k = koff[t_o, q_o] + rank
        qmap3 = np.zeros((n_tiles_pad, kprime, 1), np.int64)
        qmap3[t_o, slot_k, 0] = q_o
    else:
        # lane-group scheme: the kernel reads op[k, col_lane], so the chunk
        # map applies per the COLUMN's lane group; rows whose neighbors sit
        # in different chunks share slot rows — K' approaches max nnz/row.
        # Greedy first-fit assignment in C++ (csrc/gsel_assign.cpp).
        from ..native import gsel_first_fit

        lgid = lane // lg_w
        order = np.lexsort((rint, relq, lgid, tid))
        t_o, q_o, r_o = tid[order], relq[order], rint[order]
        lg_o = lgid[order].astype(np.int32)
        per_row = np.bincount(row, minlength=n_rows).max() if len(row) else 1
        max_k = int(per_row) * 2 + 8
        res = None
        while res is None:
            res = gsel_first_fit(
                t_o, lg_o, q_o.astype(np.int32), r_o.astype(np.int32),
                n_tiles, ng, tile, max_k,
            )
            if res is None:
                max_k *= 2
        slot_k, qmap_ff, kprime = res
        qmap3 = np.zeros((n_tiles_pad, kprime, ng), np.int64)
        qmap3[:n_tiles] = np.maximum(qmap_ff[:, :kprime, :], 0)

    lidx = np.zeros((n_tiles_pad, kprime, tile), np.int32)
    vals = np.zeros((n_tiles_pad, kprime, tile), dtype)
    lane_o = lane[order]
    if window == 2:
        lane_o = lane_o | (sub_o.astype(np.int64) << 7)  # pack sub in bit 7
    lidx[t_o, slot_k, r_o] = lane_o
    vals[t_o, slot_k, r_o] = val[order]
    vals_lo = None
    if val_lo is not None:
        vals_lo = np.zeros((n_tiles_pad, kprime, tile), np.float32)
        vals_lo[t_o, slot_k, r_o] = val_lo[order]

    if window == 1:
        # onehot [*, K', NG*Qg]: block lg holds the lane-group's chunk
        # one-hot; unset (k, lg) cells got chunk 0 — harmless, their slots
        # carry 0 vals
        onehot = (
            qmap3[:, :, :, None] == np.arange(qg)[None, None, None, :]
        ).astype(np.int8).reshape(n_tiles_pad, kprime, ng * qg)
    gk = group * kprime

    def kmajor(arr):
        # [S*G, K', ...] -> [S, K'*G, ...] with slot row = k*G + g, so the
        # kernels can address per-k [G, T] slices of a (1, K', G, T) block
        # with a dynamic (traced) k — K' is an untiled batch dim there.
        rest = arr.shape[2:]
        return np.ascontiguousarray(
            arr.reshape(n_steps, group, kprime, *rest).transpose(
                0, 2, 1, *range(3, 3 + len(rest))
            )
        ).reshape(n_steps, gk, *rest)

    return GselPlanes(
        onehot=jnp.asarray(kmajor(onehot)),
        lidx=jnp.asarray(kmajor(lidx).astype(np.int8)),
        vals=jnp.asarray(kmajor(vals)),
        vals_lo=None if vals_lo is None else jnp.asarray(kmajor(vals_lo)),
        group_base=jnp.asarray(gbase.astype(np.int32)),
        n_rows=n_rows,
        n_cols=n_cols,
        tile=tile,
        group=group,
        q_chunks=qg,
        k_width=kprime,
        lane_groups=lane_groups,
        window=window,
    )


def expand_window(xw: jax.Array, ng: int) -> jax.Array:
    """[Qg, 128] window -> [NG*Qg, 128] lane-masked replicas (the operand
    for the lane-group one-hot select; identity when ng == 1)."""
    if ng == 1:
        return xw
    qg = xw.shape[-2]
    lgw = LANE // ng
    lanes = jax.lax.broadcasted_iota(jnp.int32, (ng, LANE), 1) // lgw
    m = (lanes == jax.lax.broadcasted_iota(jnp.int32, (ng, LANE), 0)).astype(
        xw.dtype
    )  # [ng, 128]
    if xw.ndim == 2:
        return (xw[None] * m[:, None, :]).reshape(ng * qg, LANE)
    # batched [F, Qg, 128]
    f = xw.shape[0]
    return (xw[:, None] * m[None, :, None, :]).reshape(f, ng * qg, LANE)


def _chunked_x(g: GselPlanes, x: jax.Array) -> jax.Array:
    """Pad x to whole chunks + window slack: [n_chunks, 128]."""
    n_chunks = -(-g.n_cols // LANE) + g.q_chunks
    xf = jnp.zeros((n_chunks * LANE,), g.vals.dtype)
    xf = xf.at[: g.n_cols].set(x.reshape(-1).astype(g.vals.dtype))
    return xf.reshape(n_chunks, LANE)


def _select_gather_xla(g: GselPlanes, oh, li, xw, dtype):
    """Shared chunk-select + lane-gather for the XLA reference impls.
    oh [GK', W*NG*Qg] i8, li [GK', T] i8 (bit 7 = sub when window=2),
    xw [Qg, 128] already base-sliced. Returns [GK', T]."""
    qg = g.q_chunks
    if g.window == 2:
        li32 = li.astype(jnp.int32) & 255
        lane_i = li32 & 127
        sub = li32 >> 7
        ohf = oh.astype(dtype)
        op0 = jnp.dot(ohf[:, :qg], xw, precision=jax.lax.Precision.HIGHEST)
        op1 = jnp.dot(ohf[:, qg:], xw, precision=jax.lax.Precision.HIGHEST)
        g0 = jnp.take_along_axis(op0, lane_i, axis=1)
        g1 = jnp.take_along_axis(op1, lane_i, axis=1)
        return jnp.where(sub == 1, g1, g0)
    op = jnp.dot(
        oh.astype(dtype), expand_window(xw, g.lane_groups),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.take_along_axis(op, li.astype(jnp.int32), axis=1)


def gsel_spmv_xla(g: GselPlanes, x: jax.Array) -> jax.Array:
    """Reference implementation (CPU/tests): lax.scan over tile groups.

    x: [n_cols] (or [n_cols, 1]) -> y: [n_rows]. Mirrors the Pallas kernel
    op-for-op so numerics match bit-for-bit in f32.
    """
    xc = _chunked_x(g, x)
    qg = g.q_chunks
    grp, kp, t = g.group, g.k_width, g.tile

    def step_body(carry, inp):
        oh, li, v, base = inp  # [GK,W*NG*Qg] i8, [GK,T] i8, [GK,T] f32, scalar
        xw = jax.lax.dynamic_slice(xc, (base, jnp.int32(0)), (qg, LANE))
        gv = _select_gather_xla(g, oh, li, xw, g.vals.dtype)  # [GK, T]
        y = jnp.sum((v * gv).reshape(kp, grp, t), axis=0)  # [G, T]
        return carry, y

    _, ys = jax.lax.scan(
        step_body, None, (g.onehot, g.lidx, g.vals, g.group_base)
    )
    return ys.reshape(-1)[: g.n_rows].astype(x.dtype)


def gsel_spmv_multi_xla(g: GselPlanes, xs: jax.Array) -> jax.Array:
    """Reference multi-RHS SpMV (CPU/tests): xs [k, n_cols] -> [k, n_rows].
    vmap of the single-column scan — per-column reduction order is
    identical to `gsel_spmv_xla`, so columns match it bit-for-bit in f32."""
    return jax.vmap(lambda v: gsel_spmv_xla(g, v))(xs)


def gsel_spmv_ds_xla(g: GselPlanes, x_hi: jax.Array, x_lo: jax.Array):
    """Reference double-single SpMV (CPU/tests): computes the product in
    real f64 over the same slot grid and splits the result into an f32
    (hi, lo) pair — the quantity `gsel_spmv_ds_pallas` approximates to
    ~2^-48 relative error."""
    assert g.vals_lo is not None
    qg = g.q_chunks
    grp, kp, t = g.group, g.k_width, g.tile
    n_chunks = -(-g.n_cols // LANE) + qg
    x64 = jnp.zeros((n_chunks * LANE,), jnp.float64)
    x64 = x64.at[: g.n_cols].set(
        x_hi.reshape(-1).astype(jnp.float64) + x_lo.reshape(-1).astype(jnp.float64)
    )
    xc = x64.reshape(n_chunks, LANE)

    def step_body(carry, inp):
        oh, li, vh, vl, base = inp
        xw = jax.lax.dynamic_slice(xc, (base, jnp.int32(0)), (qg, LANE))
        gv = _select_gather_xla(g, oh, li, xw, jnp.float64)
        v64 = vh.astype(jnp.float64) + vl.astype(jnp.float64)
        y = jnp.sum((v64 * gv).reshape(kp, grp, t), axis=0)
        return carry, y

    _, ys = jax.lax.scan(
        step_body, None, (g.onehot, g.lidx, g.vals, g.vals_lo, g.group_base)
    )
    y64 = ys.reshape(-1)[: g.n_rows]
    y_hi = y64.astype(jnp.float32)
    y_lo = (y64 - y_hi.astype(jnp.float64)).astype(jnp.float32)
    return y_hi, y_lo


def gsel_spmv_f64_xla(g: GselPlanes, x64: jax.Array) -> jax.Array:
    """True-f64 SpMV over the slot grid (host/CPU meshes): native f64
    accumulation; A values are ``vals + vals_lo`` when the lo planes
    exist (f64-exact double-single reconstruction) else the f32 vals
    promoted exactly. Unlike `gsel_spmv_ds_xla` the input and result
    stay f64 (no pair split, no x truncation) — the building block of
    `dist_pcg_gsel_f64`, the honest tier on platforms where ds pair
    arithmetic collapses under XLA:CPU fusion (see kernels/ds.py)."""
    qg = g.q_chunks
    grp, kp, t = g.group, g.k_width, g.tile
    n_chunks = -(-g.n_cols // LANE) + qg
    xbuf = jnp.zeros((n_chunks * LANE,), jnp.float64)
    xbuf = xbuf.at[: g.n_cols].set(x64.reshape(-1).astype(jnp.float64))
    xc = xbuf.reshape(n_chunks, LANE)
    has_lo = g.vals_lo is not None

    def step_body(carry, inp):
        if has_lo:
            oh, li, vh, vl, base = inp
            v64 = vh.astype(jnp.float64) + vl.astype(jnp.float64)
        else:
            oh, li, vh, base = inp
            v64 = vh.astype(jnp.float64)
        xw = jax.lax.dynamic_slice(xc, (base, jnp.int32(0)), (qg, LANE))
        gv = _select_gather_xla(g, oh, li, xw, jnp.float64)
        y = jnp.sum((v64 * gv).reshape(kp, grp, t), axis=0)
        return carry, y

    ins = (
        (g.onehot, g.lidx, g.vals, g.vals_lo, g.group_base)
        if has_lo
        else (g.onehot, g.lidx, g.vals, g.group_base)
    )
    _, ys = jax.lax.scan(step_body, None, ins)
    return ys.reshape(-1)[: g.n_rows]
