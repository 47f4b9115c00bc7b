"""Fused Pallas message-passing layer: the whole MP round in one kernel.

The XLA slotted path (gnn/slotted.py) spends ~4.5 ms of its 5.1 ms
forward on HBM round trips between einsums — every Dense / norm / mask /
residual materializes [S, C, GK', T] plane tensors. This kernel keeps one
tile-group's planes VMEM-resident for the entire MP round:

  per grid step (G row tiles):
    gj   = lane-gather of ALL node-feature planes      (1 dot + 1 take)
    msg  = msg_mlp([x_i | x_j | e_f])   } first Dense computed per part
    e_f' = e_f + edge_mlp([x_i|x_j|e_f])} (norm commuted past the matmul,
    e_r' = e_r + edge_mlp([x_j|x_i|e_r])}  scale/bias folded into weights)
    agg  = sum_k msg                     (sublane reduce — the "scatter")

HBM traffic per layer: read e_f/e_r + write e_f'/e_r'/agg + plane indices
— everything else lives in VMEM. Matmuls run at DEFAULT (bf16 MXU)
precision like the XLA path. The node MLP, residual x update and the
tiny per-node tensors stay in XLA ([n, 16] — negligible). Weight folding
happens host-side in `fold_ffn`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.gsel import LANE, GselPlanes
from ..kernels.gsel_pallas import batched_select_gather, window_or_stream


class FoldedFFN(NamedTuple):
    """FeedForward weights with the pre-norm folded into Dense_0.

    w0 rows are scaled by the norm scale; `sw` and `bconst` carry the
    -mu*rs*sum(scale*W) and bias@W + b0 terms of the commuted norm
    (see gnn/slotted.py _ffn_planes_parts). Column vectors are [H, 1] so
    they broadcast against [H, M] inside the kernel.
    """

    w0: jax.Array  # [Cin_total, H] (scale-folded when has_norm)
    bconst: jax.Array  # [H, 1]
    sw: jax.Array  # [H, 1]
    w1: jax.Array  # [H, H]   Dense_1
    b1: jax.Array  # [H, 1]
    w2: jax.Array  # [H, Cout] Dense_2
    b2: jax.Array  # [Cout, 1]


def fold_ffn(p: dict):
    """Returns (FoldedFFN, has_norm) — has_norm stays a static python
    bool (it selects kernel code paths)."""
    from .slotted import _norm_params

    kind, np_ = _norm_params(p)
    assert kind in ("none", "layer"), "fused kernel supports none/layer norm"
    denses = sorted(
        (k for k in p if k.startswith("Dense_")), key=lambda k: int(k[6:])
    )
    assert len(denses) == 3, "fused kernel assumes the 2-layer FFN (3 denses)"
    k0 = jnp.asarray(p[denses[0]]["kernel"], jnp.float32)
    b0 = jnp.asarray(p[denses[0]]["bias"], jnp.float32)
    if kind == "layer":
        scale = jnp.asarray(np_["scale"], jnp.float32)
        bias = jnp.asarray(np_["bias"], jnp.float32)
        w0 = k0 * scale[:, None]
        sw = jnp.einsum("c,ch->h", scale, k0,
                        precision=jax.lax.Precision.HIGHEST)
        bconst = jnp.einsum("c,ch->h", bias, k0,
                            precision=jax.lax.Precision.HIGHEST) + b0
    else:
        w0 = k0
        sw = jnp.zeros((k0.shape[1],), jnp.float32)
        bconst = b0
    return (
        FoldedFFN(
            w0=w0,
            bconst=bconst[:, None],
            sw=sw[:, None],
            w1=jnp.asarray(p[denses[1]]["kernel"], jnp.float32),
            b1=jnp.asarray(p[denses[1]]["bias"], jnp.float32)[:, None],
            w2=jnp.asarray(p[denses[2]]["kernel"], jnp.float32),
            b2=jnp.asarray(p[denses[2]]["bias"], jnp.float32)[:, None],
        ),
        kind == "layer",
    )


def fused_vmem_per_slotlane(nf: int) -> float:
    """Scoped-VMEM bytes per slot-lane of the fused MP kernel, as a
    function of feature width. Calibrated on v5e compile reports at two
    widths: ~650 B at nf=16 (docs/PERF.md round-1n) and 17.65 MB at
    gk=38/t=128/nf=48 i.e. ~3700 B incl. streaming scratch
    (output/r20w48_infer.log — the w48 compile failure this model
    fixes). Linear term = live [nf, m] f32 plane tensors; quadratic
    term = the HIGHEST-precision matmul lowering's bf16-split scratch
    (scales with the [nf, nf] weight tile)."""
    return 22.4 * nf + 1.14 * nf * nf


def _fused_vmem_limit(nf, ce, h, gk, t, x_resident_bytes,
                      stacked: bool = False) -> int | None:
    """vmem_limit_bytes for the pallas_call, or None to keep the 16 MiB
    default (16-wide production grids stay byte-identical). 1.25x
    margin over the calibrated need; capped below v5e's 128 MiB so the
    double-buffered block windows still fit."""
    fmax = max(nf, ce, h)
    need = fused_vmem_per_slotlane(fmax) * gk * t + x_resident_bytes
    if stacked:
        # stage-1 stacking holds the [3H,M]/[2H,M]/[H,M] dot results
        # live simultaneously (~9H extra floats per slot-lane)
        need += 9 * h * 4 * gk * t
    if need <= 13.0 * 2**20:
        # comfortably inside the legacy budget (fused_safe_group
        # nf<=16): keep the default limit so proven grids stay
        # byte-identical
        return None
    # generous allowance: the byte model is per-grid-scheme calibrated
    # (ng=1/w2) and ng=8/w1 grids run ~30% hotter (r4_queue2 probe:
    # 19.75M actual at a 15.1M-modeled w16 ng8 shape) — headroom is
    # cheap, a compile-time OOM is a lost device row
    return min(max(int(need * 1.6), int(need) + 8 * 2**20), 112 * 2**20)


# FFN matmul precision (learned-weight contractions only — the gather
# dot stays HIGHEST: it is an exact selection and the kernel gate
# asserts it bit-exact). HIGHEST = 6-pass bf16 (f32+ semantics, the
# round-2 gate default); "high" = 3-pass (~1e-6-relative of f32, 2x
# fewer MXU passes). Overridable for on-chip A/B via
# TPU_SPAI_FFN_PRECISION=high|highest (scripts/r5_w48_fwd_ab.py).
import os as _os

_FFN_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("TPU_SPAI_FFN_PRECISION", "highest").lower()]


def _dotT(w, q):
    """[C, H]^T @ [C, M] -> [H, M] (contract dim 0)."""
    return jax.lax.dot_general(
        w, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_FFN_PRECISION,
    )


def _ffn_apply(w, parts, c_sizes, has_norm):
    """w: dict of weight VALUES; parts: [C_i, M] f32 -> [Cout, M]."""
    c_tot = sum(c_sizes)
    offs = np.cumsum([0] + list(c_sizes))
    out = None
    for q, o, c in zip(parts, offs[:-1], c_sizes):
        term = _dotT(w["w0"][o : o + c], q)
        out = term if out is None else out + term
    if has_norm:
        s1 = sum(jnp.sum(q, axis=0) for q in parts)  # [M]
        s2 = sum(jnp.sum(q * q, axis=0) for q in parts)
        mu = s1 / c_tot
        rs = jax.lax.rsqrt(s2 / c_tot - mu * mu + 1e-6)
        out = rs[None, :] * out - (rs * mu)[None, :] * w["sw"]
    x = jax.nn.gelu(out + w["bconst"])
    x = jax.nn.gelu(_dotT(w["w1"], x) + w["b1"])
    return _dotT(w["w2"], x) + w["b2"]


_W_FIELDS = ("w0", "bconst", "sw", "w1", "b1", "w2", "b2")


def _mp_kernel(nf, ce, kp, grp, t, qg, gk, msg_norm_flag, edge_norm_flag,
               edge_residual, emit_edges, ng=1, window=1, stream_x=False,
               stacked=False):
    m = gk * t
    mc = grp * t
    nw = len(_W_FIELDS)

    def kernel(base_ref, oh_ref, l_ref, mask_ref, xi_ref, ef_ref, er_ref,
               x_ref, *rest):
        wrefs = rest[: 2 * nw]
        off = 2 * nw
        if stacked:
            w0xi_r, w0gj_r, w0e_r, w0er_r = rest[off : off + 4]
            off += 4
        outs = rest[off : off + 3]
        scratch = rest[off + 3 :]
        agg_ref = outs[0]
        msg_w = {k: wrefs[i][...] for i, k in enumerate(_W_FIELDS)}
        edge_w = {k: wrefs[nw + i][...] for i, k in enumerate(_W_FIELDS)}

        s = pl.program_id(0)
        oh = oh_ref[0].astype(jnp.float32)  # [GK', W*NG*Qg]
        li = l_ref[0].astype(jnp.int32)  # stored int8
        xw = window_or_stream(base_ref[s], x_ref, qg, scratch)
        gj = batched_select_gather(xw, oh, li, nf, gk, ng, window)
        gj = gj.reshape(nf, m)  # [F, M] (k-major slots x lanes)

        # x_i: [F, G, T] -> broadcast over K' -> [F, M]
        xi_c = xi_ref[0].reshape(nf, 1, mc)
        xi = jnp.broadcast_to(xi_c, (nf, kp, mc)).reshape(nf, m)

        ef = ef_ref[0].reshape(ce, m)
        mask = mask_ref[0].reshape(1, m)

        if stacked and emit_edges:
            # wide-width stage-1 stacking (VERDICT r4 item 6): the three
            # FFNs' Dense_0 contractions share inputs — stack their
            # weights along the OUTPUT axis so each input part is
            # contracted ONCE into a [3H, M] result instead of three
            # narrow [H, M] dots (at H=48 each narrow dot uses ~48/128
            # of the MXU rows; the stacked dot fills them). Math is
            # identical per output element — only the dot grouping
            # changes.
            er = er_ref[0].reshape(ce, m)
            hh = msg_w["w1"].shape[0]
            dxi = _dotT(w0xi_r[...], xi)  # [3H, M]
            dgj = _dotT(w0gj_r[...], gj)
            de = _dotT(w0e_r[...], ef)  # [2H, M]
            der = _dotT(w0er_r[...], er)  # [H, M]
            pre_m = dxi[:hh] + dgj[:hh] + de[:hh]
            pre_f = dxi[hh : 2 * hh] + dgj[hh : 2 * hh] + de[hh:]
            pre_r = dxi[2 * hh :] + dgj[2 * hh :] + der
            if msg_norm_flag or edge_norm_flag:
                # shared pre-norm stats: msg and edge-fwd see the same
                # (xi, gj, ef) multiset; the reverse edge swaps ef->er
                # but keeps the xi+gj partial sums
                c_tot = 2 * nf + ce
                s1_xg = jnp.sum(xi, axis=0) + jnp.sum(gj, axis=0)
                s2_xg = jnp.sum(xi * xi, axis=0) + jnp.sum(gj * gj, axis=0)
                s1_f = s1_xg + jnp.sum(ef, axis=0)
                s2_f = s2_xg + jnp.sum(ef * ef, axis=0)
                mu_f = s1_f / c_tot
                rs_f = jax.lax.rsqrt(s2_f / c_tot - mu_f * mu_f + 1e-6)
            if msg_norm_flag:
                pre_m = rs_f[None, :] * pre_m - (rs_f * mu_f)[None, :] * (
                    msg_w["sw"]
                )
            if edge_norm_flag:
                pre_f = rs_f[None, :] * pre_f - (rs_f * mu_f)[None, :] * (
                    edge_w["sw"]
                )
                s1_r = s1_xg + jnp.sum(er, axis=0)
                s2_r = s2_xg + jnp.sum(er * er, axis=0)
                mu_r = s1_r / c_tot
                rs_r = jax.lax.rsqrt(s2_r / c_tot - mu_r * mu_r + 1e-6)
                pre_r = rs_r[None, :] * pre_r - (rs_r * mu_r)[None, :] * (
                    edge_w["sw"]
                )

            def _tail(w, pre):
                x1 = jax.nn.gelu(pre + w["bconst"])
                x1 = jax.nn.gelu(_dotT(w["w1"], x1) + w["b1"])
                return _dotT(w["w2"], x1) + w["b2"]

            msg = _tail(msg_w, pre_m) * mask
            h = msg.shape[0]
            agg_ref[0] = jnp.sum(msg.reshape(h, kp, mc), axis=1).reshape(
                h, grp, t
            )
            enf = _tail(edge_w, pre_f)
            enr = _tail(edge_w, pre_r)
            if edge_residual:
                enf = ef + enf
                enr = er + enr
            co = enf.shape[0]
            outs[1][0] = (enf * mask).reshape(co, gk, t)
            outs[2][0] = (enr * mask).reshape(co, gk, t)
            return

        msg = _ffn_apply(msg_w, (xi, gj, ef), (nf, nf, ce), msg_norm_flag)
        msg = msg * mask
        h = msg.shape[0]
        agg_ref[0] = jnp.sum(msg.reshape(h, kp, mc), axis=1).reshape(
            h, grp, t
        )

        if emit_edges:
            er = er_ref[0].reshape(ce, m)
            enf = _ffn_apply(edge_w, (xi, gj, ef), (nf, nf, ce),
                             edge_norm_flag)
            enr = _ffn_apply(edge_w, (gj, xi, er), (nf, nf, ce),
                             edge_norm_flag)
            if edge_residual:
                enf = ef + enf
                enr = er + enr
            co = enf.shape[0]
            outs[1][0] = (enf * mask).reshape(co, gk, t)
            outs[2][0] = (enr * mask).reshape(co, gk, t)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "msg_norm", "edge_norm", "edge_residual", "emit_edges", "interpret"
    ),
)
def fused_mp_layer(
    g: GselPlanes,
    mask: jax.Array,  # [S, GK', T] f32
    x: jax.Array,  # [n, F] node features
    ef: jax.Array,  # [S, Ce, GK', T]
    er: jax.Array,
    msg_ffn: FoldedFFN,
    edge_ffn: FoldedFFN,
    msg_norm: bool = True,
    edge_norm: bool = True,
    edge_residual: bool = True,
    emit_edges: bool = True,
    interpret: bool = False,
):
    """One MP round (or, with emit_edges=False and the decoder FFN as
    `msg_ffn`, a masked per-slot FFN+reduce). Returns
    (agg [n, H], ef' [S,Co,GK',T], er')."""
    nf = x.shape[1]
    ce = ef.shape[1]
    kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
    gk = grp * kp
    n_steps = g.n_steps
    n = g.n_rows
    n_chunks = -(-g.n_cols // LANE) + qg
    xt = jnp.zeros((nf, n_chunks * LANE), jnp.float32)
    xt = xt.at[:, : g.n_cols].set(x.T.astype(jnp.float32))
    xc = xt.reshape(nf, n_chunks, LANE)
    npad = n_steps * grp * t
    xp = jnp.zeros((npad, nf), jnp.float32).at[:n].set(x.astype(jnp.float32))
    xi = xp.reshape(n_steps, grp, t, nf).transpose(0, 3, 1, 2)

    h = msg_ffn.b2.shape[0]
    co = edge_ffn.b2.shape[0]

    def blk(c):
        nd = len(c)
        return pl.BlockSpec(
            (1,) + c, lambda s, *_, _nd=nd: (s,) + (0,) * _nd,
            memory_space=pltpu.VMEM,
        )

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    weights = [getattr(msg_ffn, k) for k in _W_FIELDS] + [
        getattr(edge_ffn, k) for k in _W_FIELDS
    ]
    # wide widths: stack the three Dense_0 contractions per input part
    # (see _mp_kernel). nf<=16 keeps the proven per-part path (and its
    # byte-identical production grids)
    stacked = (
        emit_edges and nf > 16
        and msg_ffn.w1.shape[0] == edge_ffn.w1.shape[0]
        and _os.environ.get("TPU_SPAI_FUSED_STACKED", "1") != "0"
    )
    if stacked:
        m0, e0 = msg_ffn.w0, edge_ffn.w0
        weights += [
            jnp.concatenate(
                [m0[:nf], e0[:nf], e0[nf : 2 * nf]], axis=1),  # xi
            jnp.concatenate(
                [m0[nf : 2 * nf], e0[nf : 2 * nf], e0[:nf]], axis=1),  # gj
            jnp.concatenate(
                [m0[2 * nf :], e0[2 * nf :]], axis=1),  # ef
            e0[2 * nf :],  # er
        ]
    ng = g.lane_groups
    from .slotted import STREAM_X_BYTES

    stream_x = xc.size * 4 > STREAM_X_BYTES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            blk((gk, g.window * ng * qg)),
            blk((gk, t)),
            blk((gk, t)),
            blk((nf, grp, t)),
            blk((ce, gk, t)),
            blk((ce, gk, t)),
            # x chunks: VMEM-resident when small, streamed per step when big
            pl.BlockSpec(memory_space=pl.ANY) if stream_x else full,
        ]
        + [full] * len(weights),
        out_specs=[
            blk((h, grp, t)),
            blk((co, gk, t)),
            blk((co, gk, t)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((nf, qg, LANE), jnp.float32),
             pltpu.SemaphoreType.DMA]
            if stream_x
            else []
        ),
    )
    kern = _mp_kernel(
        nf, ce, kp, grp, t, qg, gk, msg_norm, edge_norm,
        edge_residual, emit_edges, ng, g.window, stream_x, stacked,
    )
    # wide GNNs (w48) exceed the default 16 MiB scoped-VMEM limit —
    # raise it per-kernel from the calibrated byte model (VERDICT r3
    # item 1: the w48 parity models' fused path must compile)
    x_res = 0 if stream_x else xc.size * 4
    lim = _fused_vmem_limit(nf, ce, msg_ffn.w1.shape[0], gk, t, x_res,
                            stacked)
    cp = (
        None if lim is None
        else pltpu.CompilerParams(vmem_limit_bytes=lim)
    )
    with jax.enable_x64(False):
        agg, efo, ero = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_steps, h, grp, t), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, co, gk, t), jnp.float32),
                jax.ShapeDtypeStruct((n_steps, co, gk, t), jnp.float32),
            ],
            compiler_params=cp,
            interpret=interpret,
        )(g.group_base, g.onehot, g.lidx, mask, xi, ef, er, xc, *weights)
    agg_n = agg.transpose(0, 2, 3, 1).reshape(-1, h)[:n]
    return agg_n, efo, ero


def fold_dec_ffn(p: dict, ce: int, nf: int):
    """Fold the edge decoder and permute its Dense_0 rows from the flax
    input order [e | x_dst | x_src] to the kernel's fixed part order
    (x_dst-slot, x_src-slot, e) — after this, the same kernel call shapes
    serve both orientations (x_dst of the reversed edge IS the gathered
    x_j)."""
    ffn, has_norm = fold_ffn(p)
    w0 = jnp.concatenate(
        [ffn.w0[ce : ce + nf], ffn.w0[ce + nf : ce + 2 * nf], ffn.w0[:ce]],
        axis=0,
    )
    return ffn._replace(w0=w0), has_norm
