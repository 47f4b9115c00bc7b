"""One-dispatch neural-preconditioner construction (+ optional fused
solve) on the slot layout.

Round-3 finding (output/r3_relay_cost.json): every dispatched program
through the axon relay costs ~22.5 ms wall-clock regardless of size —
the round-2 construct() path (one jitted GNN forward plus ~6 eager XLA
ops, each its own dispatch) measured 58.5 ms while the actual device
compute is 6.9 ms (output/r3_prec_profile.json). The fixes:

  * `SlotConstructor.construct()` — the ENTIRE construction (slotted GNN
    forward -> block-plane expansion -> mask/scale folds) as ONE jitted
    program: one dispatch, and XLA fuses the expansion into the decoder
    epilogue;
  * `construct_and_solve()` — construction + the grouped-anchor rr/rds
    PCG in a SINGLE program: an end-to-end neural solve pays exactly one
    dispatch + one small fetch. This is the TPU analog of the
    reference's `workspace.py:195-205` construct-then-solve, minus the
    kernel-launch boundary (XLA fuses across it);
  * `timed_construct_ms()` — the honest construction cost: R constructs
    chained in one `lax.scan` with a data dependency (CSE-proof),
    min-of-N differenced, host-fetch forced (CLAUDE.md protocol;
    `block_until_ready` is a relay no-op).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.gsel_solver import GselSpaiPrec, _rr_run_grouped
from .slotted import slotted_gnn_forward
from .slotted_block import BlockSlotLayout, _take_lanes


@partial(jax.jit, static_argnames=("gnn_impl", "bb"))
def _construct(params, sgb, perm_f, perm_r, gf_f, gf_r, lmask, xp, e_f,
               e_r, sf, af, sr, ar, gnn_impl, bb):
    _, pf, pr = slotted_gnn_forward(
        params, sgb, xp, e_f, e_r, impl=gnn_impl, out_channels=bb
    )
    if bb == 1:
        pf, pr = pf[:, None], pr[:, None]

    def flat(p):
        return p.transpose(0, 2, 3, 1).reshape(-1)

    shape = lmask.shape
    if gf_f is not None:
        # gsel-formulated expansion (round 4): windowed select-gather
        # instead of the 512 B/element row gather — 16 of the 28 ms
        # n=50k construction (output/r4_prec50k_profile.json)
        from ..solver.gsel_solver import gsel_matvec

        use = "pallas" if gnn_impl in ("pallas", "fused") else "xla"
        vf = gsel_matvec(gf_f, flat(pf), use).reshape(shape) * lmask
        vr = gsel_matvec(gf_r, flat(pr), use).reshape(shape) * lmask
    else:
        vf = _take_lanes(flat(pf), perm_f.reshape(-1)).reshape(shape) * lmask
        vr = _take_lanes(flat(pr), perm_r.reshape(-1)).reshape(shape) * lmask
    return vf * sf + af, vr * sr + ar


@partial(jax.jit, static_argnames=("gnn_impl", "bb", "reps"))
def _construct_chain(params, sgb, perm_f, perm_r, gf_f, gf_r, lmask,
                     xp, e_f, e_r, sf, af, sr, ar, gnn_impl, bb, reps):
    def body(xc, _):
        vf, vr = _construct(
            params, sgb, perm_f, perm_r, gf_f, gf_r, lmask, xc, e_f, e_r,
            sf, af, sr, ar, gnn_impl=gnn_impl, bb=bb,
        )
        # true data dependency the compiler cannot CSE away
        return xc + vf.ravel()[0] * 1e-30, vf.ravel()[0] + vr.ravel()[0]

    _, outs = jax.lax.scan(body, xp, None, length=reps)
    return outs[-1]


@partial(
    jax.jit,
    static_argnames=("gnn_impl", "bb", "impl", "a_ds", "prec_ds",
                     "k_inner"),
)
def _construct_solve(params, sgb, perm_f, perm_r, gf_f, gf_r, lmask, xp,
                     e_f, e_r, sf, af, sr, ar, pattern, g_a, b64, eps,
                     inv_diag, rtol, max_it, gnn_impl, bb, impl, a_ds,
                     prec_ds, k_inner):
    vf, vr = _construct(
        params, sgb, perm_f, perm_r, gf_f, gf_r, lmask, xp, e_f, e_r, sf,
        af, sr, ar, gnn_impl=gnn_impl, bb=bb,
    )
    if prec_ds:
        # full-ds escalation tier: the GNN emits f32 values, so the
        # factor's double-single lo planes are exact zeros
        zf = jnp.zeros_like(vf)
        lpl = dataclasses.replace(pattern, vals=vf, vals_lo=zf)
        ltp = dataclasses.replace(pattern, vals=vr, vals_lo=zf)
    else:
        lpl = dataclasses.replace(pattern, vals=vf)
        ltp = dataclasses.replace(pattern, vals=vr)
    prec = GselSpaiPrec(lpl, ltp, eps, inv_diag=inv_diag, impl=impl)
    return _rr_run_grouped(
        g_a, prec, b64, rtol, max_it, impl, k_inner, a_ds=a_ds,
        prec_ds=prec_ds,
    )


class SlotConstructor:
    """Host-side handle: layout + per-sample operands, device programs.

    Built once per (topology, sample); every method below is a single
    dispatched XLA program."""

    def __init__(self, layout: BlockSlotLayout, params, xp, e_f, e_r,
                 sf, af, sr, ar, gnn_impl: str, bb: int):
        self.layout = layout
        self.params = params
        self.ops = (xp, e_f, e_r, sf, af, sr, ar)
        self.gnn_impl = gnn_impl
        self.bb = bb

    def _args(self):
        lay = self.layout
        return (self.params, lay.sg, lay.perm_f, lay.perm_r, lay.gf_f,
                lay.gf_r, lay.mask, *self.ops)

    def construct(self):
        """(vals_fwd, vals_rev) factor planes — ONE dispatch."""
        return _construct(
            *self._args(), gnn_impl=self.gnn_impl, bb=self.bb
        )

    def timed_construct_ms(self, r1: int = 4, r2: int = 24,
                           reps: int = 5) -> float:
        """Honest per-construct milliseconds: chained-scan differencing
        with host-fetch forcing (relay dispatch cost cancels)."""
        def run(r):
            return np.asarray(_construct_chain(
                *self._args(), gnn_impl=self.gnn_impl, bb=self.bb, reps=r
            ))

        run(r2)
        run(r1)
        ts = {r1: [], r2: []}
        for _ in range(reps):
            for m in (r1, r2):
                t0 = time.perf_counter()
                run(m)
                ts[m].append(time.perf_counter() - t0)
        return (min(ts[r2]) - min(ts[r1])) / (r2 - r1) * 1e3

    def construct_and_solve(self, g_a, b64, epsilon: float,
                            rtol: float = 1e-6, max_iter: int = 1000,
                            impl: str = "pallas",
                            spmv_precision: str = "ds_a",
                            inv_diag: Optional[jax.Array] = None,
                            k_inner: int = 16):
        """Fused construction + grouped-anchor rr/rds PCG: one program.

        Returns (x64, iters, relres, converged, rebounds) device arrays
        — fetch x to force execution. ``rebounds > 0`` on the f32-A
        tier flags the bad-branch anchor-noise trajectory (docs/PERF.md
        round-4a); callers should re-run with spmv_precision='ds_a'."""
        assert g_a.vals_lo is not None, "build g_a with double_single=True"
        return _construct_solve(
            *self._args(), self.layout.pattern,
            g_a, b64.reshape(-1).astype(jnp.float64),
            jnp.float32(epsilon), inv_diag,
            jnp.float64(rtol), jnp.int32(max_iter),
            gnn_impl=self.gnn_impl, bb=self.bb, impl=impl,
            a_ds=spmv_precision in ("ds", "ds_a"),
            prec_ds=spmv_precision == "ds", k_inner=k_inner,
        )


def make_slot_constructor(layout: BlockSlotLayout, params, batch,
                          bperm: np.ndarray, scaled: bool,
                          impl: str, gnn_impl: Optional[str] = None
                          ) -> SlotConstructor:
    """Assemble per-sample operands for the fused constructor (the same
    host prep as cli/infer.py's slot path: permuted node feats, slot-
    scattered edge feats, mask/scale planes)."""
    from .slotted import slot_scatter
    from .slotted_block import scalar_scale_add

    n_valid = int(np.sum(np.asarray(batch.node_valid)))
    e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
    xp = jnp.asarray(np.asarray(batch.x)[:n_valid][bperm], jnp.float32)
    ea_v = np.asarray(batch.edge_attr)[:e_valid]
    m_dof = np.asarray(batch.mask)[:n_valid][bperm].reshape(-1)
    rsq = (
        np.asarray(batch.rsqrt_diag)[:n_valid][bperm].reshape(-1)
        if scaled
        else None
    )
    sgb = layout.sg
    e_f = slot_scatter(sgb, ea_v)
    e_r = slot_scatter(sgb, ea_v, reverse=True)
    sf, af, sr, ar = scalar_scale_add(layout, m_dof, rsq)
    bb = batch.block_size * batch.block_size
    if gnn_impl is None:
        gnn_impl = "fused" if impl == "pallas" else impl
    return SlotConstructor(
        layout, params, xp, e_f, e_r, sf, af, sr, ar, gnn_impl, bb
    )
