"""In-process A/B of gsel SpMV kernel optimization candidates (round 2).

Variants (all timed in ONE process, chained-scan differencing, so the
shared-worker phase cannot fake a ranking):
  base      current production kernel
  par       + dimension_semantics=("parallel",) (grid steps independent)
  cost      + CostEstimate with true bytes_accessed (pipeline hinting)
  subg      replace the one-hot chunk-select MXU matmul with a SUBLANE
            dynamic gather (take_along_axis axis=0) from the x window —
            kills the [GK',Qg]@[Qg,128] matmul + its op materialization;
            qidx rides a second int8 plane
  w2        window=2 planes (K'=maxdeg, half the slots, 2 gathers)

Usage: timeout 1200 python scripts/spmv_opt_ab.py [--sizes 24,48]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_chain(fn, r1, r2, reps=7):
    np.asarray(fn(r2))
    np.asarray(fn(r1))
    ts = {r1: [], r2: []}
    for _ in range(reps):
        for m in (r1, r2):
            t0 = time.perf_counter()
            np.asarray(fn(m))
            ts[m].append(time.perf_counter() - t0)
    return (min(ts[r2]) - min(ts[r1])) / (r2 - r1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="24,48")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tpu_spai  # noqa: F401
    from tpu_spai.kernels.gsel import LANE, build_gsel, _chunked_x
    from tpu_spai.kernels.gsel_pallas import (
        _chunk_select_gather,
        _plane_specs,
    )
    from tpu_spai.solver.gsel_solver import build_gsel_csr
    from scripts.spmv_roofline import build_heat, plane_bytes

    def make_spmv(g, variant):
        kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
        ng, w = g.lane_groups, g.window
        gk = grp * kp
        n_steps = g.n_steps

        if variant == "subg":
            # qidx plane: chunk index per slot-row, replicated across lanes
            # (int8; Qg <= 127). Derive from the onehot host-side.
            oh = np.asarray(g.onehot)  # [S, GK', Qg] int8
            q_of = oh.argmax(axis=2).astype(np.int8)  # [S, GK']
            qidx = np.broadcast_to(q_of[:, :, None], (n_steps, gk, t)).copy()
            qidx_j = jnp.asarray(qidx)

            def kernel(base_ref, q_ref, l_ref, v_ref, x_ref, out_ref):
                s = pl.program_id(0)
                xw = x_ref[pl.ds(base_ref[s], qg), :]  # [Qg, 128]
                qi = q_ref[0].astype(jnp.int32)
                li = l_ref[0].astype(jnp.int32)
                g1 = jnp.take_along_axis(xw, qi, axis=0)  # sublane gather
                gv = jnp.take_along_axis(g1, li, axis=1)  # lane gather
                out_ref[0] = jnp.sum(
                    (v_ref[0] * gv).reshape(kp, grp, t), axis=0
                )

            specs = [
                pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gk, t), lambda s, *_: (s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ]
            args_extra = (qidx_j, g.lidx, g.vals)
        else:
            def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
                s = pl.program_id(0)
                oh = oh_ref[0].astype(jnp.float32)
                l_idx = l_ref[0].astype(jnp.int32)
                gv = _chunk_select_gather(
                    base_ref[s], oh, x_ref, l_idx, qg, ng, w
                )
                out_ref[0] = jnp.sum(
                    (v_ref[0] * gv).reshape(kp, grp, t), axis=0
                )

            specs = _plane_specs(gk, w * ng * qg, t) + [
                pl.BlockSpec(memory_space=pltpu.VMEM)
            ]
            args_extra = (g.onehot, g.lidx, g.vals)

        kwargs = {}
        if variant == "par":
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )
        if variant == "cost":
            b_in, b_out = plane_bytes(g)
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=2 * g.slots * (qg if variant != "subg" else 1),
                bytes_accessed=b_in + b_out,
                transcendentals=0,
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (1, grp, t), lambda s, *_: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )

        @jax.jit
        def spmv(xc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct(
                        (n_steps, grp, t), jnp.float32
                    ),
                    **kwargs,
                )(g.group_base, *args_extra, xc)

        def full(x):
            xc = _chunked_x(g, x)
            return spmv(xc).reshape(-1)[: g.n_rows]

        return full

    for res in [int(s) for s in args.sizes.split(",")]:
        a = build_heat(res)
        n = a.shape[0]
        s = 1.0 / np.abs(a).sum(axis=1).max()
        a_s = (a * s).tocsr()
        g1 = build_gsel_csr(a_s)
        g2 = build_gsel(a_s, group=g1.group, window=2)
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(n), jnp.float32
        )
        y_ref = None
        variants = {}
        for name in ("base", "par", "cost", "subg"):
            try:
                variants[name] = make_spmv(g1, name)
            except Exception as e:  # noqa: BLE001
                print(f"res={res} {name}: build failed: {e}")
        if g2 is not None:
            try:
                variants["w2"] = make_spmv(g2, "base")
            except Exception as e:  # noqa: BLE001
                print(f"res={res} w2: build failed: {e}")

        # correctness gate first (vs scipy), then chained timing
        x_np = np.asarray(x0, np.float64)
        y_np = a_s @ x_np
        rows = {}
        for name, fn in list(variants.items()):
            try:
                y = np.asarray(fn(x0), np.float64)
                err = np.linalg.norm(y - y_np) / np.linalg.norm(y_np)
                if not err < 1e-5:
                    print(f"res={res} {name}: WRONG (err={err:.2e}); skip")
                    del variants[name]
                    continue
                rows[name] = {"err": float(err)}
            except Exception as e:  # noqa: BLE001
                print(f"res={res} {name}: run failed: {type(e).__name__}: "
                      f"{str(e)[:200]}")
                del variants[name]

        r1, r2 = (100, 2100) if n < 50_000 else (50, 650)
        for rnd in range(3):  # interleaved rounds, min over rounds
            for name, fn in variants.items():
                @partial(jax.jit, static_argnums=1)
                def chain(x, r, fn=fn):
                    def body(xc, _):
                        return fn(xc), None
                    y, _ = jax.lax.scan(body, x, None, length=r)
                    return y
                t = measure_chain(lambda m: chain(x0, m), r1, r2, reps=3)
                cur = rows[name].get("us")
                rows[name]["us"] = round(
                    min(t * 1e6, cur) if cur else t * 1e6, 2
                )
        print(json.dumps({"res": res, "n": n, "rows": rows}))


if __name__ == "__main__":
    main()
