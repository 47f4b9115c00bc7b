"""Second-round gsel SpMV A/B: per-op ablation + group-size sweep.

Ablations keep the identical plane DMA and output write, removing one
compute stage at a time (results are WRONG — timing only):
  nomatmul   op materialized by broadcast instead of the chunk-select MXU
  nogather   consume op rows directly (no hardware lane gather)
  noreduce   write one [G,T] slice of the products (no K'-deep reduce)
Group sweep: G in {8, 16, 32} x window in {1, 2} — larger G cuts
per-step overhead, costs MACs via the wider Qg; w2 halves K'.

Usage: timeout 1800 python scripts/spmv_opt_ab2.py [--sizes 48]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_chain(fn, r1, r2, reps=3):
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
    ap.add_argument("--sizes", default="48")
    ap.add_argument("--groups", default="8,16,32")
    ap.add_argument("--no-ablate", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tpu_spai  # noqa: F401
    from tpu_spai.kernels.gsel import build_gsel, _chunked_x
    from tpu_spai.kernels.gsel_pallas import (
        _chunk_select_gather,
        _dot_oh,
        _plane_specs,
    )
    from scripts.spmv_roofline import build_heat, plane_bytes

    def make_spmv(g, ablate=None):
        kp, t, qg, grp = g.k_width, g.tile, g.q_chunks, g.group
        ng, w = g.lane_groups, g.window
        gk = grp * kp
        n_steps = g.n_steps

        def kernel(base_ref, oh_ref, l_ref, v_ref, x_ref, out_ref):
            s = pl.program_id(0)
            oh = oh_ref[0].astype(jnp.float32)
            l_idx = l_ref[0].astype(jnp.int32)
            xw = x_ref[pl.ds(base_ref[s], qg), :]
            if ablate == "nomatmul":
                op = jnp.broadcast_to(xw[0:1, :], (gk, t)) + oh[:, 0:1]
                gv = jnp.take_along_axis(op, l_idx & 127, axis=1)
            elif ablate == "nogather":
                if w == 2:
                    op = _dot_oh(oh[:, :qg], xw) + _dot_oh(oh[:, qg:], xw)
                else:
                    op = _dot_oh(oh, xw)
                gv = op + l_idx.astype(jnp.float32)
            else:
                gv = _chunk_select_gather(
                    base_ref[s], oh, x_ref, l_idx, qg, ng, w
                )
            if ablate == "noreduce":
                out_ref[0] = (v_ref[0, :grp] * gv[:grp])
            else:
                out_ref[0] = jnp.sum(
                    (v_ref[0] * gv).reshape(kp, grp, t), axis=0
                )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=_plane_specs(gk, w * ng * qg, t)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
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
                )(g.group_base, g.onehot, g.lidx, g.vals, xc)

        def full(x):
            xc = _chunked_x(g, x)
            return spmv(xc).reshape(-1)[: g.n_rows]

        return full

    for res in [int(s) for s in args.sizes.split(",")]:
        a = build_heat(res)
        n = a.shape[0]
        s = 1.0 / np.abs(a).sum(axis=1).max()
        a_s = (a * s).tocsr()
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(n), jnp.float32
        )
        y_np = a_s @ np.asarray(x0, np.float64)

        cases = {}
        for grp in [int(x) for x in args.groups.split(",")]:
            for w in (1, 2):
                try:
                    g = build_gsel(a_s, group=grp, window=w)
                    if g is None:
                        continue
                    b_in, b_out = plane_bytes(g)
                    cases[f"G{grp}w{w}"] = (g, b_in + b_out, None)
                except Exception as e:  # noqa: BLE001
                    print(f"G{grp}w{w}: build failed: {str(e)[:100]}")
        if not args.no_ablate:
            gbase = cases.get("G16w1", next(iter(cases.values())))[0]
            bb = plane_bytes(gbase)
            for ab in ("nomatmul", "nogather", "noreduce"):
                cases[f"abl_{ab}"] = (gbase, bb[0] + bb[1], ab)

        fns, rows = {}, {}
        for name, (g, byt, ab) in cases.items():
            try:
                fn = make_spmv(g, ab)
                if ab is None:
                    y = np.asarray(fn(x0), np.float64)
                    err = np.linalg.norm(y - y_np) / np.linalg.norm(y_np)
                    assert err < 1e-5, f"{name} err {err:.1e}"
                else:
                    np.asarray(fn(x0))  # just run
                fns[name] = fn
                rows[name] = {"mb": round(byt / 1e6, 2),
                              "steps": g.n_steps, "kp": g.k_width,
                              "qg": g.q_chunks}
            except Exception as e:  # noqa: BLE001
                print(f"{name}: failed: {type(e).__name__} {str(e)[:150]}")

        r1, r2 = (100, 2100) if n < 50_000 else (50, 650)
        for rnd in range(3):
            for name, fn in fns.items():
                @partial(jax.jit, static_argnums=1)
                def chain(x, r, fn=fn):
                    def body(xc, _):
                        return fn(xc), None
                    y, _ = jax.lax.scan(body, x, None, length=r)
                    return y
                t = measure_chain(lambda m: chain(x0, m), r1, r2)
                cur = rows[name].get("us")
                rows[name]["us"] = round(
                    min(t * 1e6, cur) if cur else t * 1e6, 2
                )
        for name, row in rows.items():
            row["gbps"] = round(row["mb"] / row["us"] * 1000, 0)
        print(json.dumps({"res": res, "n": n, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
