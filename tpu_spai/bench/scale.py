"""Row-dimension scalability sweep on the production gsel solve path.

Replaces the round-1 windowed-kernel sweep (docs/PERF.md "Scalability
sweep") with the current production configuration: gsel Pallas SpMV,
cost-model tile groups, lane_groups=1 solver planes, chunk64 dots —
plus honest-stopping residual-replacement (rr) and double-single (ds)
precision rows.
The reference's analog is the matrix-size axis of misc/plot_scalability.py
(sizes ~2k-32k); we sweep heat unit-box tets from n=4,913 to 117,649.

Per size it reports:
  * marginal us/iteration for unpreconditioned CG and SPAI-PCG
    (max_iter differencing — the axon relay constant cancels),
  * a converged rtol=1e-6 solve (iterations + wall time),
and writes `output/scale/all_infer_scale_gsel_6.csv` in the per-sample
CSV schema so misc-style plotting (analysis/plots.py plot_scalability)
consumes it unchanged.

Usage: python -m tpu_spai.bench.scale [--res 17,24,32,41,48] [--prec f32,rr]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def run(res_list, precisions, out_dir="output/scale", reps=5):
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from ..datagen.meshes import unit_box_tet
    from ..dist.partition import rcm_permutation
    from ..logging_utils import get_logger
    from ..native import laplacian, lumped_mass
    from ..solver import GselSpaiPrec, build_gsel_csr, pcg_gsel
    from ..solver.gsel_solver import GselSpaiPrecDS, pcg_gsel_rr

    log = get_logger()
    rows = []

    def per_iter(fn, n1=50, n2=450):
        np.asarray(fn(n2).x)
        ts = {}
        for _ in range(reps):
            for m in (n1, n2):
                t0 = time.perf_counter()
                np.asarray(fn(m).x)
                ts.setdefault(m, []).append(time.perf_counter() - t0)
        return (min(ts[n2]) - min(ts[n1])) / (n2 - n1)

    for res in res_list:
        nodes, elems = unit_box_tet(res, res, res)
        a = sp.csr_matrix(
            laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
        )
        perm = rcm_permutation(a)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        n = ap.shape[0]
        d = np.sqrt(ap.diagonal())
        lhat = sp.csr_matrix(sp.diags(1.0 / d) @ ap @ sp.diags(1.0 / d))
        # random ground truth (bench.py protocol) — b = A @ ones points
        # nearly along the Neumann-Laplacian null space and makes every
        # solve pathological (thousands of iterations)
        xstar = np.random.default_rng(0).standard_normal(n)
        b = jnp.asarray(ap @ xstar, jnp.float32)
        for prec_kind in precisions:
            ds = prec_kind == "ds"
            rr = prec_kind == "rr"
            g = build_gsel_csr(ap, double_single=ds or rr)
            gl = build_gsel_csr(lhat, double_single=ds)
            if g is None or gl is None:
                log.warning(f"res={res} {prec_kind}: unbandable, skipped")
                continue
            if rr:
                b64 = jnp.asarray(np.asarray(b), jnp.float64)
                solve = lambda m, pp=None: pcg_gsel_rr(  # noqa: E731
                    g, b64, prec=pp, rtol=1e-30 if m else 1e-6,
                    max_iter=m or 20000, impl="pallas",
                    # per-iteration timing study: forced-nonconverged
                    # runs (rtol=1e-30) would always "rebound" — the
                    # recovery retry must not pollute the timing
                    escalate_on_rebound=False,
                )
                pr = GselSpaiPrec(gl, gl, jnp.float32(3e-3))
            else:
                kw = dict(impl="pallas")
                if ds:
                    pr = GselSpaiPrecDS(gl, gl, jnp.float64(3e-3))
                    kw["precision"] = "ds"
                else:
                    pr = GselSpaiPrec(gl, gl, jnp.float32(3e-3))
                    kw["dot_dtype"] = "chunk64"
                    kw["mixed"] = prec_kind == "c64"
                solve = lambda m, pp=None: pcg_gsel(  # noqa: E731
                    g, b, prec=pp, rtol=1e-30 if m else 1e-6,
                    max_iter=m or 20000, **kw,
                )

            t_cg = per_iter(lambda m: solve(m))
            # SPAI stand-in factor = scaled A: per-iteration THROUGHPUT of
            # the 3-SpMV preconditioned workload only (it worsens
            # conditioning, so the converged solve below is unpreconditioned)
            t_pcg = per_iter(lambda m: solve(m, pr))
            r = solve(0)
            np.asarray(r.x)
            t0 = time.perf_counter()
            r = solve(0)
            np.asarray(r.x)
            wall = time.perf_counter() - t0
            it = int(r.iters)
            log.info(
                f"n={n} {prec_kind}: cg {t_cg*1e6:.1f} us/it, spai-pcg "
                f"{t_pcg*1e6:.1f} us/it; rtol=1e-6: {it} iters, "
                f"{wall*1e3:.1f} ms wall (converged={bool(r.converged)})"
            )
            rows.append(
                dict(
                    Key=f"SPAIiter-gsel-{prec_kind}-tpu",
                    **{
                        "Solve Time (ms)": round(t_pcg * 1e3, 6),
                        "Precond Time (ms)": 0.0,
                        "#Iteration": 1,
                        "Matrix Size": n,
                    },
                )
            )
            rows.append(
                dict(
                    Key=f"CG-gsel-{prec_kind}-tpu",
                    **{
                        "Solve Time (ms)": round(t_cg * it * 1e3, 4),
                        "Precond Time (ms)": 0.0,
                        "#Iteration": it,
                        "Matrix Size": n,
                    },
                )
            )

    import pandas as pd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    path = out / "all_infer_scale_gsel_6.csv"
    df.to_csv(path, index=False)
    log.info(f"wrote {path}")
    return df


def run_construct(res_list, out_dir="output/scale", reps=5):
    """NeuralSlot construction-time sweep: the fused slotted GNN forward
    (production 16-feature / 4-MP shape, auto grid scheme — docs/PERF.md
    round-1n/1o) timed per size by chained-scan differencing. Random
    params (construction cost is weight-value independent). Writes
    `all_infer_construct_6.csv` rows Key=NeuralSlot-construct-tpu."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from ..datagen.meshes import unit_box_tet
    from ..dist.partition import rcm_permutation
    from ..gnn.layers import NodeEdgeProcessing
    from ..gnn.slotted import (
        build_slot_graph,
        fused_safe_group,
        slot_scatter,
        slotted_gnn_forward,
    )
    from ..logging_utils import get_logger
    from ..native import laplacian, lumped_mass

    log = get_logger()
    rows = []
    for res in res_list:
        nodes, elems = unit_box_tet(res, res, res)
        a = sp.csr_matrix(
            laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
        )
        perm = rcm_permutation(a)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        coo = ap.tocoo()
        n = ap.shape[0]
        rng = np.random.default_rng(0)
        nf = jnp.asarray(rng.standard_normal((n, 2)).astype(np.float32))
        ef = coo.data.reshape(-1, 1).astype(np.float32)
        gnn = NodeEdgeProcessing(edge_out_features=1, num_mp_layers=4)
        ei = jnp.asarray(np.stack([coo.row, coo.col]).astype(np.int32))
        params = gnn.init(jax.random.key(0), nf, ei, jnp.asarray(ef))

        sg = build_slot_graph(coo.row, coo.col, coo.data, n)
        while True:
            from ..gnn.slotted import gnn_width_from_params

            gsafe = fused_safe_group(
                sg.pattern.k_width, sg.pattern.n_cols,
                nf=gnn_width_from_params(params),
                window=sg.pattern.window, q_chunks=sg.pattern.q_chunks,
            )
            if sg.pattern.group > gsafe:
                sg = build_slot_graph(coo.row, coo.col, coo.data, n,
                                      group=gsafe, window=sg.pattern.window)
            e_f = slot_scatter(sg, ef)
            e_r = slot_scatter(sg, ef, reverse=True)
            try:
                _, vf, _ = slotted_gnn_forward(params, sg, nf, e_f, e_r,
                                               impl="fused")
                np.asarray(vf)
                break
            except jax.errors.JaxRuntimeError as exc:
                gcur = sg.pattern.group
                if "Scoped allocation" not in str(exc) or gcur <= 1:
                    raise
                sg = build_slot_graph(coo.row, coo.col, coo.data, n,
                                      group=max(1, gcur // 2),
                                      window=sg.pattern.window)

        def chain(k):
            @jax.jit
            def f(x0):
                def body(x, _):
                    _, vf, _ = slotted_gnn_forward(params, sg, x, e_f, e_r,
                                                   impl="fused")
                    return x0 + 1e-20 * vf[0, 0, 0], None

                x, _ = jax.lax.scan(body, x0, None, length=k)
                return x

            return f

        short, long_ = (4, 24) if n > 60000 else (10, 60)
        fs, fl = chain(short), chain(long_)
        np.asarray(fl(nf))
        np.asarray(fs(nf))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); np.asarray(fs(nf))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(fl(nf))
            tl = time.perf_counter() - t0
            per = (tl - ts) / (long_ - short)
            best = per if best is None or per < best else best
        pat = sg.pattern
        log.info(
            f"n={n}: NeuralSlot construct {best*1e3:.2f} ms "
            f"(window={pat.window} ng={pat.lane_groups} K'={pat.k_width} "
            f"G={pat.group})"
        )
        rows.append(dict(
            Key="NeuralSlot-construct-tpu",
            **{
                "Solve Time (ms)": 0.0,
                "Precond Time (ms)": round(best * 1e3, 4),
                "#Iteration": 0,
                "Matrix Size": n,
            },
        ))

    import pandas as pd

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame(rows)
    path = out / "all_infer_construct_6.csv"
    df.to_csv(path, index=False)
    log.info(f"wrote {path}")
    return df


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="17,24,32,41,48")
    ap.add_argument("--prec", default="f32,rr")
    ap.add_argument("--out", default="output/scale")
    ap.add_argument("--construct", action="store_true",
                    help="sweep NeuralSlot construction time instead")
    args = ap.parse_args(argv)
    if args.construct:
        run_construct([int(r) for r in args.res.split(",")], args.out)
        return
    run(
        [int(r) for r in args.res.split(",")],
        [p for p in args.prec.split(",") if p],
        args.out,
    )


if __name__ == "__main__":
    main()
