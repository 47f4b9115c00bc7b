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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="17,24,32,41,48")
    ap.add_argument("--prec", default="f32,rr")
    ap.add_argument("--out", default="output/scale")
    args = ap.parse_args(argv)
    run(
        [int(r) for r in args.res.split(",")],
        [p for p in args.prec.split(",") if p],
        args.out,
    )


if __name__ == "__main__":
    main()
