"""Device IC0 (level-scheduled SpTRSV) vs SPAI A/B on the real TPU.

VERDICT round-2 item 9: the round-1 stance 'IC stays host-only' becomes a
measured artifact. Compares, on FEM heat operators, one-dispatch device
PCG wall-clock and iterations for:
  * IC0 via two level-scheduled SpTRSV Pallas kernels per iteration
    (kernels/sptrsv.py)
  * SPAI (FSAI factor) via two fully-parallel gsel SpMVs per iteration
  * unpreconditioned CG
Writes output/ic_device_ab.json.

Usage: timeout 1800 python scripts/ic_device_ab.py [--sizes 20,24]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="20,24")
    ap.add_argument("--out", default="output/ic_device_ab.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import tpu_spai  # noqa: F401
    from tpu_spai.bench.roofline import build_heat
    from tpu_spai.kernels.sptrsv import IcPrec, build_ic_planes
    from tpu_spai.native import fsai, ic0
    from tpu_spai.solver import GselSpaiPrec, build_gsel_csr, pcg_gsel

    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    rows = []
    for res in [int(s) for s in args.sizes.split(",")]:
        a = build_heat(res)
        n = a.shape[0]
        xstar = np.random.default_rng(0).standard_normal(n)
        b = a @ xstar

        def timed(solve):
            r0 = solve()
            np.asarray(r0.x)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                r0 = solve()
                np.asarray(r0.x)
                walls.append(time.perf_counter() - t0)
            return min(walls), int(r0.iters), bool(r0.converged)

        row = {"res": res, "n": n}

        # IC0 in the padded level-major layout
        lfac = sp.csr_matrix(ic0(a))
        lfac.sort_indices()
        fwd, bwd, ppos = build_ic_planes(lfac)
        coo = a.tocoo()
        a_pad = sp.csr_matrix(
            (coo.data, (ppos[coo.row], ppos[coo.col])),
            shape=(fwd.n_pad, fwd.n_pad),
        )
        ga_ic = build_gsel_csr(a_pad)
        bp = np.zeros(fwd.n_pad, np.float32)
        bp[ppos] = b
        icprec = IcPrec(fwd, bwd, impl=impl)
        w, it, conv = timed(
            lambda: pcg_gsel(ga_ic, jnp.asarray(bp), prec=icprec,
                             rtol=1e-6, max_iter=n, dot_dtype="chunk64",
                             impl=impl)
        )
        row["ic"] = {"wall_ms": round(w * 1e3, 2), "iters": it,
                     "converged": conv, "levels": fwd.n_levels,
                     "us_per_iter": round(w * 1e6 / max(it, 1), 1)}

        # SPAI (FSAI factor) on the standard gsel path
        ga = build_gsel_csr(a)
        g_fac = sp.csr_matrix(fsai(a))
        gl = build_gsel_csr(sp.csr_matrix(g_fac.T).tocsr())
        glt = build_gsel_csr(g_fac)
        prec = GselSpaiPrec(gl, glt, jnp.float32(0.0))
        b32 = jnp.asarray(b, jnp.float32)
        w, it, conv = timed(
            lambda: pcg_gsel(ga, b32, prec=prec, rtol=1e-6, max_iter=n,
                             dot_dtype="chunk64", impl=impl)
        )
        row["spai_fsai"] = {"wall_ms": round(w * 1e3, 2), "iters": it,
                            "converged": conv,
                            "us_per_iter": round(w * 1e6 / max(it, 1), 1)}

        w, it, conv = timed(
            lambda: pcg_gsel(ga, b32, rtol=1e-6, max_iter=2 * n,
                             dot_dtype="chunk64", impl=impl)
        )
        row["none"] = {"wall_ms": round(w * 1e3, 2), "iters": it,
                       "converged": conv,
                       "us_per_iter": round(w * 1e6 / max(it, 1), 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
