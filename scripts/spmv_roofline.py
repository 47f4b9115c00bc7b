"""Isolated gsel-SpMV roofline measurement on the real TPU.

VERDICT round-2 item 1: bench.py used to *infer* SpMV cost as 0.8x a CG
iteration; this script measures the kernel in isolation and reports the
achieved HBM bandwidth over the bytes the kernel actually streams.

Protocol (CLAUDE.md env rules): R SpMVs chained inside ONE jitted
`lax.scan` (power iteration — the matrix is prescaled by 1/||A||_inf so
iterates stay bounded and no per-step normalization is needed), host
fetch forces execution, per-SpMV cost = (minT(R2) - minT(R1)) / (R2-R1)
with min-of-N at both endpoints (relay/worker interference is additive).

Streamed bytes per SpMV (HBM -> VMEM plane traffic + y writeback):
  onehot  S * GK' * (W*NG*Qg)  int8
  lidx    S * GK' * T          int8
  vals    S * GK' * T          f32      (x is VMEM-resident: no HBM reads)
  y out   S * G * T            f32
plus the inter-SpMV rechunk copy (row layout -> chunk layout, ~3n f32
moves) that production CG also pays; its share is measured separately by
timing a rechunk-only chain.

Usage: timeout 900 python scripts/spmv_roofline.py [--sizes 24,48]
Writes output/roofline/spmv_roofline.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0  # v5e


def build_heat(res):
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    return ap


def plane_bytes(g):
    b_in = g.onehot.size + g.lidx.size + g.vals.size * 4
    b_out = g.n_steps * g.group * g.tile * 4
    return b_in, b_out


def measure_chain(fn, r1, r2, reps=7):
    """min-of-N differenced per-step seconds for a chained program."""
    np.asarray(fn(r2))  # compile + warm both endpoints
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
    ap.add_argument("--out", default="output/roofline/spmv_roofline.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_spai  # noqa: F401
    from tpu_spai.solver import build_gsel_csr
    from tpu_spai.kernels.gsel_pallas import gsel_spmv_pallas

    dev = jax.devices()[0]
    print(f"device: {dev}")
    results = []
    for res in [int(s) for s in args.sizes.split(",")]:
        a = build_heat(res)
        n, nnz = a.shape[0], a.nnz
        # prescale: spectral radius <= 1 so the power chain stays bounded
        s = 1.0 / np.abs(a).sum(axis=1).max()
        a_s = (a * s).tocsr()
        g = build_gsel_csr(a_s)
        if g is None:
            print(f"res={res}: unbandable, skipped")
            continue
        b_in, b_out = plane_bytes(g)
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(n), jnp.float32
        )

        from functools import partial

        @partial(jax.jit, static_argnums=1)
        def chain(x, r):
            def body(xc, _):
                return gsel_spmv_pallas(g, xc), None

            y, _ = jax.lax.scan(body, x, None, length=r)
            return y

        @partial(jax.jit, static_argnums=1)
        def rechunk_only(x, r):
            # the inter-SpMV layout shuffle alone: pad to chunk layout and
            # slice back (same jnp ops gsel_spmv_pallas runs around the
            # kernel), with a scale to keep the loop non-collapsible
            from tpu_spai.kernels.gsel import _chunked_x

            def body(xc, _):
                xck = _chunked_x(g, xc * jnp.float32(0.9999))
                return xck.reshape(-1)[:n], None

            y, _ = jax.lax.scan(body, x, None, length=r)
            return y

        r1, r2 = (100, 2100) if n < 50_000 else (50, 650)
        chain_l = lambda m: chain(x0, m)  # noqa: E731
        t_spmv = measure_chain(chain_l, r1, r2)
        t_rechunk = measure_chain(lambda m: rechunk_only(x0, m), r1, r2)
        t_kernel = t_spmv - t_rechunk

        bytes_total = b_in + b_out
        gbps_e2e = bytes_total / t_spmv / 1e9
        gbps_kernel = bytes_total / t_kernel / 1e9
        row = {
            "res": res,
            "n": n,
            "nnz": nnz,
            "slots": int(g.slots),
            "slot_inflation": round(g.slots / nnz, 3),
            "k_width": g.k_width,
            "q_chunks": g.q_chunks,
            "group": g.group,
            "streamed_mb_per_spmv": round(bytes_total / 1e6, 3),
            "spmv_us": round(t_spmv * 1e6, 2),
            "rechunk_us": round(t_rechunk * 1e6, 2),
            "kernel_us": round(t_kernel * 1e6, 2),
            "gbps_e2e": round(gbps_e2e, 1),
            "gbps_kernel": round(gbps_kernel, 1),
            "roofline_frac_e2e": round(gbps_e2e / HBM_GBPS, 4),
            "roofline_frac_kernel": round(gbps_kernel / HBM_GBPS, 4),
        }
        results.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"hbm_gbps": HBM_GBPS, "rows": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
