"""Benchmark harness — runs on the real TPU chip; prints ONE JSON line.

Primary metric: SpMV effective-bandwidth fraction of the HBM roofline
(BASELINE.md acceptance: >=80% of roofline nnz/s for SpMV + SPAI apply).
Also measures SPAI-apply and full PCG-solve throughput and logs them to
stderr as context.

Byte accounting (fp32 scalar ELL SpMV): per nonzero we must move the value
(4B), the column index (4B) and the gathered x entry (4B), plus the row
output (4B/row) — the minimum traffic for an index-based SpMV. The
roofline fraction is min_bytes / (measured_time * HBM_BW).
"""

import json
import sys
import time

import numpy as np


HBM_GBPS = {
    # peak HBM bandwidth per chip (GB/s)
    "v5e": 819.0,
    "v5": 819.0,
    "v4": 1228.0,
    "v6e": 1640.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_time(fn, warmup=3, iters=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    import tpu_spai  # noqa: F401
    from tpu_spai.kernels import spmv, spai_apply
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.solver import pcg, jacobi_prec
    from tpu_spai.sparse import csr_to_graph
    import scipy.sparse as sp

    dev = jax.devices()[0]
    plat = getattr(dev, "device_kind", "unknown")
    bw = 819.0
    for k, v in HBM_GBPS.items():
        if k in str(plat).lower():
            bw = v
    log(f"device: {dev} ({plat}), assumed HBM BW {bw} GB/s")

    # FEM heat matrix, ~115k rows / ~1.7M nnz (the paper's problem class)
    nodes, elems = unit_box_tet(48, 48, 48)
    lap = laplacian(nodes, elems)
    mass = lumped_mass(nodes, elems)
    a = sp.csr_matrix(lap + sp.diags(1e-4 * mass))
    a.sort_indices()
    n, nnz = a.shape[0], a.nnz
    log(f"matrix: n={n} nnz={nnz} ({nnz/n:.1f}/row)")

    g32 = csr_to_graph(a, dtype=np.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), dtype=jnp.float32)
    x2 = x.reshape(-1, 1)

    # NOTE: the graph must be a jit *argument* — closing over device arrays
    # embeds them as HLO constants (enormous programs, re-uploaded per call)
    spmv_j = jax.jit(spmv)
    t_spmv = median_time(lambda: spmv_j(g32, x2))
    min_bytes = nnz * 12 + n * 4
    gbps = min_bytes / t_spmv / 1e9
    frac = gbps / bw
    log(f"SpMV: {t_spmv*1e6:.1f} us, {nnz/t_spmv/1e9:.2f} Gnnz/s, "
        f"{gbps:.1f} GB/s effective ({100*frac:.1f}% roofline)")

    spai_j = jax.jit(lambda g, v: spai_apply(g, v, 3e-3))
    t_spai = median_time(lambda: spai_j(g32, x2))
    spai_bytes = 2 * nnz * 12 + 3 * n * 4
    spai_gbps = spai_bytes / t_spai / 1e9
    log(f"SPAI apply: {t_spai*1e6:.1f} us, {spai_gbps:.1f} GB/s "
        f"({100*spai_gbps/bw:.1f}% roofline)")

    # full mixed-precision CG solve (fp32 storage + fp64 dots)
    b = jnp.asarray(a @ np.ones(n), dtype=jnp.float32)
    prec = jacobi_prec(g32)
    solve = jax.jit(
        lambda g, bb, pr: pcg(g, bb, prec=pr, rtol=1e-6,
                              max_iter=20000, dot_dtype=jnp.float64)
    )
    res = solve(g32, b, prec)
    iters = int(res.iters)
    t_solve = median_time(lambda: solve(g32, b, prec), warmup=1, iters=5)
    log(f"PCG(jacobi) solve: {iters} iters in {t_solve*1e3:.2f} ms "
        f"({iters/t_solve:.0f} iter/s, converged={bool(res.converged)})")

    print(json.dumps({
        "metric": "spmv_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction",
        "vs_baseline": round(frac / 0.8, 4),
        "detail": {
            "spmv_gnnz_per_s": round(nnz / t_spmv / 1e9, 3),
            "spai_roofline_frac": round(spai_gbps / bw, 4),
            "cg_iters_per_s": round(iters / t_solve, 1),
            "n": n,
            "nnz": nnz,
        },
    }))


if __name__ == "__main__":
    main()
