"""Benchmark harness — runs on the real TPU chip; prints ONE JSON line.

Primary metric: full PCG solve throughput (iterations/second) on the
FEM-heat problem class with the production configuration — fp32 storage,
fp64 dots, gather-free windowed Pallas SpMV. The whole solve is one
while_loop dispatch, which amortizes the axon relay's variable per-dispatch
latency (see docs/PERF.md for the honest-timing protocol).

`vs_baseline` compares against the reference GPU's implied iteration rate
on its heat benchmark (misc/tab_to_latex_benchmark.py docstring sample:
113.4 iters in 20.5 ms CUDA -> ~5,500 it/s, ~3 SpMV-equivalents per
preconditioned iteration; our unpreconditioned iteration has 1 SpMV, so we
compare per-SpMV-equivalent rates).

Secondary details: SpMV effective bandwidth vs HBM roofline for both the
windowed Pallas kernel and the XLA gather fallback.
"""

import json
import sys
import time

import numpy as np

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v6e": 1640.0}
# reference heat sample: 113.4 iters / 20.5 ms (CUDA, SPAI ~3 spmv/iter)
REF_SPMV_EQUIV_PER_S = 113.4 * 3 / 0.0205


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_watchdog(seconds: int = 300):
    """Fail with one JSON line instead of hanging if the TPU tunnel is down
    (the axon worker can take ~10-40 min to recover after a crash)."""
    import signal

    def handler(signum, frame):
        print(json.dumps({
            "metric": "cg_iters_per_s",
            "value": 0.0,
            "unit": "iterations/s",
            "vs_baseline": 0.0,
            "detail": {"error": "TPU device unavailable (watchdog timeout)"},
        }))
        sys.exit(0)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    return lambda: signal.alarm(0)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    import tpu_spai  # noqa: F401

    cancel = _device_watchdog(300)
    jnp.ones(8).sum().block_until_ready()  # first device contact
    cancel()
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.kernels.spmv_pallas import windowed_spmv_pallas_scalar
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.solver import pcg, jacobi_prec
    from tpu_spai.solver.windowed import build_windowed_graph, pcg_windowed
    from tpu_spai.sparse import csr_to_graph

    dev = jax.devices()[0]
    plat = str(getattr(dev, "device_kind", "unknown")).lower()
    bw = next((v for k, v in HBM_GBPS.items() if k in plat), 819.0)
    log(f"device: {dev} ({plat}), HBM {bw} GB/s")

    res = 24
    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n, nnz = ap.shape[0], ap.nnz
    log(f"matrix: heat res={res}, n={n} nnz={nnz}")

    g32 = csr_to_graph(ap, dtype=np.float32)
    wa, _ = build_windowed_graph(g32, tile=128)
    xstar = np.random.default_rng(0).standard_normal(n)
    b32 = jnp.asarray(ap @ xstar, dtype=jnp.float32)

    def solve_time(fn, reps=3):
        r = fn()
        np.asarray(r.x)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            np.asarray(r.x)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), r

    # production solve: windowed Pallas CG
    t_w, r_w = solve_time(
        lambda: pcg_windowed(wa, b32, rtol=1e-6, max_iter=5000, dot_dtype=jnp.float64)
    )
    it_w = int(r_w.iters)
    iters_per_s = it_w / t_w
    log(f"windowed-CG: {it_w} iters in {t_w*1e3:.1f} ms -> {iters_per_s:.0f} it/s "
        f"(converged={bool(r_w.converged)})")

    # gather-path solve for comparison
    t_g, r_g = solve_time(
        lambda: pcg(g32, b32, rtol=1e-6, max_iter=5000, dot_dtype=jnp.float64)
    )
    log(f"gather-CG:  {int(r_g.iters)} iters in {t_g*1e3:.1f} ms")

    # SpMV roofline estimate from solve time (1 SpMV + 4 dots + 3 axpys/iter;
    # attribute ~70% of iteration time to the SpMV conservatively)
    spmv_t = 0.7 * t_w / max(it_w, 1)
    gbps = (nnz * 12 + n * 4) / spmv_t / 1e9
    log(f"implied SpMV: {spmv_t*1e6:.0f} us -> {gbps:.1f} GB/s eff "
        f"({100*gbps/bw:.1f}% roofline)")

    value = iters_per_s
    print(json.dumps({
        "metric": "cg_iters_per_s",
        "value": round(value, 1),
        "unit": "iterations/s (heat n=15625, fp32+fp64 dots)",
        "vs_baseline": round(value / REF_SPMV_EQUIV_PER_S, 4),
        "detail": {
            "windowed_solve_ms": round(t_w * 1e3, 2),
            "gather_solve_ms": round(t_g * 1e3, 2),
            "iters": it_w,
            "spmv_roofline_frac": round(gbps / bw, 4),
            "n": n,
            "nnz": nnz,
        },
    }))


if __name__ == "__main__":
    main()
