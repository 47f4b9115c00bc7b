"""In-process A/B on the real TPU: batched multi-RHS SPAI-PCG
(pcg_gsel_multi) vs k independent single-RHS solves (pcg_gsel).

The multi-RHS kernels stream the grouped-ELL planes (the HBM bound) once
per iteration for all k columns; the reference solves multi-RHS samples
one column at a time (neural_cg/data.py:392-397). Honest-timing protocol
(CLAUDE.md): rtol=0 pins the while_loop at max_iter, the same compiled
program is dispatched at two iteration counts, and the difference divides
out the relay constant; min over rounds, all in one process."""
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.solver.gsel_solver import (
    GselSpaiPrec,
    build_gsel_csr,
    pcg_gsel,
    pcg_gsel_multi,
)


def timed_iters_interleaved(fns, short=200, long_=1200, rounds=5):
    """Difference-time several solvers with the variants INTERLEAVED in
    each round, so every round's ratios are same-phase (the shared worker
    has multi-minute 2-3x performance phases — cross-variant comparisons
    are only valid within a round; CLAUDE.md)."""
    for f in fns.values():
        for it in (long_, short):
            np.asarray(f(it).x)  # compile both iteration counts
    best = {k: None for k in fns}
    ratios = {k: [] for k in fns}
    for _ in range(rounds):
        this = {}
        for name, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(short).x)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f(long_).x)
            tl = time.perf_counter() - t0
            this[name] = (tl - ts) / (long_ - short) * 1e6
        base = this["single"]
        for name in fns:
            b = best[name]
            best[name] = this[name] if b is None else min(b, this[name])
            ratios[name].append(this[name] / base)
    med = {k: sorted(v)[len(v) // 2] for k, v in ratios.items()}
    return best, med


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    ks = [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2 else [
        1, 2, 4, 8]
    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n = ap.shape[0]
    print(f"res={res} n={n} nnz={ap.nnz}", flush=True)

    # SPAI factor with the matrix's full sparsity — same per-iteration
    # workload (3 SpMVs) as the learned preconditioner (bench.py protocol)
    d = sp.diags(1.0 / np.sqrt(ap.diagonal()))
    l = sp.csr_matrix(d @ sp.tril(ap) @ d)
    g_a = build_gsel_csr(ap)
    prec = GselSpaiPrec(
        l_fwd=build_gsel_csr(l),
        l_t=build_gsel_csr(sp.csr_matrix(l.T)),
        epsilon=jnp.float32(3e-3),
    )
    rng = np.random.default_rng(0)
    bcols = rng.standard_normal((n, max(ks))).astype(np.float32)

    # correctness spot check: per-column iters match the single-RHS path
    b2 = jnp.asarray(bcols[:, :2])
    rm = pcg_gsel_multi(g_a, b2, prec=prec, rtol=1e-6, max_iter=3000)
    for j in range(2):
        r1 = pcg_gsel(g_a, b2[:, j], prec=prec, rtol=1e-6, max_iter=3000,
                      dot_dtype="chunk64")
        print(f"  col {j}: multi {int(np.asarray(rm.iters)[j])} iters "
              f"(relres {float(np.asarray(rm.relres)[j]):.2e}) vs single "
              f"{int(r1.iters)}", flush=True)

    fns = {
        "single": lambda it: pcg_gsel(
            g_a, jnp.asarray(bcols[:, 0]), prec=prec, rtol=0.0, max_iter=it,
            dot_dtype="chunk64",
        )
    }
    for k in ks:
        bk = jnp.asarray(bcols[:, :k])
        fns[f"k={k}"] = (
            lambda it, bk=bk: pcg_gsel_multi(g_a, bk, prec=prec, rtol=0.0,
                                             max_iter=it)
        )
    # long-short must dwarf the relay's ms-scale dispatch noise even for
    # the cheapest variant (single at ~45 us/iter needs >~50 ms of signal)
    short, long_ = (200, 1200) if n < 50_000 else (200, 2200)
    best, med = timed_iters_interleaved(fns, short=short, long_=long_)
    print(f"  single-RHS SPAI-PCG: {best['single']:.1f} us/iter", flush=True)
    for k in ks:
        per, ratio = best[f"k={k}"], med[f"k={k}"]
        print(f"  k={k}: {per:.1f} us/iter best | same-phase median ratio "
              f"{ratio:.2f}x single -> amortization {k/ratio:.2f}x vs {k} "
              f"single solves ({ratio/k:.2f} single-cost/col)", flush=True)


if __name__ == "__main__":
    main()
