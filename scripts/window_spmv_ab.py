"""In-process A/B: gsel SpMV window=1 (production) vs window=2 on the
real TPU. Heat tet boxes, RCM-ordered. Chained scan inside one jitted
program, differenced (long-short), min over rounds — per the honest-
timing protocol (CLAUDE.md / docs/PERF.md)."""
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.kernels.gsel_pallas import gsel_spmv_pallas, gsel_spmv_ds_pallas
from tpu_spai.solver.gsel_solver import build_gsel_csr, pcg_gsel


def chain(g, k, ds=False):
    @jax.jit
    def run(x):
        def body(v, _):
            if ds:
                yh, yl = gsel_spmv_ds_pallas(g, v[0], v[1])
                return (yh * 1e-2, yl * 1e-2), None
            return gsel_spmv_pallas(g, v) * 1e-2, None

        y, _ = jax.lax.scan(body, x, None, length=k)
        return y

    return run


def bench_pair(tag, g1, g2, x, ds=False, short=500, long_=5500, rounds=7):
    x0 = (x, jnp.zeros_like(x)) if ds else x
    fns = {}
    for name, g in (("w1", g1), ("w2", g2)):
        fns[name] = (chain(g, short, ds), chain(g, long_, ds))
        np.asarray(jax.tree_util.tree_leaves(fns[name][1](x0))[0])  # compile
        np.asarray(jax.tree_util.tree_leaves(fns[name][0](x0))[0])
    best = {}
    for _ in range(rounds):
        for name in fns:
            s, l = fns[name]
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(s(x0))[0])
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(l(x0))[0])
            tl = time.perf_counter() - t0
            per = (tl - ts) / (long_ - short) * 1e6
            if name not in best or per < best[name]:
                best[name] = per
    print(f"{tag}: w1 {best['w1']:.1f} us/SpMV  w2 {best['w2']:.1f} us/SpMV "
          f"({best['w1']/best['w2']:.2f}x)")


def main():
    for res in ([24, 48] if len(sys.argv) < 2 else [int(sys.argv[1])]):
        nodes, elems = unit_box_tet(res, res, res)
        a = sp.csr_matrix(
            laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
        )
        perm = rcm_permutation(a)
        ap = a[perm][:, perm].tocsr()
        ap.sort_indices()
        n = ap.shape[0]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        g1 = build_gsel_csr(ap)
        g2 = build_gsel_csr(ap, window=2)
        print(f"res={res} n={n}: w1 K'={g1.k_width} G={g1.group} Qg={g1.q_chunks} "
              f"slots={g1.slots/1e6:.2f}M | w2 K'={g2.k_width} G={g2.group} "
              f"Qg={g2.q_chunks} slots={g2.slots/1e6:.2f}M", flush=True)
        # correctness on device first
        y1 = np.asarray(gsel_spmv_pallas(g1, x), np.float64)
        y2 = np.asarray(gsel_spmv_pallas(g2, x), np.float64)
        y0 = ap @ np.asarray(x, np.float64)
        print(f"  relerr w1={np.abs(y1-y0).max()/np.abs(y0).max():.2e} "
              f"w2={np.abs(y2-y0).max()/np.abs(y0).max():.2e}", flush=True)
        bench_pair(f"res={res} f32", g1, g2, x)
        # CG iteration parity
        b = jnp.asarray((ap @ np.ones(n)).astype(np.float32))
        r1 = pcg_gsel(g1, b, rtol=1e-6, max_iter=2000)
        r2 = pcg_gsel(g2, b, rtol=1e-6, max_iter=2000)
        print(f"  CG iters w1={int(r1.iters)} w2={int(r2.iters)} "
              f"relres {float(r1.relres):.2e}/{float(r2.relres):.2e}", flush=True)
        g1d = build_gsel_csr(ap, double_single=True)
        g2d = build_gsel_csr(ap, double_single=True, window=2)
        bench_pair(f"res={res} ds ", g1d, g2d, x, ds=True, short=200,
                   long_=1700)


if __name__ == "__main__":
    main()
