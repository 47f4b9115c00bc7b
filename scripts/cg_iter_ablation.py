"""In-process ablation of the SPAI-PCG iteration at heat res=24
(n=15,625): which part of the ~32 us/iter is SpMV vs dots vs loop?
max_iter differencing on while_loops with pieces removed."""
import sys
import time

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from tpu_spai.datagen.meshes import unit_box_tet
from tpu_spai.native import laplacian, lumped_mass
from tpu_spai.dist.partition import rcm_permutation
from tpu_spai.kernels.gsel_pallas import gsel_spmv_pallas
from tpu_spai.solver import GselSpaiPrec, build_gsel_csr, pcg_gsel
from tpu_spai.solver.cg import _dot

res = int(sys.argv[1]) if len(sys.argv) > 1 else 24
nodes, elems = unit_box_tet(res, res, res)
a = sp.csr_matrix(
    laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
)
perm = rcm_permutation(a)
ap = a[perm][:, perm].tocsr()
ap.sort_indices()
n = ap.shape[0]
d_ = np.sqrt(ap.diagonal())
lhat = sp.csr_matrix(sp.diags(1.0 / d_) @ ap @ sp.diags(1.0 / d_))
g = build_gsel_csr(ap)
gl = build_gsel_csr(lhat)
prec = GselSpaiPrec(gl, gl, jnp.float32(3e-3))
xstar = np.random.default_rng(0).standard_normal(n)
b32 = jnp.asarray(ap @ xstar, dtype=jnp.float32)
print(f"n={n}", file=sys.stderr)


def loop(body_fn, m):
    """while_loop with `m` iterations of body_fn on (vec, scalar, it)."""
    @jax.jit
    def run(v0, mm):
        def cond(st):
            return st[2] < mm

        def body(st):
            v, s, it = st
            v, s = body_fn(v, s)
            return v, s, it + 1

        v, s, _ = jax.lax.while_loop(cond, body, (v0, jnp.float64(1.0), 0))
        return v, s

    return lambda mm: run(b32, mm)


def measure(fn, n1=100, n2=900, reps=6):
    out = fn(n2)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = {}
    for _ in range(reps):
        for m in (n1, n2):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(m))[0])
            ts.setdefault(m, []).append(time.perf_counter() - t0)
    return (min(ts[n2]) - min(ts[n1])) / (n2 - n1) * 1e6


variants = {}
variants["empty (axpy only)"] = loop(lambda v, s: (v * 0.999, s), None)
variants["1 spmv"] = loop(lambda v, s: (gsel_spmv_pallas(g, v) * 1e-3, s), None)
variants["3 spmv"] = loop(
    lambda v, s: (
        gsel_spmv_pallas(
            g, gsel_spmv_pallas(gl, gsel_spmv_pallas(gl, v)) * 1e-3
        )
        * 1e-3,
        s,
    ),
    None,
)


def dots3(v, s):
    d1 = _dot(v, v, "chunk64")
    d2 = _dot(v, v * 0.5, "chunk64")
    d3 = _dot(v * 2.0, v, "chunk64")
    return v * (1.0 + 1e-30 * (d1 + d2 + d3)).astype(jnp.float32), s


variants["3 chunk64 dots"] = loop(dots3, None)


def dots3_f32(v, s):
    d1 = jnp.vdot(v, v)
    d2 = jnp.vdot(v, v * 0.5)
    d3 = jnp.vdot(v * 2.0, v)
    return v * (1.0 + 1e-30 * (d1 + d2 + d3)), s


variants["3 f32 dots"] = loop(dots3_f32, None)

for name, fn in variants.items():
    print(f"{name}: {measure(fn):.1f} us/iter", flush=True)

# production solves for reference, same process
for name, kw in (
    ("pcg f32+chunk64 SPAI", dict(prec=prec, dot_dtype="chunk64")),
    ("pcg f32+chunk64 noprec", dict(dot_dtype="chunk64")),
    ("pcg f32 dots SPAI", dict(prec=prec)),
):
    fn = lambda m, kw=kw: pcg_gsel(g, b32, rtol=1e-30, max_iter=m, **kw)
    print(f"{name}: {measure(fn):.1f} us/iter", flush=True)
