"""Probe: tetrahedralize armadillo_low_res and time one stretch FEM step.

Writes the tet mesh npys for StretchDatagen (mesh_npy contract:
<prefix>_verts.npy / <prefix>_elems.npy) and prints sizes + one-step
wall time so the full datagen run can be budgeted.

Usage: python scripts/armadillo_probe.py [mult=2.0] [out=data/armadillo]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    mult = float(kv.get("mult", 2.0))
    out = kv.get("out", "data/armadillo")

    from tpu_spai.datagen.meshes import load_obj, tet_radius_edge, tetrahedralize

    t0 = time.time()
    v, f = load_obj("/root/reference/data/objs/armadillo_low_res.obj")
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    med = float(np.median(np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)))
    tv, tt = tetrahedralize(v, f, spacing=mult * med, quality=1.6, seed=0)
    q = tet_radius_edge(tv, tt)
    print(f"tet mesh: {len(tv)} verts, {len(tt)} tets "
          f"(q p50={np.percentile(q, 50):.2f} p99={np.percentile(q, 99):.2f}) "
          f"in {time.time()-t0:.0f}s", flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out + "_verts.npy", tv)
    np.save(out + "_elems.npy", tt.astype(np.int32))

    from tpu_spai.datagen.elasticity import StretchDatagen

    t0 = time.time()
    dg = StretchDatagen(
        prefix="/tmp/armadillo_probe", mesh_npy=out, max_count=1,
        time_step=0.02, dry_run=True,
    )
    print(f"solver setup: {time.time()-t0:.0f}s "
          f"(n_dof={3*len(tv)})", flush=True)
    t0 = time.time()
    h, mask, deform, force = dg.step()
    print(f"one step: {time.time()-t0:.0f}s  hessian nnz={h.nnz}", flush=True)


if __name__ == "__main__":
    main()
