"""Tet-mesh quality report: refinement off vs on, on the reference's own
surface meshes (VERDICT round-2 item 8).

Metric: radius-edge ratio (what tetgen's ``q`` switch bounds — the
reference meshes with ``pq1.1/0Ya3e-4V``, datagen_helper.py:113-137).
Reports the distribution before/after Delaunay-refinement rounds and the
share of tets above the reference's q=1.1 bound and above 2.0 (tetgen's
own default). Writes output/tet_quality.json.

Usage: python scripts/tet_quality_report.py [mult=N] [mesh.obj ...]
(`mult` scales the interior spacing — the 2-core container needs mult>=2
for the bunny to finish; quality statistics are spacing-invariant.)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_MESHES = [
    "/root/reference/data/objs/bunny_low_res.obj",
    "/root/reference/data/objs/tiny-box.obj",
]


def stats(ratio):
    r = ratio[np.isfinite(ratio)]
    return {
        "tets": int(len(ratio)),
        "p50": round(float(np.percentile(r, 50)), 3),
        "p90": round(float(np.percentile(r, 90)), 3),
        "p99": round(float(np.percentile(r, 99)), 3),
        "max": round(float(r.max()), 3),
        "frac_gt_1.1": round(float(np.mean(r > 1.1)), 4),
        "frac_gt_2.0": round(float(np.mean(r > 2.0)), 4),
    }


def main():
    import numpy as _np

    from tpu_spai.datagen.meshes import (
        load_obj,
        tet_radius_edge,
        tetrahedralize,
    )

    args = sys.argv[1:]
    mult = 1.0
    meshes = []
    for a in args:
        if a.startswith("mult="):
            mult = float(a.split("=", 1)[1])
        else:
            meshes.append(a)
    meshes = meshes or DEFAULT_MESHES
    out = {}
    for path in meshes:
        v, f = load_obj(path)
        name = os.path.basename(path)
        row = {}
        e = _np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        sp_ = mult * float(_np.median(
            _np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1)))
        for label, q in (("unrefined", None), ("refined_q1.6", 1.6),
                         ("refined_q1.2", 1.2)):
            tv, tt = tetrahedralize(v, f, spacing=sp_, quality=q, seed=0)
            row[label] = stats(tet_radius_edge(tv, tt))
            print(name, label, row[label], flush=True)
        out[name] = row

    os.makedirs("output", exist_ok=True)
    with open("output/tet_quality.json", "w") as fo:
        json.dump(out, fo, indent=1)
    print("wrote output/tet_quality.json")


if __name__ == "__main__":
    main()
