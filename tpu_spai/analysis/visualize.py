"""Mesh visualization CLI (~ misc/visualize_msh.py).

The reference renders .msh files with pyvista (not available in this
environment); this equivalent renders Gmsh v2/v4 meshes, OBJ surfaces, or
preprocessed vert/elems .npy pairs with matplotlib 3-D (boundary wireframe
+ vertex scatter), writing a PNG.

Usage:
    python -m tpu_spai.analysis.visualize mesh.msh [out.png]
    python -m tpu_spai.analysis.visualize vert_tetra.npy elems_tetra.npy [out.png]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def load_mesh(args):
    from ..datagen.preprocess import parse_msh
    from ..datagen.meshes import load_obj

    p = Path(args[0])
    if p.suffix == ".npy":
        verts = np.load(args[0])
        elems = np.load(args[1])
        rest = args[2:]
    elif p.suffix == ".msh":
        verts, elems = parse_msh(str(p))
        rest = args[1:]
    elif p.suffix == ".obj":
        verts, elems = load_obj(str(p))
        rest = args[1:]
    else:
        raise ValueError(f"unsupported mesh file {p}")
    return np.asarray(verts, float), np.asarray(elems, int), rest


def boundary_faces(elems: np.ndarray) -> np.ndarray:
    """Faces appearing exactly once (tets) — or the faces themselves (tris)."""
    if elems.shape[1] == 3:
        return elems
    from ..datagen.meshes import boundary_faces_tet

    return boundary_faces_tet(elems)


def visualize(verts, elems, out: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    faces = boundary_faces(elems)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    tri = verts[faces]
    coll = Poly3DCollection(
        tri, alpha=0.35, facecolor="#76b5c5", edgecolor="k", linewidths=0.2
    )
    ax.add_collection3d(coll)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2] if verts.shape[1] > 2 else -1, hi[2] if verts.shape[1] > 2 else 1)
    ax.set_title(f"{len(verts)} verts, {len(elems)} elems, {len(faces)} boundary faces")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__)
        return 1
    verts, elems, rest = load_mesh(args)
    out = rest[0] if rest else "mesh.png"
    path = visualize(verts, elems, out)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
