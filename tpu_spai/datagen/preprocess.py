"""Mesh preprocessing (~ preprocess/msh_to_npy.py, obj_to_npy.py, misc/tetra.py).

Converts external mesh archives into the per-mesh npy directory layout the
variable-topology generators consume (`<dir>/vert_tetra.npy`,
`elems_tetra.npy`): parses Gmsh `.msh` (v2 ASCII and v4.1 ASCII) and OBJ
files without external wheels, centers + unit-normalizes vertices
(msh_to_npy.py:32-35) and filters by vertex count (:77-87).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..logging_utils import get_logger
from .meshes import load_obj

log = get_logger()


def parse_msh(path) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal Gmsh ASCII parser: returns (verts [n,3], tets [m,4])."""
    txt = Path(path).read_text().splitlines()
    i = 0
    version = None
    verts = []
    tets = []
    id_map = {}
    while i < len(txt):
        line = txt[i].strip()
        if line == "$MeshFormat":
            version = float(txt[i + 1].split()[0])
            i += 2
        elif line == "$Nodes":
            if version and version >= 4.0:
                # v4.1: numEntityBlocks numNodes minTag maxTag
                header = txt[i + 1].split()
                n_blocks = int(header[0])
                j = i + 2
                for _ in range(n_blocks):
                    bh = txt[j].split()
                    n_in_block = int(bh[3])
                    tags = [int(txt[j + 1 + k]) for k in range(n_in_block)]
                    for k in range(n_in_block):
                        xyz = txt[j + 1 + n_in_block + k].split()
                        id_map[tags[k]] = len(verts)
                        verts.append([float(x) for x in xyz[:3]])
                    j += 1 + 2 * n_in_block
                i = j
            else:
                n = int(txt[i + 1])
                for k in range(n):
                    parts = txt[i + 2 + k].split()
                    id_map[int(parts[0])] = len(verts)
                    verts.append([float(x) for x in parts[1:4]])
                i += 2 + n
        elif line == "$Elements":
            if version and version >= 4.0:
                header = txt[i + 1].split()
                n_blocks = int(header[0])
                j = i + 2
                for _ in range(n_blocks):
                    bh = txt[j].split()
                    etype, n_in_block = int(bh[2]), int(bh[3])
                    for k in range(n_in_block):
                        parts = txt[j + 1 + k].split()
                        if etype == 4:  # linear tet
                            tets.append([id_map[int(p)] for p in parts[1:5]])
                    j += 1 + n_in_block
                i = j
            else:
                n = int(txt[i + 1])
                for k in range(n):
                    parts = txt[i + 2 + k].split()
                    etype = int(parts[1])
                    ntags = int(parts[2])
                    if etype == 4:
                        ids = parts[3 + ntags : 7 + ntags]
                        tets.append([id_map[int(p)] for p in ids])
                i += 2 + n
        else:
            i += 1
    return np.asarray(verts, dtype=np.float64), np.asarray(tets, dtype=np.int32)


def normalize_verts(verts: np.ndarray) -> np.ndarray:
    """Center at the origin and scale to unit max extent
    (msh_to_npy.py:32-35)."""
    v = verts - verts.mean(axis=0, keepdims=True)
    scale = np.abs(v).max()
    return v / (scale if scale > 0 else 1.0)


def process_single_mesh(
    src: Path,
    out_root: Path,
    min_verts: int = 400,
    max_verts: int = 32000,
) -> Optional[Path]:
    """One mesh file -> `<out_root>/<name>/{vert_tetra,elems_tetra}.npy`
    (msh_to_npy.py:23-87 incl. the 400-32000 vertex filter)."""
    if src.suffix == ".msh":
        verts, tets = parse_msh(src)
    elif src.suffix == ".obj":
        # closed surface -> volume mesh (obj_to_npy.py / misc/tetra.py path,
        # Delaunay + winding-number mesher instead of the tetgen wheel)
        from .meshes import tetrahedralize

        sverts, faces = load_obj(src)
        verts, tets = tetrahedralize(sverts, faces)
    else:
        raise ValueError(f"unsupported mesh format: {src.suffix}")
    if not (min_verts <= len(verts) <= max_verts):
        log.info(f"skip {src.name}: {len(verts)} verts outside [{min_verts},{max_verts}]")
        return None
    verts = normalize_verts(verts)
    out = out_root / src.stem
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "vert_tetra.npy", verts)
    np.save(out / "elems_tetra.npy", tets)
    log.info(f"{src.name}: {len(verts)} verts, {len(tets)} tets -> {out}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="mesh file or directory of .msh files")
    ap.add_argument("output", help="output root directory")
    ap.add_argument("--min-verts", type=int, default=400)
    ap.add_argument("--max-verts", type=int, default=32000)
    args = ap.parse_args(argv)
    src = Path(args.input)
    out = Path(args.output)
    files = [src] if src.is_file() else sorted(src.glob("*.msh"))
    ok = 0
    for f in files:
        if process_single_mesh(f, out, args.min_verts, args.max_verts):
            ok += 1
    log.info(f"processed {ok}/{len(files)} meshes")


if __name__ == "__main__":
    main()
