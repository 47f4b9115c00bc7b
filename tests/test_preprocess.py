"""Gmsh parser + mesh preprocessing tests."""

import numpy as np

from tpu_spai.datagen.preprocess import normalize_verts, parse_msh, process_single_mesh

MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
5 1 1 1
$EndNodes
$Elements
3
1 4 2 0 1 1 2 3 4
2 4 2 0 1 2 3 4 5
3 2 2 0 1 1 2 3
$EndElements
"""


def test_parse_msh_v2(tmp_path):
    p = tmp_path / "m.msh"
    p.write_text(MSH_V2)
    verts, tets = parse_msh(p)
    assert verts.shape == (5, 3)
    assert tets.shape == (2, 4)  # the type-2 triangle is ignored
    np.testing.assert_array_equal(tets[0], [0, 1, 2, 3])


def test_normalize_verts():
    v = np.array([[0, 0, 0], [4, 0, 0], [0, 2, 0]], dtype=float)
    out = normalize_verts(v)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-12)
    assert np.abs(out).max() <= 1.0 + 1e-12


def test_process_single_mesh_roundtrip(tmp_path):
    p = tmp_path / "m.msh"
    p.write_text(MSH_V2)
    out = process_single_mesh(p, tmp_path / "out", min_verts=1, max_verts=100)
    assert out is not None
    verts = np.load(out / "vert_tetra.npy")
    tets = np.load(out / "elems_tetra.npy")
    assert verts.shape == (5, 3) and tets.shape == (2, 4)
    # vertex-count filter
    assert process_single_mesh(p, tmp_path / "out2", min_verts=100) is None
