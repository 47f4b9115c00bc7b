"""Datagen family tests: folder contract round-trips, SPD-ness, FEM oracle."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tpu_spai.data.folder import FolderDataset
from tpu_spai.datagen.heat import HeatDatagen, MultimeshHeatDatagen
from tpu_spai.datagen.poisson import PoissonDatagen, MultimeshPoissonDatagen


def _is_spd(a, strict_tol=1e-10):
    w = np.linalg.eigvalsh(a.toarray())
    return w.min() > -strict_tol * abs(w.max())


def test_heat_fixed_topology(tmp_path):
    p = tmp_path / "heat"
    HeatDatagen(prefix=str(p), mesh="box:4", max_count=3, seed=1).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=True, block_size=1,
        has_shared_features=True, use_node_features=True,
    )
    assert len(ds) == 3
    s = ds.get(0)
    # features: field(1) + shared pos(3) + mask(1) = 5
    assert s.x.shape[1] == 5
    a = _mat(s)
    assert _is_spd(a)


def _mat(s):
    from tpu_spai.sparse import graph_to_csr

    return graph_to_csr(
        s.edge_index, s.matrix_values / s.matrix_scale,
        s.num_nodes * s.block_size, mask=s.mask,
    )


def test_heat_multimesh_variable_topology(tmp_path):
    p = tmp_path / "heat_mm"
    MultimeshHeatDatagen(
        prefix=str(p), max_count=4, res_range=(3, 6), seed=2
    ).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=False, block_size=1,
        has_shared_features=False, use_node_features=True,
    )
    shapes = {ds.get(i).num_nodes for i in range(4)}
    assert len(shapes) >= 2  # topologies actually vary
    assert _is_spd(_mat(ds.get(0)))


def test_heat_high_contrast(tmp_path):
    p = tmp_path / "heat_hc"
    MultimeshHeatDatagen(
        prefix=str(p), max_count=2, res_range=(3, 3), high_contrast=True, seed=2
    ).generate()
    ds = FolderDataset(prefix=str(p), is_fixed_topology=False,
                       has_shared_features=False, use_node_features=True)
    feats = ds.get(0).x[:, 0]
    assert len(np.unique(np.round(feats, 10))) <= 2  # piecewise constant


def test_poisson_2d_masked_spd(tmp_path):
    p = tmp_path / "poisson"
    PoissonDatagen(prefix=str(p), mesh="grid:8", max_count=3, seed=4).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=True, block_size=1,
        has_shared_features=True, use_node_features=False,
    )
    s = ds.get(0)
    assert (s.mask == 0).any()  # some Dirichlet rows
    assert _is_spd(_mat(s))


def test_poisson_3d(tmp_path):
    p = tmp_path / "poisson3d"
    MultimeshPoissonDatagen(
        prefix=str(p), max_count=2, res_range=(3, 4), seed_count=4,
        grow_iteration=1, seed=5,
    ).generate()
    ds = FolderDataset(prefix=str(p), is_fixed_topology=False,
                       has_shared_features=False, use_node_features=True)
    s = ds.get(0)
    assert (s.mask == 0).any()
    assert _is_spd(_mat(s))


@pytest.mark.slow
def test_elasticity_twist(tmp_path):
    from tpu_spai.datagen.elasticity import TwistDatagen

    p = tmp_path / "twist"
    TwistDatagen(
        prefix=str(p), nx=2, resolution=3, max_count=2, time_step=0.02,
    ).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=True, block_size=3,
        has_shared_features=True, use_node_features=True,
    )
    s = ds.get(0)
    assert s.block_size == 3
    assert s.matrix_values.shape[1:] == (3, 3)
    a = _mat(s)
    assert _is_spd(a, strict_tol=1e-8)
    # rhs column exists (forces written)
    assert s.residual.shape == (s.num_nodes, 3)


def test_elasticity_stepper_physics():
    """A free-hanging beam under gravity must sag (negative z drift), and
    the Newton stepper must reduce the incremental-potential residual."""
    from tpu_spai.datagen.elasticity import TetFEM, unit_box

    vert, elem = unit_box(6, 3, 3)
    vert = vert.copy()
    vert[:, 1] -= 0.5
    vert[:, 2] -= 0.5
    fem = TetFEM(vert, elem, time_step=0.02, young_modulus=1e5)
    fem.add_gravity(np.array([0, 0, -9.8]))
    left = np.where(vert[:, 0] == vert[:, 0].min())[0]
    fem.mark_dirichlet_batched(left, np.zeros((len(left), 3)))
    fem.reset()
    for _ in range(3):
        fem.step()
    tip = np.where(vert[:, 0] == vert[:, 0].max())[0]
    assert fem.deformation()[tip, 2].mean() < -1e-5  # sagged
    # fixed face stayed put
    np.testing.assert_allclose(fem.deformation()[left], 0, atol=1e-12)


def test_tetrahedralize_icosphere():
    # tetgen-capability stand-in: Delaunay + winding-number mesher
    # (datagen_helper.py:113-137) — volume, orientation, boundary checks
    import numpy as np

    from tpu_spai.datagen.meshes import (
        boundary_faces_tet,
        load_obj,
        tetrahedralize,
    )

    v, f = load_obj("data/objs/icosphere.obj")
    vt, tt = tetrahedralize(v, f)
    d10 = vt[tt[:, 1]] - vt[tt[:, 0]]
    d20 = vt[tt[:, 2]] - vt[tt[:, 0]]
    d30 = vt[tt[:, 3]] - vt[tt[:, 0]]
    vol = np.einsum("mi,mi->m", np.cross(d10, d20), d30) / 6
    assert (vol > 0).all()
    r = np.linalg.norm(v, axis=1).mean()
    assert abs(vol.sum() - 4 / 3 * np.pi * r**3) < 0.1 * vol.sum()
    # the carved boundary must be exactly the input surface triangles
    assert len(boundary_faces_tet(tt)) == len(f)
    # FEM assembly on the result: SPD-ready operators
    from tpu_spai.native import laplacian, lumped_mass

    lap = laplacian(vt, tt)
    mass = lumped_mass(vt, tt)
    assert np.isfinite(lap.data).all() and (mass > 0).all()


def test_winding_number_inside_outside():
    import numpy as np

    from tpu_spai.datagen.meshes import load_obj, winding_number

    v, f = load_obj("data/objs/icosphere.obj")
    pts = np.array([[0.0, 0, 0], [0.5, 0, 0], [2.0, 0, 0], [0, 1.5, 0]])
    w = winding_number(pts, v, f)
    np.testing.assert_allclose(w[:2], 1.0, atol=1e-6)
    np.testing.assert_allclose(w[2:], 0.0, atol=1e-6)


@pytest.mark.slow
def test_elasticity_bend(tmp_path):
    """Gravity-bend family (~ elast_bend.py): released face, SPD Hessians."""
    from tpu_spai.datagen.elasticity import BendDatagen

    p = tmp_path / "bend"
    BendDatagen(
        prefix=str(p), nx=2, resolution=3, max_count=2, time_step=0.02,
    ).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=True, block_size=3,
        has_shared_features=True, use_node_features=True,
    )
    s = ds.get(0)
    assert s.block_size == 3
    assert _is_spd(_mat(s), strict_tol=1e-8)


@pytest.mark.slow
def test_elasticity_stretch(tmp_path):
    """Stretch family (~ stretch_armadillo.py): pull then release schedule."""
    from tpu_spai.datagen.elasticity import StretchDatagen

    p = tmp_path / "stretch"
    StretchDatagen(
        prefix=str(p), nx=2, resolution=3, max_count=3, time_step=0.02,
        pull_speed=0.2, release_at=2,
    ).generate()
    ds = FolderDataset(
        prefix=str(p), is_fixed_topology=True, block_size=3,
        has_shared_features=True, use_node_features=True,
    )
    assert len(ds) == 3
    for i in range(3):
        assert _is_spd(_mat(ds.get(i)), strict_tol=1e-8)


def test_ball_pick_regions(tmp_path):
    """pick_radius ball-picks multi-vertex constrained regions around the
    x-extremes on irregular meshes (the armadillo stretch path)."""
    import numpy as np

    from tpu_spai.datagen.elasticity import StretchDatagen

    rng = np.random.default_rng(0)
    # irregular tet blob: jittered box grid (no exact-plane x faces)
    from tpu_spai.datagen.meshes import unit_box_tet

    vert, elem = unit_box_tet(4, 3, 3)
    vert = vert + rng.uniform(-0.04, 0.04, vert.shape)
    np.save(tmp_path / "_bp_verts.npy", vert)
    np.save(tmp_path / "_bp_elems.npy", elem.astype(np.int32))
    dg = StretchDatagen(
        prefix=str(tmp_path / "_bp_out"), mesh_npy=str(tmp_path / "_bp"),
        pick_radius=0.3, max_count=1, dry_run=True,
    )
    assert len(dg.left_dofs) > 3 and len(dg.right_dofs) > 3
    # regions sit at opposite x extremes
    assert vert[dg.left_dofs, 0].mean() < vert[:, 0].mean()
    assert vert[dg.right_dofs, 0].mean() > vert[:, 0].mean()


def test_elasticity_stretch4_armadillo_fidelity(tmp_path):
    """4-region stretch at reference fidelity (stretch_armadillo.py:
    104-154): four ball regions, staged release, feet-only mask quirk."""
    import numpy as np

    from tpu_spai.datagen.elasticity import StretchArmadillo4Datagen
    from tpu_spai.datagen.meshes import unit_box_tet

    rng = np.random.default_rng(0)
    vert, elem = unit_box_tet(5, 4, 4)
    vert = (vert - 0.5) + rng.uniform(-0.03, 0.03, vert.shape)
    np.save(tmp_path / "_s4_verts.npy", vert)
    np.save(tmp_path / "_s4_elems.npy", elem.astype(np.int32))
    # box-frame ball centers (corners of the jittered box stand in for
    # hands/feet)
    centers = (
        (-0.5, 0.4, 0.4), (0.5, 0.4, 0.4),
        (-0.5, -0.4, -0.4), (0.5, -0.4, -0.4),
    )
    p = tmp_path / "stretch4"
    dg = StretchArmadillo4Datagen(
        prefix=str(p), mesh_npy=str(tmp_path / "_s4"),
        centers=centers, radius=0.35, max_count=8, time_step=0.02,
    )
    assert all(
        len(d) > 0 for d in (dg.lh, dg.rh, dg.lf, dg.rf)
    )
    masks = []
    for _ in range(8):
        h, mask, deform, rhs = dg.step()
        masks.append(mask.copy())
        assert abs(deform.mean()) < 1e-9  # zero-centered features
    # phase 1 (count<3): feet masked, hands NOT (reference mask quirk)
    assert (masks[0][dg.lf] == 0).all() and (masks[0][dg.rf] == 0).all()
    assert (masks[0][dg.lh] == 1).all() and (masks[0][dg.rh] == 1).all()
    # phase 2 (3<=count<5): right foot released back to 1, left still 0
    assert (masks[3][dg.rf] == 1).all() and (masks[3][dg.lf] == 0).all()
    # phase 3 (count>=5): nothing masked
    assert (masks[5] == 1).all()
    # the solver actually pulled: nonzero deformation accumulated
    assert np.abs(dg.solver.deformation()).max() > 1e-4
