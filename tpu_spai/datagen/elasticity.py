"""Hyperelastic tet-FEM time stepper + elasticity data generators.

TPU-native equivalent of the reference's external C++ pyssim solver
(datagen/elast_twist.py:5,47-66 `TetFiniteElementSolver_Host`, `unit_box`):
an implicit-Euler incremental-potential stepper for stable neo-Hookean
tetrahedral FEM, written in JAX — per-element energies/gradients/Hessians
come from `vmap`-ed autodiff (no hand-derived element matrices), the Newton
inner solves use this framework's own PCG, and per-element Hessians are
PSD-projected (eigenvalue clamping) as projective/Newton-type solvers do.

Emitted per step (matching elast_twist.py:112-129):
  * the (unmasked) incremental-potential Hessian  H = M/h^2 + d2Psi  as a
    3x3-block SPD matrix,
  * the Dirichlet mask (constrained vertices 0),
  * node features = current deformation,
  * rhs = initial Newton residual force at the step start.

Generators: `TwistDatagen` (rotating right-face BC, elast_twist.py:113-116),
`BendDatagen` (gravity sag, elast_bend.py), `StretchDatagen` (ball-picked
regions pulled apart with a release schedule, stretch_armadillo.py:104-154).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..logging_utils import get_logger
from .base import DatagenBase
from .meshes import unit_box_tet

log = get_logger()


def _lame(young: float, poisson: float) -> Tuple[float, float]:
    mu = young / (2.0 * (1.0 + poisson))
    lam = young * poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    return mu, lam


class TetFEM:
    """Implicit-Euler stable neo-Hookean stepper on a tet mesh.

    Energy (Smith et al. 2018 stable neo-Hookean):
        Psi(F) = mu/2 (||F||^2 - 3) - mu (J - 1) + lam/2 (J - 1)^2
    Incremental potential per step:
        E(u) = sum_e vol_e Psi(F_e(u)) + 1/(2 h^2) ||u - u_tilde||_M^2
    with u_tilde = u_prev + h v_prev + h^2 g (gravity folded into inertia).
    """

    def __init__(
        self,
        verts: np.ndarray,
        elems: np.ndarray,
        time_step: float = 0.01,
        young_modulus: float = 3e6,
        poisson_ratio: float = 0.4,
        density: float = 1.0,
        rtol: float = 3e-4,
        max_newton: int = 20,
    ):
        import jax
        import jax.numpy as jnp

        self.jax = jax
        self.jnp = jnp
        self.verts = np.asarray(verts, dtype=np.float64)
        self.elems = np.asarray(elems, dtype=np.int32)
        self.n = len(verts)
        self.m = len(elems)
        self.h = float(time_step)
        self.mu, self.lam = _lame(young_modulus, poisson_ratio)
        self.rtol = rtol
        self.max_newton = max_newton

        # rest-state geometry
        v = self.verts[self.elems]  # [m, 4, 3]
        dm = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]], axis=-1)
        self.vol = np.abs(np.linalg.det(dm)) / 6.0
        self.dm_inv = np.linalg.inv(dm)
        # lumped mass
        self.mass = np.zeros(self.n)
        np.add.at(self.mass, self.elems.ravel(), np.repeat(self.vol * density / 4.0, 4))

        self.gravity = np.zeros(3)
        self.u = np.zeros((self.n, 3))
        self.v = np.zeros((self.n, 3))
        self.bc_mask = np.ones((self.n, 3))  # 1 = free
        self.bc_target = np.zeros((self.n, 3))

        mu, lam = self.mu, self.lam

        def elem_energy(u_elem, dm_inv, vol):
            # u_elem [4,3] displacements; F = Ds Dm^{-1}
            ds = jnp.stack(
                [u_elem[1] - u_elem[0], u_elem[2] - u_elem[0], u_elem[3] - u_elem[0]],
                axis=-1,
            )
            f = jnp.eye(3) + ds @ dm_inv
            j = jnp.linalg.det(f)
            ic = jnp.sum(f * f)
            psi = 0.5 * mu * (ic - 3.0) - mu * (j - 1.0) + 0.5 * lam * (j - 1.0) ** 2
            return vol * psi

        self._elem_energy = elem_energy
        self._elem_grad = jax.vmap(jax.grad(elem_energy), in_axes=(0, 0, 0))
        self._elem_hess = jax.vmap(
            jax.hessian(elem_energy), in_axes=(0, 0, 0)
        )
        self._total_elastic = jax.jit(
            lambda ue, dmi, vol: jnp.sum(
                jax.vmap(elem_energy, in_axes=(0, 0, 0))(ue, dmi, vol)
            )
        )
        self._grads_j = jax.jit(self._elem_grad)
        self._hess_j = jax.jit(self._elem_hess)

    # -- pyssim-compatible API surface --------------------------------------

    def set_rtol(self, rtol: float):
        self.rtol = rtol

    def add_gravity(self, g: np.ndarray):
        self.gravity = self.gravity + np.asarray(g, dtype=np.float64)

    def mark_dirichlet_batched(self, dofs: np.ndarray, deform: np.ndarray):
        """Constrain vertices `dofs` to displacement `deform` [len, 3]."""
        self.bc_mask[dofs] = 0.0
        self.bc_target[dofs] = np.asarray(deform, dtype=np.float64)

    def release_dirichlet(self, dofs: np.ndarray):
        self.bc_mask[dofs] = 1.0

    def reset(self):
        self.u = np.where(self.bc_mask > 0, 0.0, self.bc_target)
        self.v = np.zeros_like(self.u)

    def deformation(self) -> np.ndarray:
        return self.u.copy()

    # -- internals -----------------------------------------------------------

    def _apply_bc(self, u: np.ndarray) -> np.ndarray:
        return np.where(self.bc_mask > 0, u, self.bc_target)

    def _u_tilde(self) -> np.ndarray:
        return self.u + self.h * self.v + (self.h**2) * self.gravity[None, :]

    def elastic_gradient(self, u: np.ndarray) -> np.ndarray:
        ue = u[self.elems]
        ge = np.asarray(self._grads_j(ue, self.dm_inv, self.vol))  # [m,4,3]
        g = np.zeros((self.n, 3))
        np.add.at(g, self.elems.ravel(), ge.reshape(-1, 3))
        return g

    def total_gradient(self, u: np.ndarray, u_tilde: np.ndarray) -> np.ndarray:
        inertia = (self.mass[:, None] / self.h**2) * (u - u_tilde)
        return inertia + self.elastic_gradient(u)

    def total_energy(self, u: np.ndarray, u_tilde: np.ndarray) -> float:
        el = float(
            self._total_elastic(u[self.elems], self.dm_inv, self.vol)
        )
        dn = u - u_tilde
        return el + 0.5 / self.h**2 * float(np.sum(self.mass[:, None] * dn * dn))

    def forces(self, u: Optional[np.ndarray] = None) -> np.ndarray:
        """Newton residual -grad E at `u` (default: current state with BC).
        ~ pyssim forces() read right after update_energy_and_gradients."""
        u = self._apply_bc(self.u if u is None else u)
        return -self.total_gradient(u, self._u_tilde())

    def hessian(self, u: Optional[np.ndarray] = None, project: bool = True) -> sp.bsr_matrix:
        """Incremental-potential Hessian as 3x3-block BSR (unmasked —
        Dirichlet elimination happens downstream via apply_dbc_masking,
        matching the reference's 'unfiltered' hessian)."""
        u = self._apply_bc(self.u if u is None else u)
        ue = u[self.elems]
        he = np.asarray(self._hess_j(ue, self.dm_inv, self.vol))  # [m,4,3,4,3]
        he = he.reshape(self.m, 12, 12)
        if project:
            w, q = np.linalg.eigh(he)
            w = np.maximum(w, 0.0)
            he = np.einsum("mik,mk,mjk->mij", q, w, q)
        he = he.reshape(self.m, 4, 3, 4, 3)
        rows = np.repeat(self.elems, 4, axis=1).reshape(self.m, 4, 4)
        cols = np.tile(self.elems[:, None, :], (1, 4, 1))
        blocks = he.transpose(0, 1, 3, 2, 4).reshape(-1, 3, 3)
        brow = rows.reshape(-1)
        bcol = cols.reshape(-1)
        # accumulate duplicate blocks + add inertia to diagonal
        from ..sparse.convert import blocks_from_coo  # noqa: F401  (pattern ref)

        key = brow.astype(np.int64) * self.n + bcol
        uniq, inv = np.unique(key, return_inverse=True)
        acc = np.zeros((len(uniq), 3, 3))
        np.add.at(acc, inv, blocks)
        ur = (uniq // self.n).astype(np.int64)
        uc = (uniq % self.n).astype(np.int64)
        diag_sel = ur == uc
        m_h2 = self.mass / self.h**2
        acc[diag_sel] += m_h2[ur[diag_sel], None, None] * np.eye(3)
        pat = sp.csr_matrix((np.arange(1, len(ur) + 1), (ur, uc)), shape=(self.n, self.n))
        pat.sort_indices()
        order = pat.data.astype(np.int64) - 1
        return sp.bsr_matrix(
            (acc[order], pat.indices, pat.indptr),
            blocksize=(3, 3),
            shape=(3 * self.n, 3 * self.n),
        )

    def step(self) -> None:
        """One implicit step: projected Newton with PCG inner solves."""
        import jax.numpy as jnp

        from ..solver import pcg, jacobi_prec
        from ..sparse.convert import csr_to_graph, apply_dbc_masking

        u_tilde = self._u_tilde()
        u = self._apply_bc(self.u)
        e0 = self.total_energy(u, u_tilde)
        g0 = np.linalg.norm(self.total_gradient(u, u_tilde) * self.bc_mask)
        for it in range(self.max_newton):
            grad = self.total_gradient(u, u_tilde) * self.bc_mask
            gn = np.linalg.norm(grad)
            if gn <= self.rtol * max(g0, 1.0):
                break
            h = self.hessian(u)
            hm = apply_dbc_masking(h, self.bc_mask)
            graph = csr_to_graph(hm, block_size=3)
            res = pcg(
                graph,
                jnp.asarray(-grad),
                prec=jacobi_prec(graph),
                rtol=1e-4,
                max_iter=10 * self.n,
            )
            d = np.asarray(res.x).reshape(self.n, 3) * self.bc_mask
            # backtracking line search on the incremental potential
            alpha = 1.0
            e_curr = self.total_energy(u, u_tilde)
            for _ in range(24):
                u_new = u + alpha * d
                if self.total_energy(u_new, u_tilde) <= e_curr + 1e-4 * alpha * float(
                    np.sum(grad * d)
                ):
                    break
                alpha *= 0.5
            u = u + alpha * d
        self.v = (u - self.u) / self.h
        self.u = u


def unit_box(nx: int, ny: int, nz: int) -> Tuple[np.ndarray, np.ndarray]:
    """~ pyssim.fem.unit_box: unit-cube-cell structured tet box; vertices
    spaced 1/max(n) so the beam has unit cross-section."""
    verts, tets = unit_box_tet(nx, ny, nz, scale=(nx / ny, 1.0, 1.0))
    return verts, tets


def _rotate_around_x(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


class _ElasticityBase(DatagenBase):
    """Shared machinery: beam mesh, BC faces, emit (H, mask, deform, force)."""

    @property
    def block_size(self) -> int:
        return 3

    def __init__(
        self,
        prefix: str,
        nx: int = 4,
        resolution: int = 8,
        mesh_npy: Optional[str] = None,
        time_step: float = 0.01,
        density: float = 1.0,
        youngs: float = 3e6,
        poisson: float = 0.4,
        seed: int = 42,
        pick_radius: float = 0.0,
        **kw,
    ):
        super().__init__(prefix=prefix, seed=seed, **kw)
        if mesh_npy:
            vert = np.load(mesh_npy + "_verts.npy")
            elem = np.load(mesh_npy + "_elems.npy")
        else:
            vert, elem = unit_box(resolution * nx, resolution, resolution)
            vert = vert.copy()
            vert[:, 0] *= nx / (nx)  # beam length set by scale above
            vert[:, 1] -= 0.5
            vert[:, 2] -= 0.5
        self.nx = nx
        self.vert, self.elem = vert, elem.astype(np.int32)
        self.solver = TetFEM(
            vert,
            elem,
            time_step=time_step,
            young_modulus=youngs,
            poisson_ratio=poisson,
            density=density,
        )
        self.solver.set_rtol(3e-4)
        self.solver.add_gravity(np.array([0, 0, -9.8]))
        if pick_radius > 0.0:
            # irregular meshes (armadillo): ball-pick the constrained
            # regions around the x-extreme points, like the reference's
            # ball-picked hands/feet (stretch_armadillo.py:104-154);
            # radius is a fraction of the bbox diagonal.
            # DEVIATION (noted per ADVICE r2): the reference picks FOUR
            # regions (hands + feet) with distinct diagonal pull
            # directions; we pick TWO at the x-extremes pulled apart
            # along +-x — same capability class (multi-vertex ball
            # Dirichlet regions + staged release), simpler schedule.
            diag = float(np.linalg.norm(vert.max(0) - vert.min(0)))
            r = pick_radius * diag
            lo_pt = vert[np.argmin(vert[:, 0])]
            hi_pt = vert[np.argmax(vert[:, 0])]
            self.left_dofs = np.where(
                np.linalg.norm(vert - lo_pt, axis=1) <= r)[0]
            self.right_dofs = np.where(
                np.linalg.norm(vert - hi_pt, axis=1) <= r)[0]
        else:
            self.left_dofs = np.where(vert[:, 0] == vert[:, 0].min())[0]
            self.right_dofs = np.where(vert[:, 0] == vert[:, 0].max())[0]
        self.solver.mark_dirichlet_batched(
            self.left_dofs, np.zeros((len(self.left_dofs), 3))
        )
        self.solver.mark_dirichlet_batched(
            self.right_dofs, np.zeros((len(self.right_dofs), 3))
        )
        self.solver.reset()
        self.vert_right_orig = vert[self.right_dofs].copy()
        self.t = 0.0

    def shared_features(self) -> np.ndarray:
        return self.vert

    def topology(self):
        return sp.csr_matrix(self.solver.hessian())

    def _emit(self):
        bc = self._right_bc()
        if bc is None:  # release phase (stretch schedule)
            self.solver.release_dirichlet(self.right_dofs)
        else:
            self.solver.mark_dirichlet_batched(self.right_dofs, bc)
        force = self.solver.forces()
        hess = sp.csr_matrix(self.solver.hessian())
        self.solver.step()
        deform = self.solver.deformation()
        mask = self.solver.bc_mask.copy()
        return hess, mask, deform, force

    def _right_bc(self) -> Optional[np.ndarray]:
        raise NotImplementedError

    def step(self):
        h, mask, deform, force = self._emit()
        # rhs written as one column of DOF values
        return h, mask, deform, force.reshape(-1)


class TwistDatagen(_ElasticityBase):
    """Rotating right-face BC (elast_twist.py:112-129)."""

    def _right_bc(self) -> np.ndarray:
        bc = self.vert_right_orig @ _rotate_around_x(self.t)
        self.t += self.solver.h
        return bc - self.vert_right_orig


class BendDatagen(_ElasticityBase):
    """Gravity bend: right face released after marking, beam sags
    (~ elast_bend.py)."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.solver.release_dirichlet(self.right_dofs)

    def _right_bc(self):
        return None  # released — beam sags under gravity


class StretchArmadillo4Datagen(_ElasticityBase):
    """The reference's 4-region armadillo stretch at full fidelity
    (stretch_armadillo.py:40-60, 104-154): ball-picked hands + feet with
    the reference's exact centers/radius and distinct diagonal pull
    directions, staged release, and the reference's dataset-mask quirk
    (`all_bc_idx` is rebound to the FEET at stretch_armadillo.py:65, so
    the emitted Dirichlet mask only ever covers the feet — hand rows
    stay free rows of the unfiltered Hessian).

    Schedule in fractions of ``max_count`` (reference: 300/500 of 800):
      * count < 3/8: all four regions pulled at speed 0.5 —
        LH [-1,0,1], RH [1,0,1], LF [-1,0,-1], RF [1,0,-1]
        (stretch_armadillo.py:108-135);
      * 3/8 <= count < 5/8: LH and RF released (mark_general,
        :119-123), RH and LF still pulled;
      * count >= 5/8: everything released, the body relaxes (:136-140).

    Deformation features are zero-centered like the reference
    (stretch_armadillo.py:153)."""

    def __init__(
        self,
        *args,
        pull_speed: float = 0.5,
        centers=(
            (-0.36, 0.31, 0.32),   # left hand
            (0.36, 0.22, 0.38),    # right hand
            (-0.36, -0.01, -0.47),  # left foot
            (0.20, -0.01, -0.47),   # right foot
        ),
        radius: float = 0.04,
        **kw,
    ):
        super().__init__(*args, **kw)
        self.pull_speed = pull_speed
        # drop the base class's x-extreme plane constraints
        self.solver.release_dirichlet(self.left_dofs)
        self.solver.release_dirichlet(self.right_dofs)
        v = self.vert

        def in_ball(c):
            return np.where(
                np.linalg.norm(v - np.asarray(c), axis=1) < radius
            )[0]

        self.lh, self.rh, self.lf, self.rf = (in_ball(c) for c in centers)
        for dofs in (self.lh, self.rh, self.lf, self.rf):
            assert len(dofs) > 0, "ball pick found no vertices"
            self.solver.mark_dirichlet_batched(
                dofs, np.zeros((len(dofs), 3))
            )
        self.solver.reset()
        # reference mask quirk: all_bc_idx = the feet only
        self.all_bc_idx = np.concatenate([self.lf, self.rf])
        self.t = 0.0
        self._count = 0

    def _pull(self, dofs, direction):
        # reference: dx = T * 0.5 elementwise with axis signs — magnitude
        # pull_speed*T per active axis (stretch_armadillo.py:110-135)
        off = self.pull_speed * self.t * np.asarray(direction, np.float64)
        self.solver.mark_dirichlet_batched(
            dofs, np.tile(off, (len(dofs), 1))
        )

    def step(self):
        c, mc = self._count, self.max_count
        mask3 = np.ones((len(self.vert), 3), np.float32)
        if c < (5 * mc) // 8:
            mask3[self.all_bc_idx] = 0.0
            if c < (3 * mc) // 8:
                self._pull(self.lh, (-1, 0, 1))
                self._pull(self.rf, (1, 0, -1))
            else:
                self.solver.release_dirichlet(self.lh)
                self.solver.release_dirichlet(self.rf)
                mask3[self.lh] = 1.0
                mask3[self.rf] = 1.0
            self._pull(self.rh, (1, 0, 1))
            self._pull(self.lf, (-1, 0, -1))
        else:
            for dofs in (self.lh, self.rh, self.lf, self.rf):
                self.solver.release_dirichlet(dofs)
        force = self.solver.forces()
        hess = sp.csr_matrix(self.solver.hessian())
        self.solver.step()
        deform = self.solver.deformation()
        deform = deform - deform.mean(axis=0, keepdims=True)
        self.t += self.solver.h
        self._count += 1
        return hess, mask3, deform, force.reshape(-1)


class StretchDatagen(_ElasticityBase):
    """Ball-picked regions pulled apart, constraints released mid-sequence
    (~ stretch_armadillo.py:104-154; see StretchArmadillo4Datagen for the
    full-fidelity 4-region scene)."""

    def __init__(self, *args, pull_speed: float = 0.5, release_at: int = 24, **kw):
        super().__init__(*args, **kw)
        self.pull_speed = pull_speed
        self.release_at = release_at
        self._count = 0

    def _right_bc(self) -> Optional[np.ndarray]:
        if self.t >= self.release_at * self.solver.h:
            # release phase: constraints dropped, body relaxes
            self.t += self.solver.h
            return None
        off = np.array([self.pull_speed * self.t, 0.0, 0.0])
        self.t += self.solver.h
        return np.tile(off, (len(self.right_dofs), 1))


def main(argv=None):
    import sys
    from pathlib import Path

    from ..config import cli_config

    args = argv if argv is not None else sys.argv[1:]
    cfg_dir = Path(__file__).resolve().parents[2] / "configs" / "datagen"
    name = "elast_twist"
    for a in args:
        if a.startswith("--config-name="):
            name = a.split("=", 1)[1]
    cfg = cli_config(args, cfg_dir, name)
    kind = cfg.select("kind", "twist")
    cls = {
        "twist": TwistDatagen,
        "bend": BendDatagen,
        "stretch": StretchDatagen,
        "stretch4": StretchArmadillo4Datagen,
    }[kind]
    kwargs = {k: v for k, v in cfg.to_dict().items() if k != "kind"}
    cls(**kwargs).generate()


if __name__ == "__main__":
    main()
